"""spark-submit --py-files packaging (north_rule: multi-executor deploy).

``build_pyfiles_zip`` zips the package so executors can import it; the session
factory registers it via ``SparkContext.addPyFile`` (the programmatic
equivalent of ``spark-submit --py-files pkg.zip``), so the same code path works
from an arbitrary cwd in local mode and on a real cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile


def build_pyfiles_zip(dest_dir: str | None = None) -> str:
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_root)
    dest_dir = dest_dir or tempfile.mkdtemp(prefix="complete_ocr_spark_pyfiles_")
    zip_path = os.path.join(dest_dir, f"{pkg_name}.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_root))
                zf.write(full, rel)
    return zip_path


if __name__ == "__main__":
    # `python -m complete_ocr_spark.packaging` -> print the zip path for
    # spark-submit --py-files
    print(build_pyfiles_zip())
