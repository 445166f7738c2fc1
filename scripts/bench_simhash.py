"""A/B the two simhash64 implementations (Catalyst 64-wide vote agg vs
Arrow-batched numpy kernel) at sf0.1, interleaved best-of-k — this VM's
steal-time bursts make sequential comparisons meaningless (BASELINE.md §VM
noise). Prints one JSON line with best seconds per impl.

Usage: python scripts/bench_simhash.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from complete_ocr_spark.config import build_spark  # noqa: E402
from complete_ocr_spark.functions import dedup  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = build_spark(
        app_name="bench_simhash", master=f"local[{CPUS}]", shuffle_partitions=32
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    times: dict[str, list[float]] = {"catalyst": [], "pandas": []}
    # warm both paths (JIT/codegen) before timing
    for impl in times:
        dedup.simhash64(docs, "doc_id", "text", impl=impl).count()
    for _ in range(rounds):
        for impl in times:  # interleaved within each round
            t0 = time.monotonic()
            n = dedup.simhash64(docs, "doc_id", "text", impl=impl).count()
            times[impl].append(time.monotonic() - t0)
            assert n > 0
    out = {
        "sf_dir": SF_DIR,
        "rounds": rounds,
        "best_sec": {k: round(min(v), 3) for k, v in times.items()},
        "all_sec": {k: [round(x, 3) for x in v] for k, v in times.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
