#!/usr/bin/env python3
"""Round-9 action-level profile of the incremental (foreachBatch) queries.

Monkeypatches the eager DataFrame actions (localCheckpoint, collect,
isEmpty, write.parquet/save) to log wall time + caller line, then runs
q_curate_incr / q_dup_clusters_incr once — a complete picture of where the
driver-coordination seconds go. Profiling aid only; bench.py untouched.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

LOG: list[tuple[str, float]] = []


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "/complete_ocr_spark/" in fn and "profile_r09" not in fn:
            return f"{os.path.basename(fn)}:{fr.lineno}"
    return "?"


def patch():
    try:  # Spark 4: the runtime class overrides the base's methods
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    def wrap(cls, name):
        orig = getattr(cls, name)

        def timed(self, *a, **k):
            t0 = time.perf_counter()
            r = orig(self, *a, **k)
            LOG.append((f"{name}@{_site()}", time.perf_counter() - t0))
            return r

        setattr(cls, name, timed)

    for m in ("localCheckpoint", "collect", "isEmpty", "count", "head"):
        wrap(DataFrame, m)
    for m in ("parquet", "save"):
        wrap(DataFrameWriter, m)


def main():
    from complete_ocr_spark.config import build_spark
    from complete_ocr_spark import queries as Q

    spark = build_spark(app_name="profile_r09_incr",
                        master=f"local[{CPUS}]",
                        shuffle_partitions=max(CPUS, 8))
    # warm the JVM/Arrow path first (unpatched), same query
    t0 = time.perf_counter()
    Q.q_curate_incr(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    warm = time.perf_counter() - t0
    patch()
    which = os.environ.get("PROF_QUERY", "q_curate_incr")
    fn = getattr(Q, which)
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    total = time.perf_counter() - t0
    agg: dict[str, tuple[int, float]] = {}
    for site, dt in LOG:
        n, s = agg.get(site, (0, 0.0))
        agg[site] = (n + 1, s + dt)
    print(f"== {which} warm={warm:.2f}s measured={total:.2f}s ==")
    acc = 0.0
    for site, (n, s) in sorted(agg.items(), key=lambda x: -x[1][1]):
        acc += s
        print(f"{site:55s} n={n:3d} sum={s:7.3f}")
    print(f"accounted {acc:.2f}s of {total:.2f}s")


if __name__ == "__main__":
    main()
