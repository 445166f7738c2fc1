#!/usr/bin/env python3
"""Capture .explain('formatted') for the round-9 touched queries into
plans/r09/<query>_<suffix>.txt (judge evidence; guide §7.2).

Usage: python scripts/plans_r09.py <suffix> [query ...]
Defaults to the full touched list. Stateful queries (incr runners) run
their batch bodies first — the committed plan is the promoted/returned
frame, matching the *_before.txt convention.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

TOUCHED = [
    "q_bpe_train_scale", "q_corpus_curation", "q_curate_incr",
    "q_decontaminate", "q_dsir_select", "q_dup_clusters_incr",
    "q_simhash_near_dup_mb", "q_stream_dedup_flags", "q_stream_seg_dedup",
    "q_training_data", "q_media_near_dup", "q_ann_pq",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    names = sys.argv[2:] or TOUCHED
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)

    from complete_ocr_spark.config import build_spark
    from complete_ocr_spark import queries as Q

    spark = build_spark(app_name="plans_r09", master=f"local[{CPUS}]",
                        shuffle_partitions=max(CPUS, 8))
    reg = {n: fn for n, (fn, _sql) in {**Q.REGISTRY, **Q.ANCHOR_REGISTRY}.items()}
    for name in names:
        df = reg[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
