#!/usr/bin/env python3
"""spark-submit entrypoint for the extraction job (north_rule deploy shape).

Cluster:

    python -m complete_ocr_spark.packaging          # -> /tmp/.../complete_ocr_spark.zip
    spark-submit --master spark://... \
        --py-files complete_ocr_spark.zip \
        scripts/submit_job.py --input <docs table> --output <warehouse root> \
        [--buckets 16384] [--shuffle-partitions 4096]

Local smoke:

    python scripts/submit_job.py --input /root/repo/data/docs_sf0.01.parquet \
        --output /tmp/submit_out

The job is resumable: rerunning with the same --output skips buckets already
recorded in the lineage table (kill it mid-run and rerun to test).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# standalone local runs: the package sits next to scripts/; under
# spark-submit --py-files the zip is already on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    # under spark-submit a session already exists (configs from the CLI);
    # standalone we build one with the engine defaults
    active = SparkSession.getActiveSession()
    if active is None:
        from complete_ocr_spark.config import build_spark

        spark = build_spark("complete_ocr_spark_job",
                            shuffle_partitions=args.shuffle_partitions)
    else:
        spark = active

    from complete_ocr_spark.io import run_job

    docs = spark.read.parquet(args.input)
    stats = run_job(spark, docs, args.output, n_buckets=args.buckets)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
