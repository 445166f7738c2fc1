"""Streaming form of the pipeline: foreachBatch over a file source must produce
exactly the batch pipeline's output (same per-document span sequences)."""

from __future__ import annotations

import os

from complete_ocr_spark.pipeline import run_extraction
from complete_ocr_spark.schemas import DOC_SCHEMA
from complete_ocr_spark.streaming import run_streaming_extraction
from complete_ocr_spark.synth import make_docs


def test_streaming_equals_batch(spark, tmp_path):
    docs = make_docs(40)
    rows = [(d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs]
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two source files -> at least two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(rows[:20], schema=DOC_SCHEMA).write.parquet(src + "/f1")
    spark.createDataFrame(rows[20:], schema=DOC_SCHEMA).write.parquet(src + "/f2")

    out_root = str(tmp_path / "out")
    q = run_streaming_extraction(
        spark,
        source_dir=src + "/*",
        out_root=out_root,
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in spark.read.parquet(out_root + "/docs_out").collect()
    }
    batch_df = spark.createDataFrame(rows, schema=DOC_SCHEMA)
    want = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in run_extraction(spark, batch_df).collect()
    }
    assert got == want
