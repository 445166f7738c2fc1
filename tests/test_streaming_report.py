"""Incremental corpus data card (streaming/report_stream.py): stream ==
batch equality at every prefix (metrics are per-doc sums, so exact under
any split), re-delivery idempotence, schema geometry guard, and the real
readStream wiring. The cross-engine hash gate is the q_corpus_report_incr
anchor (test_queries_duckdb, same oracle as the batch query)."""

from __future__ import annotations

import os

import pytest

from complete_ocr_spark.functions.report import corpus_report
from complete_ocr_spark.streaming.report_stream import (
    make_report_batch,
    read_report_incr,
    report_paths,
    run_streaming_report,
)

BATCHES = [
    [(1, "one two three", "en"), (2, "   ", "en")],
    [(3, "uno dos", "es"), (4, "a@b.com wrote this here", "en")],
    [(5, "deux trois quatre cinq six sept huit neuf dix " * 12, "fr"),
     (6, "x", None)],
]
SCHEMA = "doc_id bigint, text string, lang string"


def _snap(spark, root):
    return {r["metric"]: (r["n_docs"], r["total"])
            for r in read_report_incr(spark, root).collect()}


def _batch_report(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["metric"]: (r["n_docs"], r["total"])
            for r in corpus_report(df, "doc_id", "text", "lang").collect()}


def test_stream_equals_batch_report_at_every_prefix(spark, tmp_path):
    root = str(tmp_path / "r")
    pb = make_report_batch(spark, root, "doc_id", "text", lang_col="lang")
    seen = []
    for k, rows in enumerate(BATCHES):
        pb(spark.createDataFrame(rows, SCHEMA), k)
        seen += rows
        assert _snap(spark, root) == _batch_report(spark, seen), f"prefix {k}"


def test_redelivery_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "r")
    pb = make_report_batch(spark, root, "doc_id", "text", lang_col="lang")
    for k, rows in enumerate(BATCHES):
        pb(spark.createDataFrame(rows, SCHEMA), k)
    before = _snap(spark, root)
    pb(spark.createDataFrame(BATCHES[1], SCHEMA), 1)  # replay
    assert _snap(spark, root) == before


def test_geometry_guard_pins_metric_schema(spark, tmp_path):
    """A resume with a different lang column (a different metric schema)
    must refuse: summing two data-card standards would silently mix."""
    root = str(tmp_path / "r")
    make_report_batch(spark, root, "doc_id", "text", lang_col="lang")(
        spark.createDataFrame(BATCHES[0], SCHEMA), 0)
    with pytest.raises(Exception, match="geometry"):
        make_report_batch(spark, root, "doc_id", "text", lang_col=None)(
            spark.createDataFrame(BATCHES[1], SCHEMA), 1)


def test_empty_batch_is_a_noop(spark, tmp_path):
    root = str(tmp_path / "r")
    pb = make_report_batch(spark, root, "doc_id", "text", lang_col="lang")
    pb(spark.createDataFrame([], SCHEMA), 0)
    assert _snap(spark, root) == {}  # no store yet, empty view
    pb(spark.createDataFrame(BATCHES[0], SCHEMA), 1)
    before = _snap(spark, root)
    pb(spark.createDataFrame([], SCHEMA), 2)
    assert _snap(spark, root) == before


def test_run_streaming_report_end_to_end(spark, tmp_path):
    """The real foreachBatch wiring: one micro-batch per parquet part-file
    under availableNow; the promoted view equals the batch operator over
    the union; a drained rerun on the same checkpoint is a no-op."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    for rows in BATCHES:
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)
    root = str(tmp_path / "wired")
    ckpt = str(tmp_path / "ckpt")

    def _stream():
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    q = run_streaming_report(spark, _stream(), root, ckpt,
                             id_col="doc_id", text_col="text",
                             lang_col="lang")
    q.awaitTermination(120)
    union = [r for b in BATCHES for r in b]
    assert _snap(spark, root) == _batch_report(spark, union)
    n_files = sum(len(fs) for _, _, fs in os.walk(report_paths(root)))
    q2 = run_streaming_report(spark, _stream(), root, ckpt,
                              id_col="doc_id", text_col="text",
                              lang_col="lang")
    q2.awaitTermination(120)
    assert sum(len(fs) for _, _, fs in os.walk(report_paths(root))) == n_files
