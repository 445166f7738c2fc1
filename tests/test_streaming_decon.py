"""Incremental decontamination (streaming/decon_stream.py): stream ==
batch equality under arbitrary batch splits, re-delivery idempotence,
benchmark-identity geometry guard, and the real readStream wiring. The
cross-engine hash gate is the q_decontaminate_incr anchor
(test_queries_duckdb, same oracle as the batch query)."""

from __future__ import annotations

import os

import pytest

from complete_ocr_spark.functions import prep
from complete_ocr_spark.streaming.decon_stream import (
    decon_paths,
    make_decon_batch,
    read_decon_incr,
    run_streaming_decon,
)


def _words(k, start=0):
    return " ".join(f"w{i}" for i in range(start, start + k))


BENCH = [(100, _words(8)), (101, _words(8, start=200))]
BATCHES = [
    [(1, _words(8)),                     # exact benchmark copy
     (2, _words(8, start=50))],          # disjoint vocabulary
    [(3, _words(3)),                     # too short for 5-grams
     (4, _words(6) + " zzz " + _words(5, start=80))],   # partial overlap
    [(5, _words(8, start=200)),          # copy of the SECOND bench doc
     (6, _words(20, start=500))],
]
SCHEMA = "doc_id bigint, text string"


def _snap(spark, root):
    return {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contamination"])
        for r in read_decon_incr(spark, root).collect()
    }


def test_stream_equals_batch_decontaminate(spark, tmp_path):
    bench = spark.createDataFrame(BENCH, SCHEMA)
    root = str(tmp_path / "d")
    pb = make_decon_batch(spark, root, bench, n=5)
    seen = []
    for k, rows in enumerate(BATCHES):
        pb(spark.createDataFrame(rows, SCHEMA), k)
        seen += rows
        exp = {
            r["doc_id"]: (r["n_grams"], r["n_hits"], r["contamination"])
            for r in prep.decontaminate(
                spark.createDataFrame(seen, SCHEMA), bench,
                "doc_id", "text", n=5).collect()
        }
        assert _snap(spark, root) == exp, f"prefix {k}"
    got = _snap(spark, root)
    assert set(got) == {1, 4, 5}          # planted overlaps, nothing else
    assert got[1][2] == 1.0 and got[5][2] == 1.0


def test_redelivery_is_idempotent(spark, tmp_path):
    bench = spark.createDataFrame(BENCH, SCHEMA)
    root = str(tmp_path / "d")
    pb = make_decon_batch(spark, root, bench, n=5)
    for k, rows in enumerate(BATCHES):
        pb(spark.createDataFrame(rows, SCHEMA), k)
    before = _snap(spark, root)
    pb(spark.createDataFrame(BATCHES[0], SCHEMA), 0)  # replay
    assert _snap(spark, root) == before


def test_geometry_guard_pins_benchmark_identity(spark, tmp_path):
    """A resume against a DIFFERENT benchmark (or n) must refuse: two
    decontamination standards in one store would be silently mixed."""
    bench = spark.createDataFrame(BENCH, SCHEMA)
    root = str(tmp_path / "d")
    make_decon_batch(spark, root, bench, n=5)(
        spark.createDataFrame(BATCHES[0], SCHEMA), 0)
    other_bench = spark.createDataFrame([(100, _words(9))], SCHEMA)
    with pytest.raises(Exception, match="geometry"):
        make_decon_batch(spark, root, other_bench, n=5)(
            spark.createDataFrame(BATCHES[1], SCHEMA), 1)
    with pytest.raises(Exception, match="geometry"):
        make_decon_batch(spark, root, bench, n=6)(
            spark.createDataFrame(BATCHES[1], SCHEMA), 1)


def test_run_streaming_decon_end_to_end(spark, tmp_path):
    """The real foreachBatch wiring: one micro-batch per parquet
    part-file under availableNow; the store equals the batch operator
    over the union; a drained rerun on the same checkpoint is a no-op."""
    bench = spark.createDataFrame(BENCH, SCHEMA)
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

    q = run_streaming_decon(spark, _stream(), root, ckpt, bench, n=5)
    q.awaitTermination(120)
    union = [r for b in BATCHES for r in b]
    exp = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contamination"])
        for r in prep.decontaminate(
            spark.createDataFrame(union, SCHEMA), bench,
            "doc_id", "text", n=5).collect()
    }
    assert _snap(spark, root) == exp
    n_files = sum(len(fs) for _, _, fs in os.walk(decon_paths(root)))
    q2 = run_streaming_decon(spark, _stream(), root, ckpt, bench, n=5)
    q2.awaitTermination(120)
    assert sum(len(fs) for _, _, fs in os.walk(decon_paths(root))) == n_files
