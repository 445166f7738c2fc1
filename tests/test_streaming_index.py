"""Incremental BM25 index maintenance (streaming/index_stream.py):
streaming-built == batch-built bit-equality, batch re-delivery
idempotence, geometry guard, empty/bootstrap behavior, rebase."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from complete_ocr_spark.functions import retrieval
from complete_ocr_spark.streaming.index_stream import (
    bm25_topk_incr,
    index_paths,
    make_index_batch,
    read_index_stats,
    rebase,
)

BATCHES = [
    [(1, "spark shuffle join broadcast join join"),
     (2, "a plain document with a single join mention in many more words")],
    [(3, "broadcast broadcast broadcast"),
     (4, "shuffle join"),
     (5, "   ")],                       # featureless: no postings, no stats
    [(6, "join shuffle join partition exchange")],
]
TERMS = ["join", "shuffle"]
NB = 8


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _run_all(spark, root):
    pb = make_index_batch(spark, str(root), n_buckets=NB)
    for bid, rows in enumerate(BATCHES):
        pb(_df(spark, rows), bid)
    return pb


def test_streaming_index_equals_batch_index(spark, tmp_path):
    sroot = tmp_path / "stream"
    _run_all(spark, sroot)
    union = _df(spark, [r for b in BATCHES for r in b])
    broot = str(tmp_path / "batch")
    retrieval.build_term_index(union, "doc_id", "text", broot, n_buckets=NB)

    got = [tuple(r) for r in
           bm25_topk_incr(spark, str(sroot), TERMS, k=10, n_buckets=NB).collect()]
    exp = [tuple(r) for r in
           retrieval.bm25_topk_indexed(spark, broot, TERMS, k=10,
                                       n_buckets=NB).collect()]
    assert got == exp and got  # non-vacuous
    # stats aggregate identically (featureless doc 5 counted by neither)
    assert read_index_stats(spark, str(sroot)) == \
        retrieval.corpus_stats(union, "text")


def test_batch_redelivery_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "s")
    pb = _run_all(spark, root)
    before = sorted(
        tuple(r) for r in
        spark.read.parquet(index_paths(root)[0]).collect()
    )
    stats_before = read_index_stats(spark, root)
    pb(_df(spark, BATCHES[1]), 1)  # replay batch 1
    after = sorted(
        tuple(r) for r in
        spark.read.parquet(index_paths(root)[0]).collect()
    )
    assert after == before
    assert read_index_stats(spark, root) == stats_before


def test_geometry_guard_refuses_other_bucketing(spark, tmp_path):
    root = str(tmp_path / "s")
    make_index_batch(spark, root, n_buckets=NB)(_df(spark, BATCHES[0]), 0)
    bad = make_index_batch(spark, root, n_buckets=NB * 2)
    with pytest.raises(Exception, match="geometry"):
        bad(_df(spark, BATCHES[2]), 1)


def test_empty_batch_noop_and_bootstrap_query(spark, tmp_path):
    root = str(tmp_path / "s")
    assert bm25_topk_incr(spark, root, TERMS, n_buckets=NB).count() == 0
    pb = make_index_batch(spark, root, n_buckets=NB)
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    pb(empty, 0)  # empty batch: no store, no geometry write
    assert read_index_stats(spark, root) == (0, 0)


def test_rebase_collapses_to_batch_layout(spark, tmp_path):
    sroot = str(tmp_path / "s")
    _run_all(spark, sroot)
    dest = str(tmp_path / "rebased")
    rebase(spark, sroot, dest)
    got = [tuple(r) for r in
           retrieval.bm25_topk_indexed(spark, dest, TERMS, k=10,
                                       n_buckets=NB).collect()]
    exp = [tuple(r) for r in
           bm25_topk_incr(spark, sroot, TERMS, k=10, n_buckets=NB).collect()]
    assert got == exp and got
    # rebased postings carry no batch_id column — the batch layout
    cols = spark.read.parquet(dest + "/postings").columns
    assert "batch_id" not in cols


def test_incr_query_prunes_tb_partitions(spark, tmp_path):
    root = str(tmp_path / "s")
    _run_all(spark, root)
    q = bm25_topk_incr(spark, root, TERMS, k=10, n_buckets=NB)
    plan = q._jdf.queryExecution().executedPlan().toString()
    scans = plan.split("FileScan parquet")[1:]
    assert any("PartitionFilters" in seg and "tb" in
               seg.split("PartitionFilters:")[1].split("]")[0]
               for seg in scans), plan
