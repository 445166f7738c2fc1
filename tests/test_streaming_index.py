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



def _postings_files(root) -> int:
    import os
    n = 0
    for base, _, files in os.walk(str(root)):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_scheduled_rebase_bounds_files_and_preserves_results(spark, tmp_path):
    """rebase_every=2 over 3 batches: after the fold, no delta partition
    with batch_id <= 1 remains, one base dir exists, and the top-k is
    bit-identical to the never-rebased store (and non-vacuous)."""
    import os

    from complete_ocr_spark.streaming.index_stream import _read_watermark

    plain = str(tmp_path / "plain")
    _run_all(spark, plain)
    reb = str(tmp_path / "reb")
    pb = make_index_batch(spark, reb, n_buckets=NB, rebase_every=2)
    for bid, rows in enumerate(BATCHES):
        pb(_df(spark, rows), bid)

    through, base = _read_watermark(reb)
    assert through == 1 and base and os.path.isdir(base)
    delta_dirs = [d for d in os.listdir(index_paths(reb)[0])
                  if d.startswith("batch_id=")]
    assert delta_dirs == ["batch_id=2"], delta_dirs
    got = [tuple(r) for r in
           bm25_topk_incr(spark, reb, TERMS, k=10, n_buckets=NB).collect()]
    exp = [tuple(r) for r in
           bm25_topk_incr(spark, plain, TERMS, k=10, n_buckets=NB).collect()]
    assert got == exp and got
    assert read_index_stats(spark, reb) == read_index_stats(spark, plain)


def test_rebase_in_place_fold_boundary_files_shrink(spark, tmp_path):
    """4 batches, rebase_every=2: both folds fire, every delta partition is
    gone, exactly one base generation survives (the dethroned base_1 is
    deleted), and the on-disk file count is strictly below the
    never-rebased twin's."""
    import os

    rows4 = BATCHES + [[(7, "vector scan join"), (8, "join")]]
    plain = str(tmp_path / "plain")
    pbp = make_index_batch(spark, plain, n_buckets=NB)
    reb = str(tmp_path / "reb")
    pbr = make_index_batch(spark, reb, n_buckets=NB, rebase_every=2)
    for bid, rows in enumerate(rows4):
        pbp(_df(spark, rows), bid)
        pbr(_df(spark, rows), bid)
    assert [d for d in os.listdir(index_paths(reb)[0])
            if d.startswith("batch_id=")] == []
    bases = [d for d in os.listdir(reb) if d.startswith("base_")]
    assert bases == ["base_3"], bases
    assert _postings_files(reb) < _postings_files(plain)
    got = [tuple(r) for r in
           bm25_topk_incr(spark, reb, TERMS, k=10, n_buckets=NB).collect()]
    exp = [tuple(r) for r in
           bm25_topk_incr(spark, plain, TERMS, k=10, n_buckets=NB).collect()]
    assert got == exp and got


def test_redelivery_of_folded_batch_is_noop(spark, tmp_path):
    """A checkpoint replay of a batch already folded into the base must
    write NOTHING (its rows live in the base; re-written delta partitions
    would double-count) — store bytes and query rows are unchanged."""
    root = str(tmp_path / "s")
    pb = make_index_batch(spark, root, n_buckets=NB, rebase_every=2)
    for bid, rows in enumerate(BATCHES):
        pb(_df(spark, rows), bid)
    before = [tuple(r) for r in
              bm25_topk_incr(spark, root, TERMS, k=10, n_buckets=NB).collect()]
    files_before = _postings_files(root)
    pb(_df(spark, BATCHES[0]), 0)   # folded: watermark says through=1
    pb(_df(spark, BATCHES[1]), 1)
    assert _postings_files(root) == files_before
    after = [tuple(r) for r in
             bm25_topk_incr(spark, root, TERMS, k=10, n_buckets=NB).collect()]
    assert after == before
    assert read_index_stats(spark, root) == \
        retrieval.corpus_stats(_df(spark, [r for b in BATCHES for r in b]),
                               "text")


def test_manual_rebase_respects_scheduled_base(spark, tmp_path):
    root = str(tmp_path / "s")
    pb = make_index_batch(spark, root, n_buckets=NB, rebase_every=2)
    for bid, rows in enumerate(BATCHES):
        pb(_df(spark, rows), bid)
    dest = str(tmp_path / "rebased")
    rebase(spark, root, dest)
    got = [tuple(r) for r in
           retrieval.bm25_topk_indexed(spark, dest, TERMS, k=10,
                                       n_buckets=NB).collect()]
    exp = [tuple(r) for r in
           bm25_topk_incr(spark, root, TERMS, k=10, n_buckets=NB).collect()]
    assert got == exp and got


def test_run_streaming_index_end_to_end(spark, tmp_path):
    """The REAL foreachBatch wiring (run_streaming_index): a parquet file
    source delivers one micro-batch per part-file under availableNow; the
    resulting store matches the direct make_index_batch invocation
    bit-for-bit, a drained rerun on the same checkpoint is a no-op, and
    the scheduled rebase fires inside the wired stream."""
    import os

    from complete_ocr_spark.streaming.index_stream import (
        _read_watermark,
        run_streaming_index,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    for rows in BATCHES[:2]:
        # one part-file per frame -> one micro-batch each (file-source rule)
        _df(spark, rows).coalesce(1).write.mode("append").parquet(src)
    root = str(tmp_path / "wired")
    ckpt = str(tmp_path / "ckpt")

    def _stream():
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    q = run_streaming_index(spark, _stream(), root, ckpt,
                            n_buckets=NB, rebase_every=2)
    q.awaitTermination(120)
    # scheduled rebase fired inside the wired stream after batch 1
    assert _read_watermark(root)[0] == 1
    # ... and matches the direct-invocation twin over the same deliveries.
    # NOTE: the file source does not guarantee which part-file becomes
    # batch 0, so compare against the query result, which is
    # delivery-order invariant (scores depend only on the corpus).
    direct = str(tmp_path / "direct")
    pb = make_index_batch(spark, direct, n_buckets=NB, rebase_every=2)
    for bid, rows in enumerate(BATCHES[:2]):
        pb(_df(spark, rows), bid)
    got = [tuple(r) for r in
           bm25_topk_incr(spark, root, TERMS, k=10, n_buckets=NB).collect()]
    exp = [tuple(r) for r in
           bm25_topk_incr(spark, direct, TERMS, k=10, n_buckets=NB).collect()]
    assert got == exp and got
    assert read_index_stats(spark, root) == read_index_stats(spark, direct)
    # drained: rerun against the same checkpoint processes nothing new
    files_before = _postings_files(root)
    q2 = run_streaming_index(spark, _stream(), root, ckpt,
                             n_buckets=NB, rebase_every=2)
    q2.awaitTermination(120)
    assert _postings_files(root) == files_before
