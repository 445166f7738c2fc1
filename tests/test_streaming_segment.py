"""Incremental segment-level dedup: a duplicated SPAN arriving in a later
micro-batch is detected against the persisted fingerprint store
(strictly-earlier arrival rule); within-batch order breaks ties; re-delivery
and checkpoint restart are idempotent; geometry mixes are refused."""

from __future__ import annotations

import os

import pytest

from complete_ocr_spark.streaming.segment_stream import (
    make_segment_dedup_batch,
    read_segment_spans,
    run_streaming_segment_dedup,
    segment_paths,
)

SCHEMA = "doc_id bigint, text string"
WIN, STRIDE = 6, 3

SH1 = ("alpha beta gamma delta epsilon zeta "
       "eta theta iota kappa lambda mu")              # 12 tokens
SH2 = "north south east west up down left right mid"  # 9 tokens
FA = "fa1 fa2 fa3 fa4 fa5 fa6 fa7 fa8 fa9"
FB = "fb1 fb2 fb3 fb4 fb5 fb6"
FU = "u1 u2 u3 u4 u5 u6 u7 u8"


def _spans(spark, out_root):
    return {
        (r["doc_id"], r["dup_of"], r["span_start"], r["span_end"]):
        (r["n_windows"], r["batch_id"])
        for r in read_segment_spans(spark, out_root).collect()
    }


def _run(spark, src, out_root, ckpt):
    q = run_streaming_segment_dedup(
        spark,
        spark.readStream.schema(SCHEMA).parquet(src + "/*"),
        out_root, ckpt, win=WIN, stride=STRIDE,
    )
    q.awaitTermination(300)


def test_cross_batch_spans_redelivery_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # empty store reads as a typed empty frame
    assert read_segment_spans(spark, out_root).columns == [
        "doc_id", "dup_of", "span_start", "span_end", "n_windows", "batch_id"
    ]

    # batch 0: doc 1 carries the SH1 paragraph; doc 2 unrelated
    spark.createDataFrame(
        [(1, f"{SH1} {FA}"), (2, FU)], SCHEMA
    ).coalesce(1).write.parquet(src + "/f1")
    _run(spark, src, out_root, ckpt)
    assert _spans(spark, out_root) == {}

    # batch 1: doc 3 repeats SH1 behind a 6-token prefix (cross-batch span,
    # stride-aligned); docs 4/5 share SH2 within the batch — only the later
    # id is flagged, against the earlier one
    spark.createDataFrame(
        [(3, f"{FB} {SH1}"), (4, f"{SH2} p1 p2 p3"), (5, f"{SH2} q1 q2 q3")],
        SCHEMA,
    ).coalesce(1).write.parquet(src + "/f2")
    _run(spark, src, out_root, ckpt)
    got = _spans(spark, out_root)
    assert got == {
        (3, 1, 6, 18): (3, 1),   # SH1 inside doc 3, owner = batch-0 doc 1
        (5, 4, 0, 9): (2, 1),    # SH2, within-batch owner = doc 4
    }

    # fingerprint store holds every batch's windows, (batch_id, fb) layout
    fp_path, _ = segment_paths(out_root)
    fps = spark.read.parquet(fp_path)
    assert {r["batch_id"] for r in fps.select("batch_id").distinct().collect()} == {0, 1}
    assert fps.filter("fb is null").count() == 0

    # --- re-delivery: re-running committed batch 1 changes nothing --------
    pb = make_segment_dedup_batch(spark, out_root, win=WIN, stride=STRIDE)
    pb(
        spark.createDataFrame(
            [(3, f"{FB} {SH1}"), (4, f"{SH2} p1 p2 p3"),
             (5, f"{SH2} q1 q2 q3")],
            SCHEMA,
        ),
        1,
    )
    assert _spans(spark, out_root) == got

    # --- checkpoint restart: only the new file is processed ---------------
    # doc 6 repeats SH1 at offset 0 — detected across a restart, against
    # the batch-0 owner
    spark.createDataFrame(
        [(6, f"{SH1} r1 r2 r3")], SCHEMA
    ).coalesce(1).write.parquet(src + "/f3")
    _run(spark, src, out_root, ckpt)
    got3 = _spans(spark, out_root)
    assert got3 == {**got, (6, 1, 0, 12): (3, 2)}

    # --- geometry guard: a different (win, stride) on the same store ------
    bad = make_segment_dedup_batch(spark, out_root, win=8, stride=4)
    with pytest.raises(ValueError, match="geometry"):
        bad(spark.createDataFrame([(9, FU)], SCHEMA), 3)

    # empty batch is a no-op
    pb(spark.createDataFrame([], SCHEMA), 4)
    assert _spans(spark, out_root) == got3


def test_fp_store_probe_partition_prunes(spark, tmp_path):
    """The corpus side of the segment probe reads the (batch_id, fb) layout
    with partition filters — the scan must open only the pruned buckets'
    files, which is the whole point of the store's layout at corpus
    scale."""
    from pyspark.sql import functions as F

    out_root = str(tmp_path / "prune")
    pb = make_segment_dedup_batch(spark, out_root, win=WIN, stride=STRIDE)
    pb(spark.createDataFrame([(1, f"{SH1} {FA}")], SCHEMA), 0)
    pb(spark.createDataFrame([(2, f"{FB} {SH1}")], SCHEMA), 1)
    fp_path, _ = segment_paths(out_root)
    probe = spark.read.parquet(fp_path).filter(
        (F.col("batch_id") < 2) & F.col("fb").isin([0, 3, 7])
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "batch_id" in pf and "fb" in pf, plan


def test_emit_clean_writes_stripped_docs_per_batch(spark, tmp_path):
    """emit_clean=True: the stream's output is the CLEANED text — a later
    batch's doc arrives with its cross-batch duplicate span stripped, docs
    with no detected spans keep their full normalized token stream, and
    re-delivery is idempotent."""
    from complete_ocr_spark.streaming.segment_stream import read_clean_docs

    out_root = str(tmp_path / "clean")
    pb = make_segment_dedup_batch(spark, out_root, win=WIN, stride=STRIDE,
                                  emit_clean=True)
    assert read_clean_docs(spark, out_root).columns == [
        "doc_id", "text_clean", "n_kept", "n_dropped", "batch_id"
    ]
    b0 = spark.createDataFrame([(1, f"{SH1} {FA}"), (2, FU)], SCHEMA)
    b1 = spark.createDataFrame([(3, f"{FB} {SH1}")], SCHEMA)
    pb(b0, 0)
    pb(b1, 1)
    got = {r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_dropped"],
                         r["batch_id"])
           for r in read_clean_docs(spark, out_root).collect()}
    # batch 0: nothing stripped anywhere
    assert got[1] == (f"{SH1} {FA}", 21, 0, 0)
    assert got[2] == (FU, 8, 0, 0)
    # batch 1: doc 3 loses exactly the SH1 span [6, 18)
    assert got[3] == (FB, 6, 12, 1)
    # re-delivery: same result
    pb(b1, 1)
    again = {r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_dropped"],
                           r["batch_id"])
             for r in read_clean_docs(spark, out_root).collect()}
    assert again == got


def test_cdc_scheme_catches_shifted_cross_batch_copy(spark, tmp_path):
    """scheme='cdc': a copied block arriving in a LATER batch behind a
    one-token insertion is detected against the earlier arrival (every
    stride-grid window is off alignment — the stride stream finds
    nothing), the cleaned output strips exactly the duplicated chunks,
    and the two schemes refuse to share a store."""
    import pytest

    from complete_ocr_spark.streaming.segment_stream import read_clean_docs

    copied = " ".join(f"the word{i}" for i in range(30))  # 60 tokens
    b0 = spark.createDataFrame([(1, copied)], SCHEMA)
    b1 = spark.createDataFrame([(2, "intro " + copied)], SCHEMA)

    # stride stream: zero spans (grid misalignment)
    sroot = str(tmp_path / "stride")
    pbs = make_segment_dedup_batch(spark, sroot, win=6, stride=3)
    pbs(b0, 0)
    pbs(b1, 1)
    assert _spans(spark, sroot) == {}

    # cdc stream: chunks re-align after the insertion
    croot = str(tmp_path / "cdc")
    pbc = make_segment_dedup_batch(spark, croot, scheme="cdc",
                                   emit_clean=True)
    pbc(b0, 0)
    pbc(b1, 1)
    got = _spans(spark, croot)
    assert got and all(k[0] == 2 and k[1] == 1 for k in got), got
    dup_toks = sum(k[3] - k[2] for k in got)
    assert dup_toks >= 30
    clean = {r["doc_id"]: r for r in read_clean_docs(spark, croot).collect()}
    assert clean[1]["n_dropped"] == 0 and clean[1]["n_kept"] == 60
    assert clean[2]["n_dropped"] == dup_toks
    assert clean[2]["n_kept"] == 61 - dup_toks

    # scheme mix on one store refuses
    pbs_on_cdc = make_segment_dedup_batch(spark, croot, win=6, stride=3)
    with pytest.raises(ValueError, match="geometry"):
        pbs_on_cdc(b1, 2)
