"""Incremental streaming dedup: a near-dup arriving in a later micro-batch is
detected against an earlier batch's corpus; within-batch order breaks ties;
re-delivery and checkpoint restart are idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from complete_ocr_spark.streaming.dedup_stream import (
    dedup_paths,
    make_dedup_batch,
    near_dup_flags,
    read_flags,
    run_streaming_dedup,
)

SCHEMA = "doc_id bigint, text string"
BASE = ("spark shuffles partitioned batches of vectorized arrow pages "
        "through catalyst while the reader prunes nested columns")
UNIQ1 = "a completely different document about table detection and ocr lines"
UNIQ2 = "the quick brown fox jumps over the lazy dog near the river bank"


def _flags(spark, out_root):
    return {
        r["doc"]: (r["dup_of"], r["dup_batch"], r["hamming"], r["batch_id"])
        for r in read_flags(spark, out_root).collect()
    }


def _run(spark, src, out_root, ckpt):
    q = run_streaming_dedup(
        spark, source_dir=src + "/*", out_root=out_root,
        checkpoint_dir=ckpt, schema=SCHEMA,
    )
    q.awaitTermination(300)


def test_cross_batch_and_within_batch_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    out_root = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch 0: the seed corpus
    spark.createDataFrame([(1, BASE), (2, UNIQ1)], SCHEMA).coalesce(1).write.parquet(src + "/f1")
    _run(spark, src, out_root, ckpt)
    assert _flags(spark, out_root) == {}

    # batch 1: doc 3 repeats batch 0's doc 1 (cross-batch dup); docs 4/5 are
    # identical within the batch (within-batch order flags only the later id)
    spark.createDataFrame(
        [(3, BASE), (4, UNIQ2), (5, UNIQ2)], SCHEMA
    ).coalesce(1).write.parquet(src + "/f2")
    _run(spark, src, out_root, ckpt)
    got = _flags(spark, out_root)
    assert got == {3: (1, 0, 0, 1), 5: (4, 1, 0, 1)}

    # signature table holds every doc regardless of flagging
    sig_path, _, band_path = dedup_paths(out_root)
    sigs = spark.read.parquet(sig_path)
    assert sigs.count() == 5
    assert sigs.groupBy("doc").count().filter("count > 1").count() == 0

    # --- re-delivery: re-running committed batch 1 changes nothing ---------
    pb = make_dedup_batch(spark, out_root)
    pb(spark.createDataFrame([(3, BASE), (4, UNIQ2), (5, UNIQ2)], SCHEMA), 1)
    assert _flags(spark, out_root) == got
    assert spark.read.parquet(sig_path).count() == 5

    # --- checkpoint restart: only the new file is processed ----------------
    # doc 6 repeats UNIQ1 (batch 0's doc 2) — detected across a restart
    spark.createDataFrame([(6, UNIQ1)], SCHEMA).coalesce(1).write.parquet(src + "/f3")
    _run(spark, src, out_root, ckpt)
    got3 = _flags(spark, out_root)
    assert got3 == {3: (1, 0, 0, 1), 5: (4, 1, 0, 1), 6: (2, 0, 0, 2)}
    assert spark.read.parquet(sig_path).count() == 6


def test_near_dup_flags_picks_minimum_match(spark):
    """dup_of is the earlier match with the smallest (hamming, id); docs with
    no earlier match (incl. the very first copy) are never flagged."""
    rows = [(10, 0, 5, 5), (11, 0, 5, 5), (20, 1, 5, 5), (21, 1, 9999, 5)]
    sigs = spark.createDataFrame(
        rows, "doc bigint, batch_id bigint, simhash_hi bigint, simhash_lo bigint"
    )
    got = {
        r["doc"]: (r["dup_of"], r["dup_batch"], r["hamming"])
        for r in near_dup_flags(sigs, sigs).collect()
    }
    # 11 matches 10 in-batch; 20 matches 10 and 11 -> min id 10; 21 shares a
    # band value with nothing within hamming 3 except... hi differs by 9999^5
    assert got[11] == (10, 0, 0)
    assert got[20] == (10, 0, 0)
    assert 10 not in got
    assert 21 not in got  # hamming(9999, 5) > 3 despite sharing lo bands


def test_band_index_probe_is_partition_pruned(spark, tmp_path):
    """The corpus side of a micro-batch probe must scan only the vb
    partitions the batch's own band values hash into (PartitionFilters on
    the band_index read), not the whole corpus."""
    from pyspark.sql import functions as F

    from complete_ocr_spark.streaming.dedup_stream import _bands
    from complete_ocr_spark.functions.dedup import simhash64

    src_rows = [(i, f"corpus document number {i} with words {i % 7}") for i in range(1, 40)]
    out_root = str(tmp_path / "out")
    pb = make_dedup_batch(spark, out_root)
    pb(spark.createDataFrame(src_rows, SCHEMA), 0)

    _, _, band_path = dedup_paths(out_root)
    new = spark.createDataFrame([(100, BASE)], SCHEMA)
    sigs = simhash64(new, "doc_id", "text").withColumn("batch_id", F.lit(1))
    nb = _bands(sigs, 4, 3).withColumn("vb", F.pmod("value", F.lit(16)).cast("int"))
    touched = [r["vb"] for r in nb.select("vb").distinct().collect()]
    pruned = spark.read.parquet(band_path).filter(
        (F.col("batch_id") < 1) & F.col("vb").isin(touched)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "vb" in plan.split("PartitionFilters")[1][:200], plan
    # pruned read is a strict subset of the corpus partitions when the batch
    # touches fewer than all vb buckets
    n_all = spark.read.parquet(band_path).select("vb").distinct().count()
    if len(touched) < n_all:
        assert pruned.select("vb").distinct().count() <= len(touched)


def test_geometry_change_on_existing_index_is_refused(spark, tmp_path):
    """Joining new band keys against an index built under a different
    geometry would silently un-flag duplicates — refuse instead."""
    import pytest

    out_root = str(tmp_path / "out")
    pb4 = make_dedup_batch(spark, out_root, n_blocks=4)
    pb4(spark.createDataFrame([(1, BASE)], SCHEMA), 0)
    pb8 = make_dedup_batch(spark, out_root, n_blocks=8)
    with pytest.raises(ValueError, match="geometry mismatch"):
        pb8(spark.createDataFrame([(2, BASE)], SCHEMA), 1)
    # same geometry keeps working
    pb4(spark.createDataFrame([(2, BASE)], SCHEMA), 1)
    assert _flags(spark, out_root) == {2: (1, 0, 0, 1)}


def test_missing_band_index_is_rebuilt_from_signatures(spark, tmp_path):
    """An out_root holding signatures but no band index (pre-index layout or
    a wiped index) must rebuild the index, not treat the corpus as empty."""
    import shutil

    out_root = str(tmp_path / "out")
    pb = make_dedup_batch(spark, out_root)
    pb(spark.createDataFrame([(1, BASE)], SCHEMA), 0)
    _, _, band_path = dedup_paths(out_root)
    shutil.rmtree(band_path)  # simulate the legacy layout
    pb(spark.createDataFrame([(2, BASE)], SCHEMA), 1)
    assert _flags(spark, out_root) == {2: (1, 0, 0, 1)}  # cross-batch dup found
