"""Checkpoint-restart: kill after k buckets, rerun, output + lineage identical
to a single-shot run (north_rule idempotent resumability)."""

from __future__ import annotations

import pytest

from complete_ocr_spark.io import TableIO, run_job


@pytest.fixture()
def out_dirs(tmp_path):
    return str(tmp_path / "single"), str(tmp_path / "resumed")


def _canon(df):
    return {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in df.select("doc_id", "spans").collect()
    }


def test_kill_and_restart_is_idempotent(spark, docs_df, out_dirs):
    single_dir, resumed_dir = out_dirs
    n_buckets = 8

    r0 = run_job(spark, docs_df, single_dir, n_buckets=n_buckets)
    assert r0["docs_processed"] == 120

    # crash after 3 buckets, then resume
    r1 = run_job(spark, docs_df, resumed_dir, n_buckets=n_buckets, fail_after_buckets=3)
    assert 0 < r1["docs_processed"] < 120
    r2 = run_job(spark, docs_df, resumed_dir, n_buckets=n_buckets)
    assert r1["docs_processed"] + r2["docs_processed"] == 120

    single = TableIO(spark, single_dir, n_buckets)
    resumed = TableIO(spark, resumed_dir, n_buckets)
    assert _canon(single.read_docs_out()) == _canon(resumed.read_docs_out())

    # lineage agrees bucket-by-bucket (checksums included)
    cols = ["bucket", "doc_count", "span_count", "checksum"]
    lin_s = {r["bucket"]: r.asDict() for r in single.read_lineage().select(cols).collect()}
    lin_r = {r["bucket"]: r.asDict() for r in resumed.read_lineage().select(cols).collect()}
    assert lin_s == lin_r

    # third run: everything pruned by the lineage anti-join
    r3 = run_job(spark, docs_df, resumed_dir, n_buckets=n_buckets)
    assert r3 == {"docs_processed": 0, "skipped": True}


def test_rerun_of_completed_bucket_is_idempotent(spark, docs_df, tmp_path):
    """Dynamic partition overwrite: re-processing a bucket (e.g. a retried task
    after a partial write) replaces it with identical content."""
    d = str(tmp_path / "twice")
    run_job(spark, docs_df, d, n_buckets=4)
    io = TableIO(spark, d, 4)
    before = _canon(io.read_docs_out())
    # force re-run of everything by ignoring lineage
    from complete_ocr_spark.pipeline import run_extraction

    io.write(run_extraction(spark, docs_df))
    assert _canon(io.read_docs_out()) == before
