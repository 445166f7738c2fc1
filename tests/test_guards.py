"""Loud-failure guards: non-local output roots and degenerate parameters."""

from __future__ import annotations

import pytest

from complete_ocr_spark.functions.similarity import ivf_train_kmeans
from complete_ocr_spark.io import require_local


def test_require_local_rejects_remote_uris():
    for uri in ("hdfs://nn:8020/warehouse/x", "s3a://bucket/x", "s3://b/x"):
        with pytest.raises(ValueError, match="not a local path"):
            require_local(uri)


def test_require_local_passes_and_normalizes_local_paths():
    assert require_local("/tmp/x") == "/tmp/x"
    assert require_local("file:///tmp/x") == "/tmp/x"


def test_dedup_paths_reject_remote_root():
    from complete_ocr_spark.streaming.dedup_stream import dedup_paths

    with pytest.raises(ValueError, match="not a local path"):
        dedup_paths("s3a://bucket/dedup")


def test_kmeans_rejects_zero_iterations(spark):
    df = spark.createDataFrame([(1, [0.1, 0.2])], "vid bigint, v array<double>")
    with pytest.raises(ValueError, match="n_iters"):
        ivf_train_kmeans(df, "vid", "v", [[0.0, 0.0]], n_iters=0)


def test_tableio_file_uri_root_normalizes_for_probes(spark, tmp_path, docs_df):
    """A file:// root (the form require_local's error message recommends)
    must write lineage and resume correctly — the os.walk/exists probes see
    the normalized local path, not the URI."""
    from complete_ocr_spark.io import TableIO, run_job

    root = f"file://{tmp_path}/out"
    stats = run_job(spark, docs_df.limit(20), root, n_buckets=4)
    assert stats["docs_processed"] == 20
    io = TableIO(spark, root, 4)
    assert io.read_lineage().count() > 0  # lineage written, not skipped
    again = run_job(spark, docs_df.limit(20), root, n_buckets=4)
    assert again == {"docs_processed": 0, "skipped": True}  # resume works
