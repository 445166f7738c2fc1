"""TableIO: checkpoint-restartable writes with per-partition lineage.

The reference's resumability is "skip PDF→image if Images/ non-empty"
(optimized_code/main.py:67-69) and its run metadata is a wall-clock print
(src/pdf_ocr_frcnn_tesseract_ocr.py:219-222). The engine generalizes both per
the north_rule: documents hash into ``bucket = pmod(xxhash64(doc_id), B)``;
``docs_out`` is written partitioned by bucket with *dynamic partition
overwrite* (idempotent — a re-run of a bucket replaces it byte-for-byte);
``lineage`` records (bucket, doc_range, doc_count, span_count, checksum) and a
restart left-anti-joins docs against completed buckets (broadcast — lineage is
tiny) so finished work is pruned at the scan.

Locally parquet-backed; on a real cluster the same calls map to
``spark.read/writeTo("iceberg.db.docs_out")`` with identity-partitioning on
bucket (no Iceberg runtime jar in this sandbox — verified /opt/spark/jars).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DEFAULT_N_BUCKETS


def require_local(path: str, what: str = "output root") -> str:
    """The driver-side file probes in this module (``os.walk`` short-circuit,
    ``os.path.exists`` resume checks) and in ``streaming.dedup_stream`` see
    only the LOCAL filesystem. On an ``hdfs://`` / ``s3a://`` root they would
    find nothing and silently report an empty write (skipping the lineage
    row) instead of failing — so non-local URIs are rejected loudly here. A
    cluster deployment swaps these probes for the Hadoop FileSystem API (or
    Iceberg snapshot metadata) at this single choke point.

    Returns the bare local path (``file://`` prefix stripped)."""
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme not in ("", "file"):
        raise ValueError(
            f"{what} {path!r} is not a local path: this build's file probes "
            "are local-FS only (see io.require_local); use a file:// root or "
            "swap the probes for the Hadoop FileSystem API"
        )
    return path[len("file://"):] if path.startswith("file://") else path


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_N_BUCKETS,
                id_col: str = "doc_id") -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(id_col), F.lit(n_buckets)).cast("int")
    )


def has_parquet(path: str) -> bool:
    """True iff ``path`` holds at least one parquet data file. The probe
    every resume/read-back decision must use instead of os.path.exists: a
    crash mid-write leaves the directory present with only _temporary
    droppings, and reading it would fail schema inference forever after."""
    return os.path.exists(path) and any(
        f.endswith(".parquet")
        for _, _, files in os.walk(path)
        for f in files
    )


def parallel_actions(*thunks) -> None:
    """Run INDEPENDENT Spark actions concurrently from driver threads
    (optimization guide §2.6: actions are only sequential because driver
    code calls them sequentially; later jobs back-fill executors freed by
    the current job's tail). Each thunk issues one action — typically a
    store write whose job is dominated by task-commit/file latency with
    most executor cores idle, which is exactly when overlap pays.

    ONLY for actions with no read/write dependence on each other's outputs
    (each streaming body documents its grouping at the call site). Spark's
    scheduler handles concurrent jobs natively (FIFO back-fill); any thunk
    exception re-raises here after all threads finish, so a failed write
    still fails the batch."""
    if len(thunks) == 1:
        thunks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
    errs = [f.exception() for f in futures]
    for e in errs:
        if e is not None:
            raise e


def doc_checksum() -> F.Column:
    """Order-sensitive per-document content hash over the output span sequence."""
    return F.xxhash64(F.col("doc_id"), F.to_json(F.col("spans")))


def lineage_rows(docs_out_bucketed: DataFrame) -> DataFrame:
    """Per-bucket lineage: doc range, counts, xor-combined checksum (order-
    insensitive combine of order-sensitive per-doc hashes)."""
    return (
        docs_out_bucketed.withColumn("doc_hash", doc_checksum())
        .groupBy("bucket")
        .agg(
            F.min("doc_id").alias("doc_range_min"),
            F.max("doc_id").alias("doc_range_max"),
            F.count("*").alias("doc_count"),
            F.sum(F.size("spans")).alias("span_count"),
            F.expr("bit_xor(doc_hash)").alias("checksum"),
        )
    )


class TableIO:
    """Parquet-backed local implementation of the Iceberg-shaped sink."""

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = DEFAULT_N_BUCKETS):
        self.spark = spark
        self.root = require_local(root, "TableIO root")
        self.n_buckets = n_buckets
        self.docs_out_path = os.path.join(self.root, "docs_out")
        self.lineage_path = os.path.join(self.root, "lineage")

    # --- resume ---------------------------------------------------------
    def completed_buckets(self) -> DataFrame | None:
        if not os.path.exists(self.lineage_path):
            return None
        return self.spark.read.parquet(self.lineage_path).select("bucket").distinct()

    def filter_pending(self, docs: DataFrame) -> DataFrame:
        """Prune documents in already-completed buckets (J3 broadcast anti-join)."""
        docs = with_bucket(docs, self.n_buckets)
        done = self.completed_buckets()
        if done is None:
            return docs
        return docs.join(F.broadcast(done), "bucket", "left_anti")

    # --- write ----------------------------------------------------------
    def write(self, docs_out: DataFrame,
              exclude_buckets: DataFrame | None = None) -> dict:
        """Idempotent per-bucket overwrite + lineage append.

        The extraction DAG executes exactly once (the parquet write); lineage
        is then computed from the files just written — one cheap scan of the
        output instead of a second full pipeline execution. The per-bucket
        lineage rows are collected driver-side (<= n_buckets rows, bounded at
        any scale) so run stats come for free with no extra action.

        ``exclude_buckets`` (bucket DataFrame) limits lineage to this run's
        buckets when the output directory already holds completed ones.
        Returns {'doc_count', 'span_count', 'buckets'} for the written set.

        Lineage is written with per-bucket dynamic overwrite (not append): a
        second write over the same root replaces each touched bucket's
        lineage row instead of stacking duplicate rows with possibly
        different checksums — write is idempotent at the lineage level too.
        A write that produced no files (empty input) short-circuits before
        the read-back, which could not infer a schema.
        """
        out = with_bucket(docs_out, self.n_buckets)
        (
            out.repartition(self.n_buckets, "bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")  # per-write: robust
            .partitionBy("bucket")                        # under cloned sessions
            .parquet(self.docs_out_path)
        )
        if not any(
            f.endswith(".parquet")
            for _, _, files in os.walk(self.docs_out_path)
            for f in files
        ):
            return {"doc_count": 0, "span_count": 0, "buckets": 0}
        back = self.read_docs_out()
        if exclude_buckets is not None:
            back = back.join(F.broadcast(exclude_buckets), "bucket", "left_anti")
        lin = lineage_rows(back)
        rows = lin.collect()
        if rows:
            (
                self.spark.createDataFrame(rows, lin.schema)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(self.lineage_path)
            )
        return {
            "doc_count": sum(r["doc_count"] for r in rows),
            "span_count": sum(r["span_count"] for r in rows),
            "buckets": len(rows),
        }

    # --- read -----------------------------------------------------------
    def read_docs_out(self) -> DataFrame:
        return self.spark.read.parquet(self.docs_out_path)

    def read_lineage(self) -> DataFrame:
        return self.spark.read.parquet(self.lineage_path)


def run_job(
    spark: SparkSession,
    docs: DataFrame,
    out_root: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    fail_after_buckets: int | None = None,
) -> dict:
    """End-to-end resumable job: prune completed buckets, extract, write.

    ``fail_after_buckets`` simulates a mid-job crash for the restart test: only
    the first k pending buckets are processed this run.
    """
    from .pipeline import run_extraction

    io = TableIO(spark, out_root, n_buckets)
    pending = io.filter_pending(docs)
    if fail_after_buckets is not None:
        keep = [
            r["bucket"]
            for r in pending.select("bucket").distinct().orderBy("bucket").collect()
        ][:fail_after_buckets]
        pending = pending.filter(F.col("bucket").isin(keep))
    # limit-1 emptiness probe, not a full count — a complete pre-pass over the
    # pruned scan at 100 TB just to report a number is an avoidable job; the
    # real doc count comes from the written lineage below.
    if pending.isEmpty():
        return {"docs_processed": 0, "skipped": True}
    done = io.completed_buckets()
    docs_out = run_extraction(spark, pending.drop("bucket"))
    stats = io.write(docs_out, exclude_buckets=done)
    return {"docs_processed": stats["doc_count"], "skipped": False}
