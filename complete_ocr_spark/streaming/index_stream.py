"""Incremental BM25 posting-index maintenance for ARRIVING documents —
the streaming form of functions.retrieval.build_term_index, completing the
pattern that every at-rest store in this engine has a streaming twin
(doc dedup: dedup_stream; segment dedup: segment_stream; media dedup:
media_sig_fn; now the keyword index).

Store layout (the segment_stream fingerprint-store pattern):

* ``postings/batch_id=K/tb=B`` — (doc_id, dl, term, tf) posting rows of
  batch K, partitioned by arrival batch and term hash bucket tb =
  md5(term) % n_buckets. A query prunes to its terms' tb values across
  ALL batch partitions — per-query read cost tracks |terms|/n_buckets of
  the store, independent of corpus size.
* ``stats/batch_id=K`` — batch K's (n_docs, total_tokens). Global BM25
  stats are the SUM over batch rows: a bounded driver read of n_batches
  1-row partitions (rebase collapses them when file counts matter).

Semantics: documents are IMMUTABLE arrivals (the training-corpus setting —
upstream streaming dedup already collapses re-encounters of the same
content); each doc_id must be delivered in exactly one batch. Re-delivery
of a BATCH is idempotent: both writes are dynamic-partition-overwrite
keyed by batch_id, so a replayed batch replaces exactly its own
partitions and the global stats never double-count. In-place document
UPDATES are out of scope by design — versioned postings would force every
query through a doc-version anti-join whose lookup side cannot be
partition-pruned by term.

Query-time: ``bm25_topk_incr`` scores the pruned postings with the exact
integer-closed contract of the batch routes (retrieval.score_postings),
so streaming-built and batch-built indexes over the same corpus return
bit-identical rows — pinned by test and by the shared DuckDB oracle.

File-count growth: n_batches x touched-tb partitions per query. ``rebase``
rewrites the accumulated store into the batch build_term_index layout
(postings/tb=B + 1-row stats) at a DESTINATION root — the caller swaps
paths atomically; the stream keeps appending to its own root."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions import retrieval
from ..io import require_local
from .dedup_stream import _geometry_guard, _has_parquet

N_TB_BUCKETS = 16


def index_paths(out_root: str) -> tuple[str, str]:
    return (
        os.path.join(out_root, "postings"),
        os.path.join(out_root, "stats"),
    )


def make_index_batch(spark: SparkSession, out_root: str,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = N_TB_BUCKETS):
    """foreachBatch body, exposed for direct re-delivery testing. Per
    batch: one doc_term_pairs map over the batch (batch-sized, no corpus
    read at all — index maintenance is append-shaped), one partitioned
    write, one 1-row stats write. The store's geometry records n_buckets;
    a resume under a different bucketing refuses loudly instead of
    writing postings a query would prune incorrectly."""
    out_root = require_local(out_root, "streaming-index out_root")
    post_path, stats_path = index_paths(out_root)
    geometry = {"kind": "bm25-index", "n_buckets": n_buckets}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if batch_df.isEmpty():
            return
        _geometry_guard(out_root, geometry, filename="_index_geometry.json")
        pairs = retrieval.doc_term_pairs(
            batch_df, id_col, text_col, n_buckets
        ).localCheckpoint()  # feeds the stats agg AND the store write
        (
            pairs.withColumn("batch_id", F.lit(bid))
            .repartition("tb")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "tb")
            .parquet(post_path)
        )
        (
            pairs.groupBy("doc_id").agg(F.first("dl").alias("dl"))
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("dl").cast("bigint").alias("total_tokens"),
            )
            .withColumn("batch_id", F.lit(bid))
            .repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(stats_path)
        )

    return process_batch


def read_index_stats(spark: SparkSession, out_root: str) -> tuple[int, int]:
    """Global (n_docs, total_tokens) = sum over the per-batch stats rows —
    a bounded driver read of n_batches 1-row partitions."""
    stats_path = index_paths(require_local(out_root, "out_root"))[1]
    if not _has_parquet(stats_path):
        return 0, 0
    row = (
        spark.read.parquet(stats_path)
        .agg(F.sum("n_docs").alias("n"), F.sum("total_tokens").alias("tt"))
        .head()
    )
    return int(row["n"] or 0), int(row["tt"] or 0)


def bm25_topk_incr(spark: SparkSession, out_root: str, terms: list[str],
                   k: int = 20, n_buckets: int = N_TB_BUCKETS) -> DataFrame:
    """BM25 top-k over everything indexed so far: prune the store to the
    query terms' tb partitions (across all batches), then the shared
    integer-closed scoring tail — bit-identical to the batch index routes
    over the same corpus."""
    out_root = require_local(out_root, "out_root")
    post_path = index_paths(out_root)[0]
    uniq = sorted(set(terms))
    n_docs, total_tokens = read_index_stats(spark, out_root)
    if n_docs == 0 or not _has_parquet(post_path):
        return spark.createDataFrame(
            [], "doc_id bigint, dl bigint, n_matched int, score_micros bigint"
        )
    post = (
        spark.read.parquet(post_path)
        .filter(
            F.col("tb").isin(retrieval.query_buckets(uniq, n_buckets))
            & F.col("term").isin(uniq)
        )
    )
    return retrieval.score_postings(post, uniq, n_docs, total_tokens, k)


def rebase(spark: SparkSession, out_root: str, dest_root: str) -> None:
    """Collapse the accumulated per-batch store into the batch
    build_term_index layout at dest_root (postings/tb=B, 1-row stats) —
    one shuffle on tb over the full posting table, run when per-query
    file counts (n_batches x touched buckets) start to matter. The
    caller swaps query paths; the streaming root is left untouched."""
    out_root = require_local(out_root, "out_root")
    dest_root = require_local(dest_root, "dest_root")
    post_path, stats_path = index_paths(out_root)
    (
        spark.read.parquet(post_path)
        .select("doc_id", "dl", "term", "tf", "tb")
        .repartition("tb")
        .write.partitionBy("tb").mode("overwrite")
        .parquet(os.path.join(dest_root, "postings"))
    )
    (
        spark.read.parquet(stats_path)
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_tokens").cast("bigint").alias("total_tokens"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(dest_root, "stats"))
    )


def run_streaming_index(spark: SparkSession, source: DataFrame,
                        out_root: str, checkpoint: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = N_TB_BUCKETS) -> StreamingQuery:
    """Wire a streaming source through the index-maintenance batch body
    with exactly-once foreachBatch semantics (availableNow callers drain
    the backlog; long-running callers leave the query active)."""
    pb = make_index_batch(spark, out_root, id_col=id_col,
                          text_col=text_col, n_buckets=n_buckets)
    return (
        source.writeStream.foreachBatch(pb)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
