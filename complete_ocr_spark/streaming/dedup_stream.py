"""Incremental near-duplicate detection for ARRIVING documents.

Beyond-reference scope (the reference is strictly batch): a training-data
pipeline deduplicates each new document against the corpus it has ALREADY
ingested, not against a frozen snapshot. This module maintains a SimHash-64
signature table under ``foreachBatch`` and flags every arriving document
whose signature is within ``max_hamming`` of an earlier one.

Semantics (deterministic, so re-delivery is idempotent):

    doc D in micro-batch k is flagged as a near-dup of C iff
    hamming(sig(D), sig(C)) <= max_hamming and C arrived STRICTLY earlier —
    batch(C) < k, or batch(C) == k and C's id < D's id (within-batch order).
    ``dup_of`` is the matching doc with the smallest (hamming, id).

Join shape is the same banded Manku equi-join as the batch operator
(``dedup.simhash_band_keys``): new signatures equi-join the corpus on
(band, value) with the arrival-order rule as a residual predicate — one
shuffle per micro-batch, never all-pairs, and the corpus side reads only the
signature table (16 bytes/doc), never the corpus text.

Idempotence / restart: signatures and flags are both written with dynamic
partition overwrite keyed by ``batch_id``; a re-delivered batch k recomputes
from ``signatures[batch_id < k]`` (its own failed partial write is excluded
by the filter) and replaces exactly its own partitions. At 10^12 docs the
signature table partitions by a bucket of the band value instead of scanning
whole; the per-batch join cost is |batch| x corpus collisions, not corpus
size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.dedup import simhash64, simhash_band_keys


def dedup_paths(out_root: str) -> tuple[str, str]:
    """(signatures, dup_flags) parquet roots, both partitioned by batch_id."""
    return (
        os.path.join(out_root, "signatures"),
        os.path.join(out_root, "dup_flags"),
    )


def read_flags(spark: SparkSession, out_root: str,
               id_type: str = "bigint") -> DataFrame:
    """dup_flags as a DataFrame; an empty TYPED frame when no batch has
    flagged anything yet (a flag-free batch writes no parquet files, so a
    bare read could not infer the schema)."""
    flag_path = dedup_paths(out_root)[1]
    has_files = os.path.exists(flag_path) and any(
        f.endswith(".parquet")
        for _, _, files in os.walk(flag_path)
        for f in files
    )
    if has_files:
        return spark.read.parquet(flag_path)
    return spark.createDataFrame(
        [],
        f"doc {id_type}, dup_of {id_type}, dup_batch bigint, "
        "hamming int, batch_id bigint",
    )


def _bands(sigs: DataFrame, n_blocks: int, max_hamming: int) -> DataFrame:
    return sigs.select(
        "doc", "batch_id", "simhash_hi", "simhash_lo",
        F.posexplode(simhash_band_keys(n_blocks, max_hamming)).alias("band", "value"),
    )


def near_dup_flags(new_sigs: DataFrame, corpus_sigs: DataFrame,
                   max_hamming: int = 3, n_blocks: int = 4) -> DataFrame:
    """Flag docs in ``new_sigs`` against strictly-earlier docs in
    ``corpus_sigs`` (both: doc, batch_id, simhash_hi, simhash_lo).

    Returns (doc, batch_id, dup_of, dup_batch, hamming) — one row per flagged
    doc, ``dup_of`` = the earlier match minimizing (hamming, doc id)."""
    n = _bands(new_sigs, n_blocks, max_hamming).alias("n")
    c = _bands(corpus_sigs, n_blocks, max_hamming).alias("c")
    earlier = (F.col("c.batch_id") < F.col("n.batch_id")) | (
        (F.col("c.batch_id") == F.col("n.batch_id"))
        & (F.col("c.doc") < F.col("n.doc"))
    )
    ham = (
        F.bit_count(F.col("n.simhash_hi").bitwiseXOR(F.col("c.simhash_hi")))
        + F.bit_count(F.col("n.simhash_lo").bitwiseXOR(F.col("c.simhash_lo")))
    ).cast("int")
    matches = (
        n.join(
            c,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.value") == F.col("c.value"))
            & earlier,
        )
        .select(
            F.col("n.doc").alias("doc"),
            F.col("n.batch_id").alias("batch_id"),
            F.col("c.doc").alias("dup_of"),
            F.col("c.batch_id").alias("dup_batch"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    best = F.min(F.struct("hamming", "dup_of", "dup_batch")).alias("m")
    return (
        matches.groupBy("doc", "batch_id")
        .agg(best)
        .select(
            "doc", "batch_id",
            F.col("m.dup_of").alias("dup_of"),
            F.col("m.dup_batch").alias("dup_batch"),
            F.col("m.hamming").alias("hamming"),
        )
    )


def make_dedup_batch(spark: SparkSession, out_root: str,
                     id_col: str = "doc_id", text_col: str = "text",
                     max_hamming: int = 3, n_blocks: int = 4):
    """foreachBatch body, exposed for direct re-delivery testing."""
    sig_path, flag_path = dedup_paths(out_root)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        sigs = simhash64(batch_df, id_col, text_col).withColumn(
            "batch_id", F.lit(bid)
        )
        if os.path.exists(sig_path):
            prior = spark.read.parquet(sig_path).filter(F.col("batch_id") < bid)
            corpus = prior.unionByName(sigs)
        else:
            corpus = sigs
        flags = near_dup_flags(sigs, corpus, max_hamming, n_blocks)
        # flags may be empty for a batch; write signatures first so the flag
        # write's partition column is still recorded via an explicit lit
        (
            sigs.repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(sig_path)
        )
        (
            flags.withColumn("batch_id", F.lit(bid))  # restore after groupBy
            .repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(flag_path)
        )

    return process_batch


def run_streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    out_root: str,
    checkpoint_dir: str,
    schema=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> StreamingQuery:
    """Stream document parquet files from ``source_dir``; each micro-batch is
    flagged against the signature corpus accumulated so far (module doc)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            make_dedup_batch(spark, out_root, id_col, text_col, max_hamming, n_blocks)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
