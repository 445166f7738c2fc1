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

Idempotence / restart: signatures, flags, and the band index are written
with dynamic partition overwrite keyed by ``batch_id`` (the index also by
``vb``); a re-delivered batch k recomputes from partitions with
``batch_id < k`` (its own failed partial write is excluded by the filter)
and replaces exactly its own partitions. The corpus probe reads the BAND
INDEX partition-pruned to the vb buckets the batch's own band values hash
into (``make_dedup_batch``), so per-batch read cost tracks the batch size,
not the corpus size, and the join cost is |batch| x corpus collisions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.dedup import simhash64, simhash_band_keys
from ..io import require_local


N_VALUE_BUCKETS = 16  # band-index partition fan-out; see make_dedup_batch


def dedup_paths(out_root: str) -> tuple[str, str, str]:
    """(signatures, dup_flags, band_index) parquet roots. signatures/dup_flags
    partition by batch_id; band_index by (batch_id, vb) — vb = pmod(band
    value, N_VALUE_BUCKETS) is the probe-pruning key (module doc).

    ``out_root`` must be local: this module's existence/geometry probes are
    ``os.path`` based (io.require_local explains the loud-failure rationale).
    """
    out_root = require_local(out_root, "streaming-dedup out_root")
    return (
        os.path.join(out_root, "signatures"),
        os.path.join(out_root, "dup_flags"),
        os.path.join(out_root, "band_index"),
    )


def read_flags(spark: SparkSession, out_root: str,
               id_type: str = "bigint") -> DataFrame:
    """dup_flags as a DataFrame; an empty TYPED frame when no batch has
    flagged anything yet (a flag-free batch writes no parquet files, so a
    bare read could not infer the schema). The empty schema's int batch
    columns match what a real read infers (``F.lit(bid)`` data and partition
    inference are both IntegerType), so consumers see ONE schema on both
    paths."""
    flag_path = dedup_paths(out_root)[1]
    if _has_parquet(flag_path):
        return spark.read.parquet(flag_path)
    return spark.createDataFrame(
        [],
        f"doc {id_type}, dup_of {id_type}, dup_batch int, "
        "hamming int, batch_id int",
    )


def _geometry_guard(out_root: str, geometry: dict) -> None:
    """Persist the banding geometry next to the index on first use; refuse to
    run under a DIFFERENT geometry — joining new band keys against an index
    built with other (n_blocks, max_hamming, n_value_buckets) silently
    compares incompatible key spaces and un-flags real duplicates."""
    import json

    path = os.path.join(out_root, "_dedup_geometry.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                stored = json.load(f)
        except ValueError:
            stored = None  # crash mid-write left a truncated file: rewrite it
        if stored is not None:
            if stored != geometry:
                raise ValueError(
                    f"streaming-dedup geometry mismatch at {out_root}: index "
                    f"was built with {stored}, this run uses {geometry}; "
                    "rebuild the index or restore the original parameters"
                )
            return
    os.makedirs(out_root, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(geometry, f)
    os.replace(tmp, path)  # atomic: no truncated file survives a crash


def _has_parquet(path: str) -> bool:
    return os.path.exists(path) and any(
        f.endswith(".parquet") for _, _, files in os.walk(path) for f in files
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
    return _flags_from_bands(
        _bands(new_sigs, n_blocks, max_hamming),
        _bands(corpus_sigs, n_blocks, max_hamming),
        max_hamming,
    )


def _flags_from_bands(new_bands: DataFrame, corpus_bands: DataFrame,
                      max_hamming: int) -> DataFrame:
    """The banded equi-join + popcount verify + min-match pick, over
    pre-banded rows (doc, batch_id, simhash_hi, simhash_lo, band, value)."""
    cols = ["doc", "batch_id", "simhash_hi", "simhash_lo", "band", "value"]
    n = new_bands.select(cols).alias("n")
    c = corpus_bands.select(cols).alias("c")
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
                     max_hamming: int = 3, n_blocks: int = 4,
                     n_value_buckets: int = N_VALUE_BUCKETS):
    """foreachBatch body, exposed for direct re-delivery testing.

    The corpus side of the probe is the BAND INDEX (Manku stores one table
    per band), partitioned by (batch_id, vb = pmod(value, n_value_buckets)):
    a micro-batch lists the <= n_value_buckets vb partitions its own band
    values hash into and the corpus scan partition-prunes to exactly those —
    per-batch read cost tracks |batch| x corpus/n_value_buckets instead of
    the whole signature corpus. Size n_value_buckets ~ the corpus partition
    count at deployment (a small batch then touches a sliver); 16 here keeps
    the sandbox's file count sane."""
    out_root = require_local(out_root, "streaming-dedup out_root")
    sig_path, flag_path, band_path = dedup_paths(out_root)
    geometry = {
        "n_blocks": n_blocks,
        "max_hamming": max_hamming,
        "n_value_buckets": n_value_buckets,
    }

    def _rebuild_band_index(bid: int) -> None:
        """Signatures exist but the band index doesn't (pre-index layout, or
        a wiped index): rebuild it — the index is a pure derivation of the
        signature table, so resuming with an empty one would silently treat
        the corpus as empty and un-flag every cross-batch duplicate."""
        prior_sigs = spark.read.parquet(sig_path).filter(F.col("batch_id") < bid)
        rebuilt = _bands(prior_sigs, n_blocks, max_hamming).withColumn(
            "vb", F.pmod(F.col("value"), F.lit(n_value_buckets)).cast("int")
        )
        (
            rebuilt.repartition("vb")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "vb")
            .parquet(band_path)
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if batch_df.isEmpty():
            # nothing to sign, flag, or index — make the no-op explicit
            # instead of relying on isin([])-is-false and empty-frame writes
            return
        _geometry_guard(out_root, geometry)
        if _has_parquet(sig_path) and not _has_parquet(band_path):
            _rebuild_band_index(bid)
        # localCheckpoint: the signature kernel output feeds FOUR consumers
        # (touched-bucket probe, both flag-join sides, two writes) and Spark
        # does not reuse exchanges across them — materialize the batch-sized
        # result once instead of re-running the kernel per consumer
        sigs = (
            simhash64(batch_df, id_col, text_col)
            .withColumn("batch_id", F.lit(bid))
            .localCheckpoint()
        )
        new_bands = _bands(sigs, n_blocks, max_hamming).withColumn(
            "vb", F.pmod(F.col("value"), F.lit(n_value_buckets)).cast("int")
        )
        # bounded driver read: at most n_value_buckets values
        touched = [r["vb"] for r in new_bands.select("vb").distinct().collect()]
        if os.path.exists(band_path):
            prior_bands = (
                spark.read.parquet(band_path)
                .filter((F.col("batch_id") < bid) & F.col("vb").isin(touched))
            )
            corpus_bands = prior_bands.unionByName(new_bands)
        else:
            corpus_bands = new_bands
        flags = _flags_from_bands(new_bands, corpus_bands, max_hamming)
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
            new_bands.repartition("vb")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "vb")
            .parquet(band_path)
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
