"""Structured-Streaming evolution path (SURVEY.md §2.10).

The reference is strictly batch (directories end-to-end) and the north_rule
asks for batch + checkpoint restart, which ``complete_ocr_spark.io`` provides.
This module is the optional streaming form: because every stage is a
deterministic per-document map (no cross-document state, no event-time
windows — the W1/W2 session logic is *within* a page), the identical pipeline
body runs under ``readStream`` with ``foreachBatch`` writing through the same
idempotent TableIO sink. Checkpointing comes from the streaming engine; the
lineage table stays the cross-run audit record.

On a real cluster the source would be an Iceberg/Kafka stream of docs rows;
locally the file source over a parquet directory exercises the same code path
(tests append parquet files and watch batches commit).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..io import TableIO, lineage_rows, with_bucket
from ..pipeline import run_extraction
from ..schemas import DOC_SCHEMA


def run_streaming_extraction(
    spark: SparkSession,
    source_dir: str,
    out_root: str,
    checkpoint_dir: str,
    n_buckets: int = 32,
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """Stream docs parquet files from ``source_dir``; each micro-batch runs the
    batch pipeline body and writes through the idempotent sink."""
    io = TableIO(spark, out_root, n_buckets)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        docs_out = run_extraction(spark, batch_df)
        out = with_bucket(docs_out, n_buckets)
        # append (not overwrite): a micro-batch holds a slice of each bucket;
        # exactly-once comes from the streaming checkpoint (re-delivered
        # batches are re-run deterministically)
        out.write.mode("append").partitionBy("bucket").parquet(io.docs_out_path)
        lineage_rows(out).write.mode("append").parquet(io.lineage_path)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
