"""Event-time windowed aggregation with a watermark (Structured Streaming's
late-data path).

The batch engine's event analytics (q_value_percentiles, q_event_type_matrix,
sessionization) assume a complete table; a live event feed needs bounded
state: ``withWatermark`` declares how late an event may arrive, tumbling
``window(ts, ...)`` buckets events by event time, and append-mode emits a
window exactly once — when the watermark passes its end — while events later
than the watermark are DROPPED instead of corrupting an already-emitted
window. State held per trigger is only the set of open windows (bounded by
watermark delay / window size), independent of stream length — the property
that lets this run forever at 10^12 events.

Sums use the same exact-DECIMAL idiom as the batch queries so emitted rows
are order-independent and comparable against a batch recomputation of the
on-time events (tests/test_streaming_windowed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(events: DataFrame, window_size: str = "5 minutes",
                          watermark_delay: str = "10 minutes") -> DataFrame:
    """(ts timestamp, event_type string, value double) -> per-window per-type
    counts and exact-decimal value sums. Works on both a batch DataFrame and
    a stream (the transformation is identical; only the sink differs)."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "event_type", "n_events", "sum_value",
        )
    )


def run_windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
    window_size: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Stream event parquet files; append-mode parquet sink emits each window
    once its end falls behind the watermark. Windows still open when the
    source drains stay in state (they would emit on the next arrival that
    advances the watermark) — exactly the semantics a forever-running feed
    needs; tests close windows by appending a clock-advancing event."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return (
        windowed_event_counts(stream, window_size, watermark_delay)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
