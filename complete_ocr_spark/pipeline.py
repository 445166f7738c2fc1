"""The extraction pipeline: explode -> branch -> reassemble (SURVEY.md §3.4).

Plan shape (exactly two executor-boundary crossings):

    docs ──read(parquet/Iceberg)──►
      ├─ resume filter: broadcast left-anti join against lineage buckets (J3)
      ├─ explode(spans) → (doc_id, kind, text, media_ref, offset)
      ├─ repartition(N, doc_id, offset)          ← shuffle #1 (offset = salt:
      │     spans of a media-heavy doc spread across all partitions, so one
      │     2000-span doc cannot skew the UDF stage)
      ├─ kind='text'      → strip_text_udf        (Arrow batch)
      ├─ kind='media_ref' → extract_media_udf     (Arrow batch)
      ├─ unionByName
      └─ groupBy(doc_id) → array_sort(collect_list) → flatten → dense offsets
                                                   ← shuffle #2 (reassembly)

At 100 TB the same plan holds: the explode fan-out is map-side, both UDF stages
are embarrassingly parallel, AQE coalesces the post-aggregation partitions, and
the only per-key state is one document's output spans (bounded by document
size, not table size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.extract import extract_media_udf, strip_text_udf


def explode_spans(docs: DataFrame) -> DataFrame:
    """docs -> one row per span. ``explode`` not ``posexplode``: the span's own
    ``offset`` is the authoritative reading-order key (deterministic, unlike
    the reference's unsorted os.listdir — src/pdf_ocr_frcnn_tesseract_ocr.py:123)."""
    return docs.select("doc_id", F.explode("spans").alias("span")).select(
        "doc_id", "span.kind", "span.text", "span.media_ref", "span.offset"
    )


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    n_partitions: int | None = None,
) -> DataFrame:
    """docs(doc_id, spans) -> docs_out(doc_id, spans) with extracted content."""
    n_partitions = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    exploded = explode_spans(docs)
    # salt-by-offset repartition: bounds per-task memory and de-skews docs with
    # huge span arrays before the expensive UDF stage (north_rule skew handling)
    exploded = exploded.repartition(n_partitions, "doc_id", "offset")

    text_branch = exploded.filter(F.col("kind") == "text").select(
        "doc_id", "offset", strip_text_udf(F.col("text")).alias("out_spans")
    )
    media_branch = exploded.filter(F.col("kind") == "media_ref").select(
        "doc_id",
        "offset",
        extract_media_udf(F.col("media_ref"), F.col("offset")).alias("out_spans"),
    )
    # per-doc seed row: keeps docs whose spans are empty / all-dropped /
    # unknown-kind present in the output (with an empty spans array) instead of
    # silently vanishing at the groupBy. offset -1 sorts first, contributes no
    # spans. Spans with kind ∉ {'text','media_ref'} are dropped by contract.
    empty_spans = "CAST(array() AS array<struct<kind:string,text:string,media_ref:string>>)"
    seed = docs.select(
        "doc_id", F.lit(-1).alias("offset"), F.expr(empty_spans).alias("out_spans")
    )
    both = text_branch.unionByName(media_branch).unionByName(seed)

    # reassembly: order parts by source offset, flatten, assign dense offsets
    parts = both.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("offset", "out_spans"))).alias("parts")
    )
    flat = F.flatten(F.transform(F.col("parts"), lambda p: p["out_spans"]))
    spans = F.transform(
        flat,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return parts.select("doc_id", spans.alias("spans"))
