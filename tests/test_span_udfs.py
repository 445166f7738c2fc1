"""The span-level scalar UDF forms (strip_text_udf / extract_media_udf) —
the composition API outside the main pipeline — must agree with the oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from complete_ocr_spark.operators.extract import extract_media_udf, strip_text_udf
from complete_ocr_spark.oracle.reference_oracle import extract_page, strip_text_span
from complete_ocr_spark.synth import make_docs


def test_scalar_span_udfs_match_oracle(spark):
    docs = make_docs(20)
    text_rows = [(s["text"],) for d in docs for s in d["spans"] if s["kind"] == "text"][:200]
    tdf = spark.createDataFrame(text_rows, "text string")
    got = tdf.select(strip_text_udf(F.col("text")).alias("out")).collect()
    for (text,), row in zip(text_rows, got):
        expect = strip_text_span(text)
        vals = [(s["kind"], s["text"], s["media_ref"]) for s in row["out"]]
        assert vals == ([] if expect is None else [("text", expect, None)])

    media_rows = [(s["media_ref"], s["offset"]) for d in docs
                  for s in d["spans"] if s["kind"] == "media_ref"][:60]
    mdf = spark.createDataFrame(media_rows, "media_ref string, offset int")
    got = mdf.select(extract_media_udf(F.col("media_ref"), F.col("offset")).alias("out")).collect()
    for (mref, off), row in zip(media_rows, got):
        expect = [(s["kind"], s["text"], s["media_ref"])
                  for s in extract_page(mref, off)]
        assert [(s["kind"], s["text"], s["media_ref"]) for s in row["out"]] == expect
