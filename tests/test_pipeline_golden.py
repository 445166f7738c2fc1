"""The north_rule gate: the Spark pipeline's output must equal the pure-Python
oracle's span sequence exactly — (kind, text, media_ref, order) per document."""

from __future__ import annotations

from complete_ocr_spark.oracle import extract_document
from complete_ocr_spark.pipeline import run_extraction
from complete_ocr_spark.synth import make_docs


def test_pipeline_matches_oracle_exactly(spark, docs_df):
    result = {r["doc_id"]: r["spans"] for r in run_extraction(spark, docs_df).collect()}
    docs = make_docs(120)
    assert len(result) == len(docs)
    mismatches = []
    for doc in docs:
        golden = extract_document(doc)
        got = [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": s["offset"]}
            for s in (result[doc["doc_id"]] or [])
        ]
        if got != golden:
            mismatches.append((doc["doc_id"], golden, got))
    assert not mismatches, f"{len(mismatches)} docs mismatched; first: {mismatches[0][:1]}"


def test_pipeline_output_offsets_dense(spark, docs_df):
    for r in run_extraction(spark, docs_df).collect():
        offs = [s["offset"] for s in r["spans"]]
        assert offs == list(range(len(offs)))


def test_jvm_text_path_equals_fused_kernel(spark, docs_df):
    """The Catalyst text branch (functions.stripexpr) is semantics-identical
    to the Python strip kernel — the documented alternative stays correct."""
    def canon(df):
        return {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in df.collect()}

    assert canon(run_extraction(spark, docs_df, text_path="jvm")) == canon(
        run_extraction(spark, docs_df, text_path="python")
    )


def test_jvm_text_path_counts_tab_edged_anchors_like_python(spark):
    """ADVICE r2: Spark trim strips only ASCII spaces, so anchor text with
    leading/trailing tab/newline must be whitespace-collapsed BEFORE the trim
    or the JVM link-density count drifts from len(" ".join(m.split()))."""
    from complete_ocr_spark.schemas import DOC_SCHEMA

    # plain = "aa foo bar bb cc dd ee x" (24 chars); python counts the anchor
    # as 7 chars (7/24 = 0.29, kept) while trim-before-collapse counted 9
    # (9/24 = 0.375, dropped) — the fixture flips on the 0.33 gate
    block = 'aa <a href="x">\tfoo bar\n</a> bb cc dd ee x'
    rows = [("t1", [("text", block, None, 0)])]
    df = spark.createDataFrame(rows, schema=DOC_SCHEMA)

    def canon(out):
        return {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in out.collect()}

    jvm = canon(run_extraction(spark, df, text_path="jvm"))
    py = canon(run_extraction(spark, df, text_path="python"))
    assert jvm == py
    assert len(py["t1"]) == 1  # density exactly at the 0.33 boundary: kept
