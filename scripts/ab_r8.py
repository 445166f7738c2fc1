#!/usr/bin/env python3
"""Round-8 same-session A/Bs (the BASELINE.md protocol: both variants in
one JVM, best-of-N, identical outputs asserted).

1. doc_term_pairs tf expression: the round-7 array_position form
   (O(dl * distinct_terms) — each run-end rescans the sorted array from
   the start) vs the round-8 positional run-boundary form (O(dl)) on a
   long high-vocabulary fixture — the regime the verdict flagged
   (round-7 What's wrong #2).
2. bm25_topk stats phase: the round-7 two-pass (corpus_stats +
   idf_micros' explode/groupBy) vs the round-8 single-pass
   corpus_stats_with_df, on the sf documents table.

Usage: python3 scripts/ab_r8.py [n_docs] [doc_len]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from complete_ocr_spark.config import build_spark  # noqa: E402
from complete_ocr_spark.functions import retrieval  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
DOC_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def old_doc_term_pairs(docs, id_col, text_col, n_buckets):
    """The round-7 expression, verbatim (kept here only for the A/B)."""
    t = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                                 r"\s+", " "), " ")
    pairs = F.expr(
        "filter(transform(_t_s, (x, i) -> "
        "CASE WHEN i = size(_t_s) - 1 OR element_at(_t_s, i + 2) <> x THEN "
        "struct(x AS term, CAST(i + 2 - array_position(_t_s, x) AS BIGINT) AS tf) "
        "END), p -> p IS NOT NULL)"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), t.alias("_t"))
        .filter(F.array_join("_t", "") != "")
        .withColumn("dl", F.size("_t").cast("bigint"))
        .withColumn("_t_s", F.array_sort("_t"))
        .select("doc_id", "dl", F.explode(pairs).alias("p"))
        .select(
            "doc_id", "dl",
            F.col("p.term").alias("term"), F.col("p.tf").alias("tf"),
            retrieval.term_bucket(F.col("p.term"), n_buckets).alias("tb"),
        )
    )


def best(fn, reps=REPS):
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        times.append(round(time.monotonic() - t0, 3))
    return times


def main():
    spark = build_spark("ab_r8", master="local[32]", shuffle_partitions=32)

    # --- A/B 1: long high-vocabulary docs --------------------------------
    # each doc: DOC_LEN tokens, ~85% distinct (the worst case for the old
    # array_position scan), deterministic content
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(DOC_LEN - 1)),
                lambda i: F.concat(
                    F.lit("tok"),
                    ((F.col("id") * DOC_LEN + i) % int(DOC_LEN * 0.85))
                    .cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    ).localCheckpoint()

    new_rows = retrieval.doc_term_pairs(docs, "doc_id", "text", 16)
    old_rows = old_doc_term_pairs(docs, "doc_id", "text", 16)
    # identical postings first (the A/B contract)
    assert new_rows.exceptAll(old_rows).isEmpty()
    assert old_rows.exceptAll(new_rows).isEmpty()
    t_new = best(lambda: new_rows.agg(F.sum("tf"), F.count("*")).collect())
    t_old = best(lambda: old_rows.agg(F.sum("tf"), F.count("*")).collect())
    print(f"doc_term_pairs long-doc A/B ({N_DOCS} docs x {DOC_LEN} tokens, "
          f"~{int(DOC_LEN*0.85)} distinct):")
    print(f"  old (array_position): {t_old}  best {min(t_old)}")
    print(f"  new (positional):     {t_new}  best {min(t_new)}")
    print(f"  speedup best/best:    {min(t_old)/min(t_new):.2f}x")

    # --- A/B 2: BM25 scan-route stats phase ------------------------------
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").localCheckpoint()
    terms = ["hash", "join", "scan", "vector"]

    def two_pass():
        n_docs, _ = retrieval.corpus_stats(d, "text")
        retrieval.idf_micros(d, "text", terms, n_docs)

    def one_pass():
        retrieval.corpus_stats_with_df(d, "text", terms)

    t2 = best(two_pass)
    t1 = best(one_pass)
    print(f"bm25 stats phase A/B ({SF_DIR}):")
    print(f"  old (two passes): {t2}  best {min(t2)}")
    print(f"  new (one pass):   {t1}  best {min(t1)}")
    print(f"  speedup best/best: {min(t2)/min(t1):.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
