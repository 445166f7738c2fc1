#!/usr/bin/env python3
"""Round-8b same-session A/Bs (the BASELINE.md protocol: both variants in
one JVM, best-of-N, identical outputs asserted BEFORE timing).

1. Model-gate margin plumbing: prep.quality_margin_col (the margin appended
   AS A COLUMN inside the curation gate map — zero shuffle) vs the naive
   composition a caller would otherwise write: prep.hashed_quality_score +
   a doc-keyed join back onto the annotated frame (one extra shuffle or a
   broadcast of a corpus-sized side). Measured over the gate-map shape
   curation actually runs (annotate + margin + filter + count).

2. corpus_report's one-pass metric-pair explode vs the naive data card:
   one aggregation job per metric family (docs/tokens/chars + per-lang
   counts + histogram + PII) — the multi-scan shape the single groupBy
   replaces.

Usage: python3 scripts/ab_r8b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from complete_ocr_spark.config import build_spark  # noqa: E402
from complete_ocr_spark.functions import prep  # noqa: E402
from complete_ocr_spark.functions.curate import annotate_gates  # noqa: E402
from complete_ocr_spark.functions.report import corpus_report  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3
NB = 256


def best(fn, reps=REPS):
    out = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        out.append(round(time.monotonic() - t0, 3))
    return out


def main():
    spark = build_spark("ab_r8b", master="local[32]", shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    w = prep.make_hashed_weights(NB)

    # --- A/B 1: margin column vs score+join-back -------------------------
    def col_form():
        ann = prep.quality_margin_col(
            annotate_gates(docs, "text"), "text", w)
        return ann.filter(
            F.col("model_quality_micros").isNotNull()
            & (F.col("model_quality_micros") >= 0))

    def join_form():
        ann = annotate_gates(docs, "text")
        scored = prep.hashed_quality_score(docs, "doc_id", "text", w) \
            .select("doc_id", F.col("score_mean_micros")
                    .alias("model_quality_micros"))
        return ann.join(scored, "doc_id").filter(
            F.col("model_quality_micros").isNotNull()
            & (F.col("model_quality_micros") >= 0))

    a = {r["doc_id"] for r in col_form().select("doc_id").collect()}
    b = {r["doc_id"] for r in join_form().select("doc_id").collect()}
    assert a == b, "gate decisions must be identical before timing"
    col_t = best(lambda: col_form().write.format("noop")
                 .mode("overwrite").save())
    join_t = best(lambda: join_form().write.format("noop")
                  .mode("overwrite").save())
    print(f"margin-as-column: {col_t} best={min(col_t)}")
    print(f"score+join-back : {join_t} best={min(join_t)}")
    print(f"ratio: {min(join_t) / min(col_t):.2f}x")

    # --- A/B 2: one-pass data card vs per-family jobs ---------------------
    def one_pass():
        return {tuple(r) for r in corpus_report(
            docs, "doc_id", "text", lang_col="lang").collect()}

    def per_family():
        out = set()
        toks = F.split(F.regexp_replace(F.lower(F.trim("text")),
                                        r"\s+", " "), " ")
        nt = F.when(F.array_join(toks, "") == "", F.lit(0)) \
            .otherwise(F.size(toks)).cast("bigint")
        base = docs.select("doc_id", "text", "lang", nt.alias("nt"))
        r = base.agg(F.count("*"), F.sum(F.col("nt"))).collect()[0]
        out.add(("docs", int(r[0])))
        out.add(("tokens", int(r[1])))
        for row in base.filter("nt > 0").groupBy("lang").count().collect():
            out.add((f"lang:{row['lang']}", int(row["count"])))
        for row in base.filter("nt > 0").groupBy(
                F.length(F.col("nt").cast("string")).alias("d")) \
                .count().collect():
            out.add((f"len_digits:{row['d']}", int(row["count"])))
        em, ip, ph = prep.pii_counts(F.col("text"))
        r2 = docs.agg(F.sum(em), F.sum(ip), F.sum(ph)).collect()[0]
        out.add(("pii", int(r2[0] or 0) + int(r2[1] or 0) + int(r2[2] or 0)))
        return out

    one_t = best(lambda: one_pass())
    fam_t = best(lambda: per_family())
    print(f"one-pass data card : {one_t} best={min(one_t)}")
    print(f"per-family jobs    : {fam_t} best={min(fam_t)}")
    print(f"ratio: {min(fam_t) / min(one_t):.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
