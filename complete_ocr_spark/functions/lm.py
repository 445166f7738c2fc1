"""Hashed-bigram language-model perplexity filtering — the CCNet stage the
quality stack was still missing: an ABSOLUTE in-domain likelihood score
(KenLM's role in CCNet), complementing DSIR's contrastive target-vs-raw
LLR and the trained classifier's supervised margin.

Model: add-one-smoothed bigram LM over md5-hashed buckets,

    logp(w2 | w1) = ln(C2[b2(w1 w2)] + 1) - ln(C1[b1(w1)] + V)

with V = the unigram bucket count (the hashed vocabulary size — the
add-one mass is spread over the hash range, the usual hashed-LM
convention).  A doc's negative log likelihood is summed over its bigram
positions; the filter gates on avg_nll_micros = nll div n_bigrams (high
average surprise = out-of-domain / garbled).

Determinism contract (dsir_weights' discipline, copied exactly): the two
count tables are bounded-key groupBys (<= n_buckets rows each,
map-side-combined — corpus-size-independent shuffles); ln() touches ONLY
those bounded tables and is floor-quantized to integer micros there;
per-doc scoring is a ZERO-shuffle Catalyst fold over two broadcast
``array<bigint>`` rows, integer-exact and summation-order-independent.
Cross-engine float risk is confined to the same ~1-ulp-at-a-floor-boundary
class dsir_weights quantifies.

Scale shape at 10^12 docs: training = two scans of the (small) target
corpus collapsing to 2 x n_buckets rows; scoring = one corpus scan, zero
exchanges on the corpus side (scan -> broadcast -> project).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import normalized


def _tokens(text_col: str):
    return F.split(normalized(F.col(text_col)), " ")


def _bucket_expr(inner: str, n_buckets: int) -> str:
    return (f"int(conv(substring(md5({inner}), 1, 8), 16, 10) "
            f"% {int(n_buckets)})")


def lm_tables(target: DataFrame, id_col: str, text_col: str,
              n_buckets: int = 1024) -> DataFrame:
    """Fit the hashed-bigram LM on the target corpus: one row per bucket
    0..n_buckets-1 with (bucket, uni_count, bi_count, w1_micros,
    w2_micros) where

        w2_micros = floor(1e6 * ln(bi_count + 1))      (numerator table)
        w1_micros = floor(1e6 * ln(uni_count + V))     (denominator table)

    so a bigram position scores w2[b2] - w1[b1] micros of log-prob.
    Unigram counts exclude each doc's last token (they are CONTEXT
    counts — the bigram denominator), so unseen-context smoothing is
    exact.  Two bounded-key groupBys + a window over the bucket frame
    only; the only float arithmetic in the module happens here and is
    immediately quantized."""
    spark = target.sparkSession
    toks = (
        target.select(_tokens(text_col).alias("_t"))
        .filter(F.array_join("_t", "") != "")
    )
    uni = (
        toks.select(
            F.explode(F.expr("slice(_t, 1, size(_t) - 1)")).alias("g")
        )
        .filter(F.col("g").isNotNull())
        .select(F.expr(_bucket_expr("g", n_buckets)).alias("b"))
        .groupBy("b").agg(F.count("*").cast("bigint").alias("uni_count"))
    )
    bi = (
        toks.filter(F.size("_t") >= 2)
        .select(F.explode(F.expr(
            "transform(sequence(1, size(_t) - 1), "
            "i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
        )).alias("g"))
        .select(F.expr(_bucket_expr("g", n_buckets)).alias("b"))
        .groupBy("b").agg(F.count("*").cast("bigint").alias("bi_count"))
    )
    frame = spark.range(n_buckets).select(F.col("id").cast("int").alias("b"))
    joined = (
        frame.join(uni, "b", "left").join(bi, "b", "left")
        .select(
            "b",
            F.coalesce("uni_count", F.lit(0)).cast("bigint")
            .alias("uni_count"),
            F.coalesce("bi_count", F.lit(0)).cast("bigint")
            .alias("bi_count"),
        )
    )
    return joined.select(
        F.col("b").alias("bucket"), "uni_count", "bi_count",
        F.floor(F.log(F.col("uni_count") + int(n_buckets)) * 1_000_000)
        .cast("bigint").alias("w1_micros"),
        F.floor(F.log(F.col("bi_count") + 1) * 1_000_000)
        .cast("bigint").alias("w2_micros"),
    )


def lm_score(docs: DataFrame, id_col: str, text_col: str,
             w1_micros: list[int], w2_micros: list[int]) -> DataFrame:
    """Per-doc LM surprise, ZERO-shuffle: (doc_id, n_bigrams, nll_micros,
    avg_nll_micros) with nll = -sum over bigram positions of
    (w2[b2(bigram)] - w1[b1(prev token)]).  The two tables ride ONE
    broadcast row (the hashed_quality_score trick); docs with < 2 tokens
    are dropped (no bigram evidence).  ``w1_micros``/``w2_micros`` are
    lm_tables' columns ordered by bucket — a <= n_buckets driver read."""
    if len(w1_micros) != len(w2_micros):
        raise ValueError("w1/w2 tables must have one entry per bucket")
    n = len(w1_micros)
    spark = docs.sparkSession
    tabs = spark.createDataFrame(
        [(list(int(x) for x in w1_micros),
          list(int(x) for x in w2_micros))],
        "lw1: array<bigint>, lw2: array<bigint>",
    )
    b2 = _bucket_expr(
        "concat(element_at(_t, i), ' ', element_at(_t, i + 1))", n)
    b1 = _bucket_expr("element_at(_t, i)", n)
    score = F.expr(
        f"aggregate(sequence(1, size(_t) - 1), bigint(0), (a, i) -> "
        f"a + element_at(lw2, {b2} + 1) - element_at(lw1, {b1} + 1))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), _tokens(text_col).alias("_t"))
        .filter(F.size("_t") >= 2)
        .filter(F.array_join("_t", "") != "")
        .crossJoin(F.broadcast(tabs))
        .withColumn("_s", score)
        .select(
            "doc_id",
            (F.size("_t") - 1).cast("bigint").alias("n_bigrams"),
            (-F.col("_s")).cast("bigint").alias("nll_micros"),
            F.expr("(-_s) div (size(_t) - 1)").cast("bigint")
            .alias("avg_nll_micros"),
        )
    )


def lm_margin_col(df: DataFrame, text_col: str,
                  w1_micros: list[int], w2_micros: list[int],
                  out_col: str = "avg_nll_micros") -> DataFrame:
    """lm_score's avg_nll appended AS A COLUMN, keeping every input column
    (the prep.quality_margin_col pattern — for the curation perplexity
    gate, no doc-keyed join back).  NULL when the doc has < 2 tokens (no
    bigram evidence).  Zero shuffle: one broadcast row, one projection."""
    if len(w1_micros) != len(w2_micros):
        raise ValueError("w1/w2 tables must have one entry per bucket")
    n = len(w1_micros)
    spark = df.sparkSession
    tabs = spark.createDataFrame(
        [(list(int(x) for x in w1_micros),
          list(int(x) for x in w2_micros))],
        "_lm1: array<bigint>, _lm2: array<bigint>",
    )
    b2 = _bucket_expr(
        "concat(element_at(_lm_t, i), ' ', element_at(_lm_t, i + 1))", n)
    b1 = _bucket_expr("element_at(_lm_t, i)", n)
    avg_nll = F.expr(
        f"CASE WHEN size(_lm_t) >= 2 THEN "
        f"(-aggregate(sequence(1, size(_lm_t) - 1), bigint(0), (a, i) -> "
        f"a + element_at(_lm2, {b2} + 1) - element_at(_lm1, {b1} + 1))) "
        f"div (size(_lm_t) - 1) END"
    )
    return (
        df.crossJoin(F.broadcast(tabs))
        .withColumn("_lm_t", _tokens(text_col))
        .withColumn(out_col, avg_nll)
        .drop("_lm1", "_lm2", "_lm_t")
    )


def perplexity_filter(docs: DataFrame, target: DataFrame, id_col: str,
                      text_col: str, max_avg_nll_micros: int,
                      n_buckets: int = 1024) -> DataFrame:
    """End-to-end CCNet-style perplexity gate: fit the hashed-bigram LM on
    the target corpus, score every doc, keep avg_nll <= the bound.
    Returns lm_score's columns + ``pass``.  Docs without bigram evidence
    (< 2 tokens) are absent — gate them upstream (curation's empty gate)."""
    t = lm_tables(target, id_col, text_col, n_buckets)
    rows = t.select("bucket", "w1_micros", "w2_micros") \
        .orderBy("bucket").collect()  # bounded: n_buckets rows
    w1 = [r["w1_micros"] for r in rows]
    w2 = [r["w2_micros"] for r in rows]
    return lm_score(docs, id_col, text_col, w1, w2).withColumn(
        "pass", F.col("avg_nll_micros") <= int(max_avg_nll_micros)
    )
