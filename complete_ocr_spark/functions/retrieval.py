"""BM25 keyword retrieval: the text-side top-k search surface (the
embedding ANN stack's lexical sibling).

Two routes, one scoring contract:

* ``bm25_topk`` — scan-based: score every doc against the query terms in a
  single pass. The per-term idf table is the ONLY float arithmetic
  (|terms| rows, floor-quantized to integer micros — the DSIR confinement
  trick); per-doc tf, length normalization and the final score are
  INTEGER-exact (fixed-point e6 arithmetic, integer ``div`` only), so both
  engines and any summation order agree bit-for-bit. Plan shape: one
  parquet scan -> per-term map-side tf expressions -> TakeOrderedAndProject.
  Zero shuffle. Right for batch scoring / one-off sweeps; at 10^12 docs an
  interactive query should use the index route instead.

* ``build_term_index`` / ``bm25_topk_indexed`` — the scale path, the ANN
  "index at rest" pattern (similarity.py's IVF-at-rest / pq.py's IVFADC)
  transplanted to text: posting lists (term, doc_id, tf, dl) written ONCE,
  partitioned by a term hash bucket; a query reads ONLY its terms' buckets
  (partition pruning, plan-constant in corpus size), computes df from the
  pruned postings, and aggregates scores with one groupBy over candidate
  postings — bounded by the query terms' total document frequency, never
  corpus-sized. dl is denormalized into the posting row (the Lucene norm
  trick) so scoring needs no doc-table join; (N, total_tokens) live in a
  1-row stats table next to the postings.

BM25 (Robertson/Sparck Jones; the Lucene-default formulation):
  idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  score   = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
with k1 = 1.2, b = 0.75 fixed as the exact rationals 12/10 and 3/4 so the
fixed-point plan below is integer-closed. The length norm folds the
corpus-constant DRIVER-SIDE as Q = (N * 1e12) div total_tokens (an exact
Python big-int; = 1e12/avgdl quantized to picos), so the per-row
expression never forms a corpus-sized product:
  L_e6     = (dl * Q) div 1e6                            -- dl/avgdl at e6
  denom_e6 = tf*1e6 + (12 * (250000 + (750000 * L_e6) div 1e6)) div 10
  score_t  = (idf_micros * tf * 2200000) div denom_e6    -- tf*(k1+1)=tf*22/10
Overflow bounds, all int64-checked:
  * dl * Q <= 9.2e18  <=>  dl/avgdl <= 9.2e6 — a single doc may be up to
    ~9 million times the average doc length, INDEPENDENT of corpus size N
    (the earlier dl*N*1e6 form overflowed at dl*N > 9.2e12, i.e. at any
    1e10+-doc corpus with kilotoken docs).
  * numerator idf_m * tf * 2.2e6: idf_m <= ln(2N)*1e6 (~28.6e6 at N=1e12),
    so tf <= ~1.4e5 occurrences of one term in one doc. Promote to
    DECIMAL(38,0) before landing corpora beyond either bound.
Quantizing Q at e12 changes L_e6 by < dl/1e6 + 1 relative to the exact
rational — both engines apply the identical quantized contract, so
cross-engine bit-equality is unaffected.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, functions as F

from .dedup import normalized

K1_NUM, K1_DEN = 12, 10  # k1 = 1.2
B_E6 = 750_000           # b  = 0.75


def _tokens(col):
    return F.split(normalized(col), " ")


def _validate_terms(terms: list[str]) -> list[str]:
    """Entry gate for every query route: non-empty term list, no quote /
    backslash injection into the plan-time SQL text — validated BEFORE any
    corpus job launches (an empty list used to reach F.expr("") only after
    two corpus passes; a bad term failed mid-loop after the stats pass)."""
    if not terms:
        raise ValueError("query terms must be a non-empty list")
    for t in terms:
        if not isinstance(t, str) or t == "":
            raise ValueError(f"query term {t!r} must be a non-empty string")
        if "'" in t or "\\" in t:
            raise ValueError(
                f"query term {t!r} must not contain quotes or backslashes")
    return sorted(set(terms))


def inv_avgdl_e12(n_docs: int, total_tokens: int) -> int:
    """Q = (N * 1e12) div total_tokens — the driver-folded length-norm
    constant (1e12/avgdl), exact Python big-int arithmetic so no engine
    ever forms the dl*N product (module-docstring overflow analysis)."""
    if total_tokens <= 0:
        raise ValueError("total_tokens must be positive")
    return (n_docs * 10**12) // total_tokens


def _score_sql(i: int, idf_m: int, q: int) -> str:
    """The integer-closed per-term BM25 contribution over columns _tf{i}
    and dl (module-docstring derivation; q = inv_avgdl_e12). Emitted as
    SQL text so the SAME string (modulo `div` vs `//`) is what the DuckDB
    oracle runs."""
    return (
        f"(CASE WHEN _tf{i} > 0 THEN "
        f"(CAST({idf_m} AS BIGINT) * _tf{i} * 2200000) div "
        f"(_tf{i} * 1000000 + ({K1_NUM} * (250000 + ({B_E6} * "
        f"((dl * CAST({q} AS BIGINT)) div 1000000)"
        f") div 1000000)) div {K1_DEN}) ELSE CAST(0 AS BIGINT) END)"
    )


def corpus_stats(docs: DataFrame, text_col: str) -> tuple[int, int]:
    """(n_docs, total_tokens) over non-empty docs — the two scalars BM25's
    length normalization needs. One aggregate, a 1-row driver read (the
    bounded-collect class: codebooks, bucket lists, now corpus scalars)."""
    t = _tokens(F.col(text_col))
    row = (
        docs.select(t.alias("_t"))
        .filter(F.array_join("_t", "") != "")
        .agg(F.count("*").alias("n"), F.sum(F.size("_t")).alias("tt"))
        .head()
    )
    return int(row["n"]), int(row["tt"])


def corpus_stats_with_df(docs: DataFrame, text_col: str,
                         terms: list[str]) -> tuple[int, int, dict[str, int]]:
    """(n_docs, total_tokens, {term: df}) in ONE corpus pass — the scan
    route's whole stats phase. df rides the same aggregate as the corpus
    scalars via one array_contains conditional-sum per query term (|terms|
    extra agg columns, all map-side combined), instead of a second
    corpus-sized scan + groupBy. 1-row driver read."""
    uniq = _validate_terms(terms)
    t = _tokens(F.col(text_col))
    aggs = [
        F.count("*").alias("_n"),
        F.sum(F.size("_t")).alias("_tt"),
    ] + [
        F.sum(F.array_contains("_t", term).cast("bigint")).alias(f"_df{i}")
        for i, term in enumerate(uniq)
    ]
    row = (
        docs.select(t.alias("_t"))
        .filter(F.array_join("_t", "") != "")
        .agg(*aggs)
        .collect()[0]
    )
    n = int(row["_n"])
    if n == 0:
        return 0, 0, {term: 0 for term in uniq}
    return n, int(row["_tt"]), {
        term: int(row[f"_df{i}"] or 0) for i, term in enumerate(uniq)
    }


def _idf_from_df(df_map: dict[str, int], n_docs: int,
                 terms: list[str]) -> dict[str, int]:
    """floor(1e6 * ln(1 + (N - df + 0.5)/(df + 0.5))) per term — the one
    float step, on |terms| driver-side scalars, quantized to integer
    micros before anything corpus-sized sees it. Terms absent from the
    corpus get the df=0 smoothed idf."""
    return {
        term: math.floor(1_000_000 * math.log(
            1 + (n_docs - df_map.get(term, 0) + 0.5)
            / (df_map.get(term, 0) + 0.5)))
        for term in sorted(set(terms))
    }


def idf_micros(docs: DataFrame, text_col: str, terms: list[str],
               n_docs: int) -> dict[str, int]:
    """floor(1e6 * ln(1 + (N - df + 0.5)/(df + 0.5))) per query term — the
    one float step, on a |terms|-row table, quantized to integer micros
    before anything corpus-sized sees it. df is computed with the candidate
    terms filtered MAP-SIDE out of each doc's distinct-token array, so the
    groupBy shuffle carries at most |terms| x n_matching_docs narrow rows.
    Terms absent from the corpus get the df=0 smoothed idf.

    Retained for callers that already hold n_docs; the scan route now uses
    corpus_stats_with_df, which folds this df pass into the stats scan."""
    uniq = _validate_terms(terms)
    t = _tokens(F.col(text_col))
    hits = F.filter(F.array_distinct(t), lambda x: x.isin(*uniq))
    df_rows = (
        docs.select(F.explode(hits).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    df = {r["term"]: int(r["df"]) for r in df_rows}
    return _idf_from_df(df, n_docs, uniq)


def bm25_topk(docs: DataFrame, id_col: str, text_col: str,
              terms: list[str], k: int = 20) -> DataFrame:
    """Scan-based BM25 top-k: (doc_id, dl, n_matched, score_micros).

    Per-term tf is one size(filter(tokens)) expression per query term —
    plan-time expansion over the (few) terms, all inside a single Catalyst
    projection; docs matching no term die map-side; the top-k is a
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge),
    never a global sort. Zero shuffle end-to-end; the whole stats phase
    (n_docs, total_tokens, per-term df) is ONE prior pass."""
    uniq = _validate_terms(terms)
    n_docs, total_tokens, dfm = corpus_stats_with_df(docs, text_col, uniq)
    if n_docs == 0:
        return docs.select(
            F.col(id_col).alias("doc_id"),
            F.lit(0).cast("bigint").alias("dl"),
            F.lit(0).cast("int").alias("n_matched"),
            F.lit(0).cast("bigint").alias("score_micros"),
        ).limit(0)
    idf = _idf_from_df(dfm, n_docs, uniq)
    q = inv_avgdl_e12(n_docs, total_tokens)

    t = _tokens(F.col(text_col))
    base = (
        docs.select(F.col(id_col).alias("doc_id"), t.alias("_t"))
        .filter(F.array_join("_t", "") != "")
        .withColumn("dl", F.size("_t").cast("bigint"))
    )
    for i, term in enumerate(uniq):
        # expr text, not a python lambda: a 2-arg default-bound lambda would
        # be read by F.filter as the (element, index) form
        base = base.withColumn(
            f"_tf{i}",
            F.expr(f"CAST(size(filter(_t, x -> x = '{term}')) AS BIGINT)"),
        )
    score = " + ".join(
        _score_sql(i, idf[term], q) for i, term in enumerate(uniq)
    )
    matched = " + ".join(
        f"(CASE WHEN _tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(uniq))
    )
    return (
        base.withColumn("score_micros", F.expr(score))
        .withColumn("n_matched", F.expr(matched).cast("int"))
        .filter(F.col("n_matched") > 0)
        .select("doc_id", "dl", "n_matched", "score_micros")
        .orderBy(F.col("score_micros").desc(), F.col("doc_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Index at rest
# ---------------------------------------------------------------------------


def term_bucket(col, n_buckets: int):
    """Partition key of the posting store: the repo's md5 bucket idiom on
    the term string."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % n_buckets
    )


def doc_term_pairs(docs: DataFrame, id_col: str, text_col: str,
                   n_buckets: int) -> DataFrame:
    """(doc_id, dl, term, tf, tb) posting rows for every non-empty doc —
    the map-side half every index build (batch or streaming) shares.

    (term, tf) pairs come from two POSITIONAL passes over the SORTED token
    array, each O(dl): first collect the 1-based run-START indices (i = 0
    or previous element differs — element_at is O(1) array access), then
    map run j to (term at start_j, tf = start_{j+1} - start_j). No
    array_position (a from-the-start linear scan per run that made long
    high-vocabulary docs O(dl * distinct_terms) — quadratic at index-build
    time); no per-doc hash map; stays inside whole-stage codegen."""
    t = _tokens(F.col(text_col))
    run_starts = F.expr(
        "filter(transform(_t_s, (x, i) -> "
        "CASE WHEN i = 0 THEN 1 "
        "WHEN element_at(_t_s, i) <> x THEN i + 1 END), "
        "v -> v IS NOT NULL)"
    )
    pairs = F.expr(
        "transform(_bs, (s, j) -> struct("
        "element_at(_t_s, s) AS term, "
        "CAST((CASE WHEN j = size(_bs) - 1 THEN size(_t_s) + 1 "
        "ELSE element_at(_bs, j + 2) END) - s AS BIGINT) AS tf))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), t.alias("_t"))
        .filter(F.array_join("_t", "") != "")
        .withColumn("dl", F.size("_t").cast("bigint"))
        .withColumn("_t_s", F.array_sort("_t"))
        .withColumn("_bs", run_starts)
        .select("doc_id", "dl", F.explode(pairs).alias("p"))
        .select(
            "doc_id", "dl",
            F.col("p.term").alias("term"), F.col("p.tf").alias("tf"),
            term_bucket(F.col("p.term"), n_buckets).alias("tb"),
        )
    )


def build_term_index(docs: DataFrame, id_col: str, text_col: str,
                     path: str, n_buckets: int = 64) -> None:
    """Write the posting store: ``{path}/postings`` partitioned by tb =
    md5(term) % n_buckets with rows (term, doc_id, tf, dl), plus a 1-row
    ``{path}/stats`` (n_docs, total_tokens).

    One corpus pass (doc_term_pairs); the only shuffle is the partitioned
    write's hash distribution by tb. At 10^12 docs the posting table is
    ~|distinct (doc, term)| narrow rows — large, but written once and
    pruned to ~|terms|/n_buckets of itself by every query after."""
    t = _tokens(F.col(text_col))
    stats = (
        docs.select(t.alias("_t"))
        .filter(F.array_join("_t", "") != "")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.size("_t")).cast("bigint").alias("total_tokens"),
        )
    )
    (
        doc_term_pairs(docs, id_col, text_col, n_buckets)
        .repartition(n_buckets, "tb")
        .write.partitionBy("tb").mode("overwrite")
        .parquet(f"{path}/postings")
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def bm25_topk_indexed(spark, path: str, terms: list[str], k: int = 20,
                      n_buckets: int = 64) -> DataFrame:
    """BM25 top-k against the at-rest posting store: reads ONLY the query
    terms' tb partitions (PartitionFilters — plan-constant in corpus size),
    computes df from the pruned postings (one tiny groupBy), joins the
    broadcast |terms|-row idf table, and aggregates per-doc scores with one
    groupBy bounded by the terms' total document frequency.

    Same integer-closed scoring contract as bm25_topk: identical inputs
    produce bit-identical (doc_id, dl, n_matched, score_micros) rows."""
    uniq = _validate_terms(terms)
    srow = spark.read.parquet(f"{path}/stats").head()
    n_docs, total_tokens = int(srow["n_docs"]), int(srow["total_tokens"])
    buckets = query_buckets(uniq, n_buckets)
    post = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("tb").isin(buckets) & F.col("term").isin(uniq))
    )
    return score_postings(post, uniq, n_docs, total_tokens, k)


def query_buckets(terms: list[str], n_buckets: int) -> list[int]:
    """The tb partitions a query must read — same md5 idiom as
    term_bucket, computed driver-side."""
    return sorted({
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets
        for t in set(terms)
    })


def score_postings(post: DataFrame, terms: list[str], n_docs: int,
                   total_tokens: int, k: int) -> DataFrame:
    """Shared scoring tail of every at-rest route: df from the (pruned)
    postings, idf quantized to micros (|terms| rows), broadcast join, one
    groupBy bounded by the terms' total document frequency, top-k."""
    spark = post.sparkSession
    uniq = _validate_terms(terms)
    df_rows = post.groupBy("term").agg(F.count("*").alias("df")).collect()
    dfm = {r["term"]: int(r["df"]) for r in df_rows}
    idf = _idf_from_df(dfm, n_docs, uniq)
    q = inv_avgdl_e12(n_docs, total_tokens)
    idf_tbl = spark.createDataFrame(
        [(t, idf[t]) for t in uniq], "term: string, idf_m: bigint"
    )
    contrib = F.expr(
        f"(idf_m * tf * 2200000) div "
        f"(tf * 1000000 + ({K1_NUM} * (250000 + ({B_E6} * "
        f"((dl * CAST({q} AS BIGINT)) div 1000000)"
        f") div 1000000)) div {K1_DEN})"
    )
    return (
        post.join(F.broadcast(idf_tbl), "term")
        .select("doc_id", "dl", contrib.alias("_s"))
        .groupBy("doc_id", "dl")
        .agg(
            F.count("*").cast("int").alias("n_matched"),
            F.sum("_s").cast("bigint").alias("score_micros"),
        )
        .select("doc_id", "dl", "n_matched", "score_micros")
        .orderBy(F.col("score_micros").desc(), F.col("doc_id"))
        .limit(k)
    )
