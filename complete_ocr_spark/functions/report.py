"""Corpus data card: the one-pass profiling report a 100 TB corpus release
ships with (docs/tokens/chars totals, language mix, doc-length histogram,
emptiness, PII density) — the numbers every curation decision and every
training-mix plan starts from.

Shape: each doc emits a small array of (metric, value) struct pairs
MAP-SIDE (one Catalyst projection — token counts, digit-bucketed length
histogram, language tags, PII regex counts), then ONE groupBy on the
bounded metric key space (#langs + #digit-buckets + a constant ~10 —
map-side-combined to that many rows per task, corpus-size-independent
shuffle payload).  One corpus scan, one bounded-key exchange, a
report-sized result: the same sizing law as dsir_bucket_counts.

Everything is integer-exact (counts and sums of bigints; the histogram
bucket is the token count's DECIMAL-DIGIT count, a portable pure-integer
log10 bin), so the report hashes identically on every engine — no float
ever touches a corpus-sized row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import normalized
from .prep import pii_counts


def corpus_report(df: DataFrame, id_col: str, text_col: str,
                  lang_col: str | None = None) -> DataFrame:
    """(metric, n_docs, total) — the corpus data card.

    Rows (total = sum of the per-doc value, n_docs = docs contributing):
      docs           1 per doc                  — corpus size
      empty_docs     1 per whitespace-only doc  — emptiness rate
      tokens         whitespace token count     — corpus token volume
      chars          raw char length            — byte-scale proxy
      len_digits:<k> 1 per doc whose token count has k decimal digits
                     — the doc-length histogram in portable integer bins
      lang:<l>       1 per doc of language l    — language mix
      pii_emails/pii_ips/pii_phones — redact_pii's audit counts, emitted
                     only by docs with >= 1 hit (n_docs = affected docs,
                     total = occurrences — both rates a release reports)

    Empty docs contribute only (docs, empty_docs, chars); their token
    count is 0 and they take no histogram or language row (no
    evidence)."""
    toks = F.split(normalized(F.col(text_col)), " ")
    n_tok = F.when(
        F.array_join(toks, "") == "", F.lit(0)
    ).otherwise(F.size(toks)).cast("bigint")
    em, ip, ph = pii_counts(F.col(text_col))
    def pair(m: str, v: str) -> str:
        return f"named_struct('m', {m}, 'v', CAST({v} AS BIGINT))"

    parts = [
        pair("'docs'", "1"),
        "CASE WHEN _nt = 0 THEN " + pair("'empty_docs'", "1") + " END",
        "CASE WHEN _nt > 0 THEN " + pair("'tokens'", "_nt") + " END",
        pair("'chars'", f"length({text_col})"),
        "CASE WHEN _nt > 0 THEN "
        + pair("'len_digits:' || CAST(length(CAST(_nt AS STRING)) AS STRING)",
               "1")
        + " END",
        "CASE WHEN _em > 0 THEN " + pair("'pii_emails'", "_em") + " END",
        "CASE WHEN _ip > 0 THEN " + pair("'pii_ips'", "_ip") + " END",
        "CASE WHEN _ph > 0 THEN " + pair("'pii_phones'", "_ph") + " END",
    ]
    if lang_col:
        parts.append(
            f"CASE WHEN _nt > 0 AND {lang_col} IS NOT NULL THEN "
            + pair(f"'lang:' || {lang_col}", "1") + " END"
        )
    pairs = F.expr(
        "filter(array(" + ", ".join(parts) + "), p -> p IS NOT NULL)"
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col),
            *([F.col(lang_col)] if lang_col else []),
            n_tok.alias("_nt"),
            em.alias("_em"), ip.alias("_ip"), ph.alias("_ph"),
        )
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.m").alias("metric"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("p.v").cast("bigint").alias("total"),
        )
    )
