"""Text-analysis column functions for large-scale training-data pipelines.

All JVM-side ``pyspark.sql.functions`` expressions (whole-stage codegen, no
Python in the hot path): token counting, quality scoring, language-ID
heuristic, document fingerprinting. Each has an exact ANSI-SQL twin in
``complete_ocr_spark.queries`` so the DuckDB oracle checks the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny stopword lists for the n-gram/stopword language heuristic.
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is")


def token_count(col: Column) -> Column:
    """Whitespace tokenization count (U4-adjacent: page text -> tokens)."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish proxy: word-piece regex (letter runs, digit runs, punctuation
    each count as one token)."""
    return F.regexp_count(col, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[^a-zA-Z0-9\s]", "")
    return (F.length(col) - F.length(stripped)) / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    words = F.split(F.lower(F.trim(col)), r"\s+")
    hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS_EN)))
    return hits / F.greatest(F.size(words), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]: length band + low punctuation + some
    stopwords — a deterministic stand-in for a learned quality classifier."""
    len_ok = F.when((F.length(col) >= 100) & (F.length(col) <= 20000), 1.0).otherwise(0.4)
    punct_ok = F.when(punct_ratio(col) <= 0.1, 1.0).otherwise(0.5)
    stop_ok = F.when(stopword_ratio(col) >= 0.01, 1.0).otherwise(0.6)
    return F.round((len_ok + punct_ok + stop_ok) / 3.0, 6)


def lang_id(col: Column) -> Column:
    """Stopword-hit language heuristic: 'en' if any English stopword token is
    present, else 'unknown' — the shape of an n-gram langid at trivial cost."""
    return F.when(stopword_ratio(col) > 0.0, F.lit("en")).otherwise(F.lit("unknown"))


def fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint: md5 over lowercased, whitespace-
    collapsed text (stable across engines — md5 is bit-identical in DuckDB)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def dup_line_fraction(col: Column) -> Column:
    """Fraction of non-empty lines that repeat an earlier line (the Gopher
    duplicate-line-fraction signal): (n_lines - n_distinct_lines) / n_lines.
    Machine-generated and templated pages repeat whole lines; prose does
    not. Pure Catalyst (split + array_distinct), 6-dp rounded."""
    lines = F.filter(F.split(col, "\n"), lambda x: F.trim(x) != "")
    return F.round(
        (F.size(lines) - F.size(F.array_distinct(lines)))
        / F.greatest(F.size(lines), F.lit(1)).cast("double"),
        6,
    )


def top_bigram_fraction(col: Column) -> Column:
    """Fraction of token bigrams equal to the MODAL bigram (the Gopher
    top-2-gram-mass signal): keyword-stuffed or looping text concentrates
    its bigram mass. Per-row higher-order functions only, zero shuffle:
    bigrams via one zip_with over two slices (each input array evaluated
    once), modal count = longest equal run of the SORTED bigram array via a
    single aggregate fold — O(n log n) per doc. (A count-per-distinct-bigram
    formulation looks natural but re-evaluates the bigram-array expression
    inside every nested lambda — O(u x n) re-builds of n concatenated
    strings per doc, measured as minutes over 5k docs.) 0.0 for docs with
    fewer than 2 tokens."""
    t = F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")
    n = F.size(t)
    pair_len = F.greatest(n - 1, F.lit(0))
    bg = F.zip_with(
        F.slice(t, 1, pair_len),
        F.slice(t, 2, pair_len),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    run_now = lambda acc, x: (  # noqa: E731 — shared by run and mx fields
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
    )
    mode = F.aggregate(
        F.array_sort(bg),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("mx")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_now(acc, x).alias("run"),
            F.greatest(acc["mx"], run_now(acc, x)).alias("mx"),
        ),
        lambda acc: acc["mx"],
    )
    return F.when(n < 2, F.lit(0.0)).otherwise(
        F.round(mode / (n - 1).cast("double"), 6)
    )


def symbol_ratio(col: Column) -> Column:
    """Non-alphanumeric, non-whitespace characters over total characters —
    the symbol-heavy-page signal (markup debris, ASCII art, encodings),
    6-dp rounded. Same numerator as punct_ratio; named and rounded as its
    own auditable gate."""
    return F.round(punct_ratio(col), 6)
