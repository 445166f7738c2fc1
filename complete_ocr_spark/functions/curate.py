"""Corpus curation: the C4/RefinedWeb-shaped keep/drop decision, composed
from this package's primitives — the step that turns a raw document table
into a training corpus.

Per document, in the order large pipelines apply them (cheapest filter
first, each a reason the judge of a dropped doc can audit):

0. ``empty``         — NULL or whitespace-only text: nothing downstream
   (dedup fingerprints, signatures, embeddings) is meaningful on it, so it
   drops first under its own auditable reason rather than tripping the
   language gate by vacuity.
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
   ``max_dup_segment_frac`` over the exact survivors: a doc mostly
   composed of spans already present in earlier docs drops as
   ``dup_segments``. ``segment_scheme`` picks the detector: ``"stride"``
   (functions.dedup.strip_dup_segments — fixed stride-grid windows,
   maximal coverage on aligned copies) or ``"cdc"``
   (functions.dedup.cdc_dup_chunks — content-defined chunk boundaries,
   robust to insertions that shift every grid window off alignment; the
   right choice for shift-heavy corpora).
8. near dedup   — SimHash <=``max_hamming`` connected components
   (functions.dedup.dup_clusters) over what the earlier tiers kept: only
   each cluster's minimum doc id survives; the rest drop as ``near_dup``.
9. semantic dedup (optional) — SemDeDup-shaped: over the docs every
   earlier tier kept, join the corpus embedding table and find tight
   embedding clusters (functions.similarity.embedding_near_dup_srp
   SRP-LSH candidates -> exact cosine >= ``semantic_threshold`` ->
   connected components); only each cluster's minimum doc id survives, the
   rest drop as ``semantic_dup`` — the paraphrase/re-render case no
   lexical tier can see. Docs without an embedding row pass through (no
   vector, no semantic evidence).
10. media dedup (optional) — the MULTIMODAL gate: a doc whose linked media
   payloads are mostly visual duplicates of media seen elsewhere in the
   corpus (functions.media_dedup perceptual clusters) drops as
   ``media_dup`` even when its text is unique — the re-hosted
   gallery/scan-mirror case no text or embedding tier can see. Evidence is
   per-doc: the fraction of the doc's ``doc_media`` links whose media_ref
   is a non-canonical member of a visual dup cluster. Unlike the dedup
   tiers above this is a per-doc GATE against corpus-level media evidence
   (the media clusters are a property of the media table, not of which
   docs survive), so it needs no survivor ordering — it simply ranks last
   in the first-failing-reason chain. Docs with no media links never trip.

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

from . import dedup, similarity
from .text import (
    dup_line_fraction,
    lang_id,
    quality_score,
    symbol_ratio,
    token_count,
    top_bigram_fraction,
)


def empty_pred(text_col: str):
    """NULL or whitespace-only (module doc #0). NOTE: trim() strips only
    ASCII spaces in both engines, so the blank test collapses ALL whitespace
    via regexp (\\n\\t-only docs are empty too). \\s follows the package-wide
    convention (dedup.normalized, every tokenizer and oracle): Java \\s on
    the Spark side vs RE2 \\s in DuckDB differ only on \\x0B — a corpus
    carrying vertical-tab-only docs would need an explicit [ \\t\\n\\r\\f\\x0B]
    class across ALL operators at once, not just this gate."""
    return F.col(text_col).isNull() | (
        F.regexp_replace(F.col(text_col), r"\s+", "") == ""
    )


_GATE_COLS: dict[str, tuple] = {}


def annotate_gates(df: DataFrame, text_col: str) -> DataFrame:
    """The cheap per-doc gate signals (module doc #1-5) as one narrow map —
    the single body behind batch curation and the incremental runner
    (streaming.curate_stream), so both regimes measure identical values.

    The six signal COLUMNS are memoized per text_col (round 9): Column
    objects are immutable unresolved expression trees, so the same tuple
    resolves against every frame, while rebuilding them (the modal-bigram
    fold is ~40 py4j round-trips alone) cost ~0.3-0.5 s of driver time per
    call — and batch curation, every incremental batch, and the product
    job each call this. Expressions only, never data: every query still
    computes from its inputs."""
    cols = _GATE_COLS.get(text_col)
    if cols is None:
        c = F.col(text_col)
        cols = (
            lang_id(c), quality_score(c), token_count(c),
            dup_line_fraction(c), top_bigram_fraction(c), symbol_ratio(c),
        )
        _GATE_COLS[text_col] = cols
    return (
        df.withColumn("lang", cols[0])
        .withColumn("quality", cols[1])
        .withColumn("n_tokens", cols[2])
        .withColumn("dup_line_frac", cols[3])
        .withColumn("top_bigram_frac", cols[4])
        .withColumn("sym_ratio", cols[5])
    )


_HEUR_MEMO: dict[tuple, "F.Column"] = {}


def heuristic_reason(text_col: str, languages: tuple[str, ...],
                     min_quality: float, max_dup_line_frac: float,
                     max_top_bigram_frac: float, min_bigram_tokens: int,
                     max_symbol_ratio: float):
    """First-failing HEURISTIC gate as a CASE column (NULL = passed all) —
    evaluates over a frame produced by ``annotate_gates``. The dedup tiers'
    reasons chain onto this (Column.when) in arrival order; keeping the
    heuristic chain in one shared expression pins batch and incremental
    curation to the same gate semantics by construction. Memoized per
    parameter tuple (the annotate_gates rule — expressions, never data;
    callers extending the chain with .when get a NEW Column, the shared
    base is immutable)."""
    key = ("reason", text_col, tuple(languages), min_quality,
           max_dup_line_frac, max_top_bigram_frac, min_bigram_tokens,
           max_symbol_ratio)
    memo = _HEUR_MEMO.get(key)
    if memo is not None:
        return memo
    bigram_trips = (F.col("top_bigram_frac") > max_top_bigram_frac) & (
        F.col("n_tokens") >= min_bigram_tokens
    )
    out = (
        F.when(empty_pred(text_col), "empty")
        .when(~F.col("lang").isin(list(languages)), "lang")
        .when(F.col("quality") < min_quality, "quality")
        .when(F.col("dup_line_frac") > max_dup_line_frac, "dup_lines")
        .when(bigram_trips, "bigram_repeat")
        .when(F.col("sym_ratio") > max_symbol_ratio, "symbol_ratio")
    )
    _HEUR_MEMO[key] = out
    return out


def heuristic_pass(text_col: str, languages: tuple[str, ...],
                   min_quality: float, max_dup_line_frac: float,
                   max_top_bigram_frac: float, min_bigram_tokens: int,
                   max_symbol_ratio: float):
    """``heuristic_reason(...) IS NULL`` as a boolean CONJUNCTION — the
    survivor-filter form. Equivalent by construction (same sub-predicates,
    same thresholds), but measurably cheaper as a Filter condition: the
    string-CASE-then-isNull form costs ~25% more per evaluation (measured
    same-session at sf0.1), and batch curation's un-checkpointed ``passed``
    subtree is consumed by several downstream tiers, multiplying that.
    Streaming curation instead materializes the reason column once and
    filters the materialized value — either path, one set of predicates.
    Memoized like ``heuristic_reason``."""
    key = ("pass", text_col, tuple(languages), min_quality,
           max_dup_line_frac, max_top_bigram_frac, min_bigram_tokens,
           max_symbol_ratio)
    memo = _HEUR_MEMO.get(key)
    if memo is not None:
        return memo
    bigram_trips = (F.col("top_bigram_frac") > max_top_bigram_frac) & (
        F.col("n_tokens") >= min_bigram_tokens
    )
    out = (
        ~empty_pred(text_col)
        & F.col("lang").isin(list(languages))
        & (F.col("quality") >= min_quality)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & ~bigram_trips
        & (F.col("sym_ratio") <= max_symbol_ratio)
    )
    _HEUR_MEMO[key] = out
    return out


def curate_corpus(df: DataFrame, id_col: str, text_col: str,
                  languages: tuple[str, ...] = ("en",),
                  min_quality: float = 0.6,
                  max_dup_line_frac: float = 0.3,
                  max_top_bigram_frac: float = 0.1,
                  min_bigram_tokens: int = 20,
                  max_symbol_ratio: float = 0.25,
                  max_dup_segment_frac: float | None = None,
                  segment_scheme: str = "stride",
                  seg_win: int = 20, seg_stride: int = 10,
                  cdc_avg_chunk: int = 8, cdc_min_tokens: int = 5,
                  cdc_window_k: int = 3,
                  max_hamming: int = 3, n_blocks: int = 4,
                  near_dup_sig_store: str | None = None,
                  embeddings: DataFrame | None = None,
                  emb_id_col: str = "vec_id",
                  emb_vec_col: str = "embedding",
                  emb_dim: int = 64,
                  semantic_threshold: float = 0.95,
                  sem_bits: int = 10, sem_tables: int = 2,
                  doc_media: DataFrame | None = None,
                  media: DataFrame | None = None,
                  media_clusters: DataFrame | None = None,
                  max_dup_media_frac: float = 0.5,
                  media_max_hamming: int = 3, media_n_blocks: int = 8,
                  media_sig_store: str | None = None,
                  clf_weights: list[int] | None = None,
                  clf_bias_micros: int = 0,
                  clf_threshold_micros: int = 0,
                  lm_w1_micros: list[int] | None = None,
                  lm_w2_micros: list[int] | None = None,
                  max_avg_nll_micros: int = 0) -> DataFrame:
    """Annotate every document with its keep/drop decision (module doc).

    ``max_dup_segment_frac`` (off by default) inserts a SEGMENT-level stage
    between exact and near dedup: a doc whose duplicated-span coverage
    exceeds the bound drops as ``dup_segments`` — the
    mostly-copied-from-an-earlier-doc case. ``segment_scheme="stride"``
    measures coverage as dedup.strip_dup_segments' n_dropped over total
    tokens (win/stride = ``seg_win``/``seg_stride``); ``"cdc"`` as the
    token count of dedup.cdc_dup_chunks' duplicated chunks (avg/min/window
    = ``cdc_avg_chunk``/``cdc_min_tokens``/``cdc_window_k``) — chunks are
    disjoint per doc, so the sum IS the coverage. Either way the stage runs
    over exact survivors, and near-dup CC then runs over ITS survivors, so
    each dedup tier sees only what the cheaper tiers kept.

    ``embeddings`` (off by default) appends the SEMANTIC tier: a second
    DataFrame holding (``emb_id_col``, ``emb_vec_col``) rows keyed by the
    same ids as ``df``; docs the lexical tiers kept whose embeddings sit in
    one tight cosine cluster (>= ``semantic_threshold`` via SRP-LSH with
    ``sem_bits`` x ``sem_tables``, sized by similarity.suggest_bits at
    deployment) keep only the minimum id, the rest drop as
    ``semantic_dup``. The embedding join is an inner join: a doc with no
    embedding row cannot be semantically deduped and passes through.

    ``doc_media`` (off by default) appends the MEDIA tier (module doc #10):
    (``id_col``, media_ref) link rows, plus EITHER ``media_clusters``
    (precomputed media_dedup.media_dup_clusters output — the corpus-scale
    route: compute or load the visual clusters once) OR ``media`` (the raw
    media table; clusters are computed here, ``media_sig_store`` as in
    media_dedup so the decode kernel runs once). A doc whose fraction of
    linked media that are NON-CANONICAL visual-dup-cluster members exceeds
    ``max_dup_media_frac`` drops as ``media_dup``; the measured fraction is
    returned as a ``dup_media_frac`` column (present only when the tier is
    on). Scale shape: one media_ref equi-join (clusters are small relative
    to the link table) + one groupBy on the doc id — no payload ever rides
    either shuffle.

    ``clf_weights`` (off by default) appends the MODEL-quality gate after
    ``symbol_ratio``: the hashed-linear classifier margin (the
    prep.hashed_quality_score integer contract — weights trainable
    on-cluster via functions/classifier.train_hashed_classifier) must
    reach ``clf_threshold_micros`` or the doc drops as ``model_quality``.
    A narrow map against one broadcast weight row (zero shuffle); the
    margin is returned as ``model_quality_micros`` (present only when the
    tier is on, NULL on empty docs).

    Returns the input columns plus (lang, quality, n_tokens, dup_line_frac,
    top_bigram_frac, sym_ratio, keep boolean, drop_reason string|null).
    Deterministic: survivors of each dedup stage are the minimum doc ids,
    so re-running curation yields byte-identical decisions."""
    if segment_scheme not in ("stride", "cdc"):
        raise ValueError(f"unknown segment_scheme {segment_scheme!r}")
    annotated = annotate_gates(df, text_col)
    gate_args = (
        text_col, languages, min_quality, max_dup_line_frac,
        max_top_bigram_frac, min_bigram_tokens, max_symbol_ratio,
    )
    heur = heuristic_reason(*gate_args)
    # model-quality gate (optional, module doc #5b): the CCNet step — the
    # hashed-linear classifier's margin (functions/prep.hashed_quality_score
    # contract, trainable on-cluster via functions/classifier) against a
    # threshold. A per-doc narrow map vs a FIXED broadcast weight artifact,
    # so it ranks with the heuristic gates: after symbol_ratio (it costs a
    # token-stream fold where 1-5 are cheap scalars), before any dedup tier.
    model_pass = None
    if clf_weights is not None:
        from .prep import quality_margin_col

        annotated = quality_margin_col(
            annotated, text_col, clf_weights, bias_micros=clf_bias_micros,
        )
        model_pass = (
            F.col("model_quality_micros").isNotNull()
            & (F.col("model_quality_micros")
               >= F.lit(int(clf_threshold_micros)))
        )
        heur = heur.when(~model_pass, "model_quality")
    # perplexity gate (optional): the hashed-bigram LM's avg surprise
    # (functions/lm, tables fit offline or via lm.lm_tables) against a
    # bound. Ranks after model_quality (another broadcast fold); docs
    # without bigram evidence (< 2 tokens) PASS — no evidence, no drop
    # (the semantic tier's no-vector rule).
    lm_pass = None
    if lm_w1_micros is not None or lm_w2_micros is not None:
        if lm_w1_micros is None or lm_w2_micros is None:
            raise ValueError(
                "perplexity gate needs BOTH lm_w1_micros and lm_w2_micros "
                "(lm.lm_tables' columns ordered by bucket)"
            )
        from .lm import lm_margin_col

        annotated = lm_margin_col(
            annotated, text_col, lm_w1_micros, lm_w2_micros,
        )
        lm_pass = (
            F.col("avg_nll_micros").isNull()
            | (F.col("avg_nll_micros") <= F.lit(int(max_avg_nll_micros)))
        )
        heur = heur.when(~lm_pass, "perplexity")
    # The annotated frame is consumed by THREE independent subtrees (the
    # fingerprint pass, the survivor anti-join chain, and the final audit
    # join) and Spark reuses no exchanges across them — without a barrier
    # the whole annotate_gates map (the per-row modal-bigram fold is the
    # most expensive expression in the query) re-runs once per consumer. A
    # LAZY localCheckpoint materializes the annotated corpus exactly once
    # at first use; every consumer then reads the checkpointed rows.
    annotated = annotated.localCheckpoint(eager=False)
    passed = annotated.filter(
        heuristic_pass(*gate_args)
        & (model_pass if model_pass is not None else F.lit(True))
        & (lm_pass if lm_pass is not None else F.lit(True))
    )
    # exact dedup: every doc that is NOT its fingerprint group's minimum id.
    # groupBy + join back, NOT a window over fp: a window puts every row of a
    # hot fingerprint (a boilerplate page repeated 10^7 times) into ONE task's
    # sort buffer, while the groupBy collapses the group map-side to a single
    # (fp, min) row before the shuffle — the package's canonical-owner rule
    # (dedup.segment_dup_spans' canon groupBy, exact_dup_groups).
    # (doc, fp) only — and materialized once: the fingerprint frame feeds
    # BOTH the canon groupBy and the probe join side, and each would
    # otherwise re-run the normalize+md5 pass over the survivors' text
    # (round 9; the exact_drops list below likewise feeds two consumers —
    # the survivor anti-join and the final audit join)
    fp = passed.select(
        F.col(id_col).alias("doc"),
        F.md5(dedup.normalized(F.col(text_col))).alias("fp"),
    ).localCheckpoint(eager=False)
    fp_canon = fp.groupBy("fp").agg(F.min("doc").alias("keep_id"))
    exact_drops = (
        fp.join(fp_canon, "fp")
        .filter(F.col("doc") != F.col("keep_id"))
        .select("doc", F.col("keep_id").alias("dup_of"))
        .localCheckpoint(eager=False)
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
        if segment_scheme == "stride":
            stripped = dedup.strip_dup_segments(
                exact_survivors, id_col, text_col,
                win=seg_win, stride=seg_stride,
            )
            seg_cov = stripped.select(
                "doc_id",
                (
                    F.col("n_dropped")
                    / F.greatest(
                        F.col("n_kept") + F.col("n_dropped"), F.lit(1)
                    )
                ).alias("_cov"),
            )
        else:  # cdc: dup-chunk token count over total tokens (chunks are
            # disjoint per doc — the token stream partitions into chunks)
            chunks = dedup.cdc_dup_chunks(
                exact_survivors, id_col, text_col,
                avg_chunk=cdc_avg_chunk, min_tokens=cdc_min_tokens,
                window_k=cdc_window_k,
            )
            nd = chunks.groupBy("doc_id").agg(
                F.sum("n_tokens").alias("_nd")
            )
            nt = exact_survivors.select(
                F.col(id_col).alias("doc_id"),
                F.size(
                    F.split(dedup.normalized(F.col(text_col)), " ")
                ).alias("_nt"),
            )
            seg_cov = nd.join(nt, "doc_id").select(
                "doc_id",
                (F.col("_nd") / F.greatest("_nt", F.lit(1))).alias("_cov"),
            )
        seg_drops = (
            seg_cov.filter(F.col("_cov") > max_dup_segment_frac)
            .select(F.col("doc_id").alias(id_col))
            # id-only and tiny, but its lineage is the whole multi-shuffle
            # segment-detection subtree — which would otherwise re-run per
            # consumer (both SimHash self-join sides + the audit join)
            .localCheckpoint(eager=False)
        )
        seg_survivors = exact_survivors.join(seg_drops, id_col, "left_anti")
    # near dedup over the remaining survivors: drop all but each cluster's
    # min. near_dup_sig_store (optional) makes the signature kernel run once
    # into parquet instead of once per banded-join side — at corpus scale
    # the kernel pass over the survivors' text is the expensive leg
    # (dedup.simhash_hamming_pairs' sig_store contract, INCLUDING its
    # repeated-call caveat: the store is overwritten eagerly per call and
    # read lazily by this view — one path per corpus, or memoize).
    clusters = dedup.dup_clusters(
        seg_survivors, id_col, text_col,
        max_hamming=max_hamming, n_blocks=n_blocks,
        sig_store=near_dup_sig_store,
    )
    near_drops = clusters.filter(F.col("doc") != F.col("cluster")).select("doc")
    # semantic tier (optional): tight embedding clusters over what every
    # lexical tier kept — candidate buckets + exact cosine + CC, all the
    # already-oracled primitives; the embedding payload never rides the
    # candidate shuffle (embedding_near_dup_srp's bare-id join shape)
    sem_drops = None
    if embeddings is not None:
        lex_survivors = seg_survivors.join(
            near_drops.select(F.col("doc").alias(id_col)), id_col, "left_anti"
        )
        emb = lex_survivors.select(id_col).join(
            embeddings.select(
                F.col(emb_id_col).alias(id_col),
                F.col(emb_vec_col).alias("_v"),
            ),
            id_col,
        )
        sem_pairs = similarity.embedding_near_dup_srp(
            emb, id_col, "_v", dim=emb_dim,
            threshold=semantic_threshold,
            n_bits=sem_bits, n_tables=sem_tables,
        )
        sem_cc = dedup.connected_components(
            sem_pairs.select(
                F.col("id1").alias("doc1"), F.col("id2").alias("doc2")
            )
        )
        sem_drops = (
            sem_cc.filter(F.col("doc") != F.col("cluster"))
            .select(F.col("doc").alias(id_col))
        )
    # media tier (optional): per-doc fraction of linked media that are
    # non-canonical members of a visual dup cluster (media_dedup). Corpus-
    # level evidence, not survivor-ordered — see module doc #10.
    media_frac = None
    if doc_media is not None:
        if media_clusters is None:
            if media is None:
                raise ValueError(
                    "doc_media given without media or media_clusters: the "
                    "media tier needs visual-dup evidence to gate against"
                )
            from . import media_dedup

            media_clusters = media_dedup.media_dup_clusters(
                media, max_hamming=media_max_hamming,
                n_blocks=media_n_blocks, sig_store=media_sig_store,
            )
        is_dup_copy = (
            F.col("dup_of").isNotNull()
            & (F.col("media_ref") != F.col("dup_of"))
        ).cast("int")
        media_frac = (
            doc_media.select(id_col, "media_ref")
            .join(media_clusters.select("media_ref", "dup_of"),
                  "media_ref", "left")
            .groupBy(id_col)
            .agg(
                F.round(F.sum(is_dup_copy) / F.count("*"), 6)
                .alias("dup_media_frac")
            )
        )
    reason = (
        heur
        .when(F.col("_exact_dup"), "exact_dup")
        .when(F.col("_seg_dup"), "dup_segments")
        .when(F.col("_near_dup"), "near_dup")
        .when(F.col("_sem_dup"), "semantic_dup")
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
    if sem_drops is not None:
        out = out.join(sem_drops.withColumn("_sem_dup", F.lit(True)),
                       id_col, "left")
    else:
        out = out.withColumn("_sem_dup", F.lit(False))
    if media_frac is not None:
        out = out.join(media_frac, id_col, "left").withColumn(
            "dup_media_frac", F.coalesce("dup_media_frac", F.lit(0.0))
        )
        reason = reason.when(
            F.col("dup_media_frac") > max_dup_media_frac, "media_dup"
        )
    return (
        out
        .withColumn("_exact_dup", F.coalesce("_exact_dup", F.lit(False)))
        .withColumn("_seg_dup", F.coalesce("_seg_dup", F.lit(False)))
        .withColumn("_near_dup", F.coalesce("_near_dup", F.lit(False)))
        .withColumn("_sem_dup", F.coalesce("_sem_dup", F.lit(False)))
        .withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
        .drop("_exact_dup", "_seg_dup", "_near_dup", "_sem_dup")
    )
