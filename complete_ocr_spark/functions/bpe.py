"""Distributed BPE tokenizer training + encoding.

``bpe_train`` learns Sennrich-style byte-pair-encoding merges (the
subword-nmt / GPT-2 tokenizer-training algorithm) as a map-reduce loop:

* ONE corpus scan builds the distinct-word table ``(word, cnt)`` — the only
  pass whose cost grows with corpus size. At 100 TB this is a single
  shuffle on the word; everything after runs over |vocab| rows (10^6-10^8
  distinct words), orders of magnitude smaller than the corpus.
* each merge round is (a) a map-side adjacent-pair explode over the
  word-symbol arrays, (b) one ``groupBy(pair).sum(cnt)``, (c) a driver read
  of exactly ONE row — the argmax pair, count-desc then lexicographic
  (deterministic across engines: UTF-8 byte order == code-point order),
  (d) a map-side ``aggregate`` fold rewriting the symbol arrays
  left-to-right (leftmost-first greedy, the reference semantics).
  The n_merges driver round-trips are inherent to BPE's sequential greedy;
  the per-round data cost is corpus-independent.
* symbol-array lineage is truncated by ``localCheckpoint`` every
  ``checkpoint_every`` rounds so the stacked fold projections stay within
  codegen depth and replay cost stays bounded.

``bpe_encode`` applies the learned merges to text with the canonical
encode: for each merge in RANK ORDER, one greedy left-to-right pass per
word — exactly the training fold's evolution, so training-corpus words
round-trip to their final training segmentation. It runs as an Arrow
``mapInPandas`` kernel with the (tiny: n_merges rows) merge table shipped
in the closure and a per-batch distinct-word memo — embarrassingly
parallel, zero shuffle.

No reference-repo counterpart (the reference is a single-machine OCR
pipeline); this is the tokenizer-training stage of an LLM data pipeline.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

from .dedup import normalized

END = "</w>"  # end-of-word symbol (Sennrich convention, kept separate)


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(w, cnt): the distinct-word table — the one corpus-sized shuffle."""
    return (
        df.select(
            F.explode(F.split(normalized(F.col(text_col)), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    # split("", "(?!^)") keeps a trailing '' in Spark (limit=-1) — filter it
    chars = F.filter(F.split(F.col("w"), "(?!^)"), lambda x: x != F.lit(""))
    return words.withColumn("syms", F.concat(chars, F.array(F.lit(END))))


def _pair_counts(syms_df: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count: map-side explode, one
    groupBy on the pair. slice(_, 1, 0) on single-symbol words is empty."""
    pairs = syms_df.select(
        "cnt",
        F.explode(
            F.expr(
                "transform(slice(syms, 1, size(syms) - 1),"
                " (x, i) -> struct(x AS lhs, element_at(syms, i + 2) AS rhs))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")
    ).agg(F.sum("cnt").alias("pair_count"))


def _apply_merge(syms_df: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """One greedy left-to-right merge pass over every symbol array, as a
    pure-Catalyst fold. After a merge the cursor moves PAST the merged
    token ('aaa' + (a,a) -> [aa, a], leftmost-first), which the fold's
    last-element check gives for free. Words that cannot contain the pair
    skip the fold entirely (array_contains pre-filter stays map-side)."""
    merged = lhs + rhs

    def step(acc, x):
        hit = (F.try_element_at(acc, F.lit(-1)) == F.lit(lhs)) & (
            x == F.lit(rhs)
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    empty = F.array().cast("array<string>")
    folded = F.aggregate("syms", empty, step)
    return syms_df.withColumn(
        "syms",
        F.when(
            F.array_contains("syms", lhs) & F.array_contains("syms", rhs),
            folded,
        ).otherwise(F.col("syms")),
    )


_BPE_LOCAL_MAX_WORDS = 65_536  # bounded driver read (vocab rows, not corpus)


def _train_local(rows, n_merges: int, min_pair_count: int) -> list:
    """Driver-side merge loop over a BOUNDED collected vocab — the
    connected_components fast-path pattern. One round = exact integer
    pair counts + the same (count desc, lhs, rhs) argmax + one greedy
    leftmost-first pass per word holding the pair. Bit-identical to the
    distributed loop by construction: counts are exact ints, Python
    code-point string order == Spark UTF-8 binary order (the caller
    guards out supplementary-plane characters, where Java code-unit
    splitting could differ), and the fold's merge semantics are the same
    leftmost-first single pass. The n_merges sequential argmax rounds are
    inherent to BPE; running them driver-side removes n_merges job
    round-trips over a vocab-sized table — corpus cost is unchanged (the
    one word-count shuffle already happened)."""
    from collections import Counter

    freq = {r["w"]: int(r["cnt"]) for r in rows}
    vocab = {w: tuple(w) + (END,) for w in freq}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        pairs: Counter = Counter()
        for w, c in freq.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        neg_cnt, (lhs, rhs) = min((-c, p) for p, c in pairs.items())
        cnt = -neg_cnt
        if cnt < min_pair_count:
            break
        merges.append((rank, lhs, rhs, cnt))
        for w, s in vocab.items():
            if lhs in s and rhs in s:
                out = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                vocab[w] = tuple(out)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn up to ``n_merges`` BPE merges from ``df[text_col]``.

    Returns (rank, lhs, rhs, pair_count) — rank is the merge order, the
    pair is the argmax under (count desc, lhs asc, rhs asc), pair_count its
    weighted frequency at learn time. Stops early when no pair reaches
    ``min_pair_count``. The result is built on the driver (n_merges rows —
    bounded by the parameter, never by the corpus).

    Small vocabularies take a BOUNDED driver fast path (``_train_local``):
    after the one corpus-sized word-count shuffle, every merge round of
    the distributed loop is [vocab groupBy + 1-row driver read + fold]
    over a |vocab|-row table — when the vocab fits ``_BPE_LOCAL_MAX_WORDS``
    the same greedy loop runs driver-side with zero per-round jobs,
    byte-identical merges (tested against the committed oracle goldens).
    Larger vocabularies fall through to the distributed loop unchanged."""
    spark = df.sparkSession
    words = _initial_symbols(word_counts(df, text_col)).localCheckpoint()
    probe = words.limit(_BPE_LOCAL_MAX_WORDS + 1).collect()
    if len(probe) <= _BPE_LOCAL_MAX_WORDS and all(
        ord(c) <= 0xFFFF for r in probe for c in r["w"]
    ):
        return spark.createDataFrame(
            _train_local(probe, int(n_merges), min_pair_count),
            "rank: bigint, lhs: string, rhs: string, pair_count: bigint",
        )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        top = (
            _pair_counts(words)
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .collect()  # bounded driver read: exactly one row per round
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        lhs, rhs = top[0]["lhs"], top[0]["rhs"]
        merges.append((rank, lhs, rhs, int(top[0]["pair_count"])))
        words = _apply_merge(words, lhs, rhs)
        if (rank + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return spark.createDataFrame(
        merges, "rank: bigint, lhs: string, rhs: string, pair_count: bigint"
    )


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

# Java \s (regexp_replace in normalized()) is the ASCII whitespace class;
# Python's re \s is unicode-wide — spell the Java class out so the kernel
# normalizes byte-identically to the Catalyst side.
_JAVA_WS = " \t\n\x0b\f\r"


def _norm_py(text: str) -> list[str]:
    w = text.strip(_JAVA_WS).lower()
    out, cur = [], []
    for ch in w:
        if ch in _JAVA_WS:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _merge_pass(syms: list[str], lhs: str, rhs: str, merged: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Canonical BPE encode: each learned merge applied once, in rank
    order, as a greedy left-to-right pass — the exact training evolution
    (a lowest-rank-present loop can diverge when two merge paths mint the
    same token string; rank-order application is unambiguous)."""
    syms = list(word) + [END]
    for lhs, rhs in merges:
        if len(syms) == 1:
            break
        syms = _merge_pass(syms, lhs, rhs, lhs + rhs)
    return syms


def bpe_encode(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    merges,
) -> DataFrame:
    """Tokenize ``df[text_col]`` with learned merges.

    ``merges``: the ``bpe_train`` DataFrame or a list of (lhs, rhs) in rank
    order (a DataFrame is collected — n_merges rows, parameter-bounded).
    Returns id_cols + (n_tokens, token_str) where token_str is the
    space-joined token stream (END markers included). Arrow mapInPandas,
    one scan, zero shuffle; per-batch distinct-word memo amortizes the
    merge passes across repeated words.
    """
    if isinstance(merges, DataFrame):
        rows = merges.select("rank", "lhs", "rhs").collect()
        merges = [(r["lhs"], r["rhs"]) for r in sorted(rows, key=lambda r: r["rank"])]
    merges = [(str(l), str(r)) for l, r in merges]

    out_fields = ", ".join(
        f"`{c}` {t}" for c, t in
        [(c, dict(df.dtypes)[c]) for c in id_cols]
    )
    schema = f"{out_fields}, n_tokens bigint, token_str string"

    def run(batches: Iterable) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc(text) -> tuple[int, str]:
            toks: list[str] = []
            if text is not None:
                for w in _norm_py(text):
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = encode_word(w, merges)
                    toks.extend(got)
            return len(toks), " ".join(toks)

        for pdf in batches:
            pairs = [enc(t) for t in pdf[text_col]]
            out = pdf[id_cols].copy()
            out["n_tokens"] = [p[0] for p in pairs]
            out["token_str"] = [p[1] for p in pairs]
            yield out

    return df.select(*id_cols, text_col).mapInPandas(run, schema=schema)
