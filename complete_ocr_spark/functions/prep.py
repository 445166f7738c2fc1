"""Training-data preparation operators: decontamination, sequence packing,
PII redaction, temperature-weighted domain mixing, model-based quality
filtering, DSIR importance resampling.

These are the pipeline stages that sit BETWEEN curation (functions/curate.py)
and the training job itself, and each is built shuffle-aware:

* ``decontaminate``: eval-benchmark n-gram overlap removal (the GPT-3/PaLM
  13-gram decontamination pass, parameterized n). The benchmark side is
  small by construction (eval sets are MBs against a 100 TB corpus), so its
  distinct gram-hash set is BROADCAST; corpus grams are generated map-side
  from an already-distinct per-doc array and die in the broadcast hash join
  unless they hit — the only shuffle is the per-doc hit count over the
  (tiny) contaminated subset.
* ``pack_sequences`` / ``pack_manifest``: concat-and-chop packing of the
  corpus token stream into fixed ``ctx_len`` windows — the classic
  GPT-style "concatenate all docs, chop every ctx tokens" batch layout.
  The global token prefix-sum is computed as a two-level distributed scan:
  per-bucket partial sums (one groupBy on ``floor(id / bucket_span)``),
  exclusive bucket offsets via a window over the BUCKET TABLE (n_docs /
  bucket_span rows — size bucket_span so this fits one task: at 10^12 docs
  and span 10^6 the bucket table is 10^6 narrow rows), then a within-bucket
  window partitioned by bucket. No global single-partition window ever
  touches per-doc rows.
* ``redact_pii`` / ``pii_counts``: email / IPv4 / phone scrubbing as pure
  Catalyst ``regexp_replace`` chains (whole-stage codegen, zero Python).
  Patterns are written in the common Java-regex/RE2 subset so the DuckDB
  oracle computes byte-identical redactions.
* ``temperature_mix``: deterministic domain-balanced sampling (temperature
  reweighting a la multilingual/DoReMi mixing). Per-domain weights use
  INTEGER-exact arithmetic (floor(sqrt(n)*1e6) fixed-point, integer
  quotas, basis-point md5 thresholds) so Spark and the SQL oracle agree
  bit-for-bit — a float pow/sum would be ulp-order-dependent across
  engines. Sampling itself is the md5-threshold idiom from
  q_quality_sample: join-free on the corpus side apart from one broadcast
  of the per-domain rate table (<= n_domains rows).

No reference-repo counterpart exists for any of these (the reference is a
single-machine OCR pipeline); they are the LLM-data-pipeline surfaces the
round briefs call out as first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import normalized
from .text import token_count

# ---------------------------------------------------------------------------
# Decontamination: eval-set n-gram overlap
# ---------------------------------------------------------------------------


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, grams: array<string>) — the doc's DISTINCT word n-grams, built
    map-side (no shuffle): split -> sliding slice -> array_distinct, all
    inside one Catalyst projection. Docs shorter than n words have no grams
    and are dropped.

    The grams are RAW strings, not hashes: decontamination only ever
    compares grams for equality (broadcast join key) and counts distincts,
    so an md5 indirection buys nothing — distinct-raw == distinct-md5, the
    join matches the same pairs, and the per-gram digest was pure overhead
    (~2x on this pass, measured at sf0.1; OPTIMIZATION_r09.md). A raw
    5-gram is also no wider than the 32-char hex it replaced, and the only
    shuffled gram set (the broadcast benchmark side) is eval-set-sized."""
    w = F.split(normalized(F.col(text_col)), " ")
    # the CASE guards evaluation order: sequence(0, size-n) on a doc shorter
    # than n words would DESCEND into negative slice starts even though the
    # filter below drops the row (projection and filter share a codegen
    # stage, and the error fires before the filter wins)
    grams = F.expr(
        f"CASE WHEN size(_w) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size(_w) - {n}), "
        f"i -> array_join(slice(_w, i + 1, {n}), ' '))) "
        f"ELSE array() END"
    )
    return (
        df.select(F.col(id_col).alias("doc"), w.alias("_w"))
        .filter(F.size("_w") >= n)
        .select("doc", grams.alias("grams"))
    )


def benchmark_grams(bench: DataFrame, id_col: str, text_col: str,
                    n: int = 5) -> DataFrame:
    """The DISTINCT gram-hash set of the benchmark/eval corpus — the
    broadcast side of decontamination. Eval sets are tiny relative to the
    training corpus; at 100 TB this is the only state the pass carries."""
    return (
        _gram_hashes(bench, id_col, text_col, n)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )


def decontaminate(docs: DataFrame, bench: DataFrame, id_col: str,
                  text_col: str, n: int = 5, min_hits: int = 1) -> DataFrame:
    """Flag training docs sharing >= min_hits word n-grams with an eval
    benchmark (the decontamination pass every released-model data pipeline
    runs; n=13 in the GPT-3 appendix, parameterized here because the sf
    fixture docs are short).

    Returns (doc_id, n_grams, n_hits, contamination) for contaminated docs:
    n_grams = the doc's distinct gram count (computed map-side BEFORE the
    explode, so no second pass), n_hits = how many of those grams appear in
    the benchmark, contamination = n_hits / n_grams rounded to 6.

    Scale shape: benchmark grams broadcast; corpus side explodes its
    per-doc distinct gram array and inner-joins the broadcast — misses die
    map-side, so the one groupBy shuffle carries only actual hits (at most
    |benchmark grams| x contaminated docs, not corpus-sized)."""
    bg = benchmark_grams(bench, id_col, text_col, n)
    dg = _gram_hashes(docs, id_col, text_col, n)
    exploded = dg.select(
        "doc", F.size("grams").cast("bigint").alias("n_grams"),
        F.explode("grams").alias("g"),
    )
    hits = (
        exploded.join(F.broadcast(bg), "g")
        .groupBy("doc", "n_grams")
        .agg(F.count("*").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )
    return hits.select(
        F.col("doc").alias("doc_id"), "n_grams", "n_hits",
        F.round(F.col("n_hits") / F.col("n_grams"), 6).alias("contamination"),
    )


# ---------------------------------------------------------------------------
# Sequence packing: concat-and-chop into ctx_len windows
# ---------------------------------------------------------------------------


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _order_key(df: DataFrame, id_col: str, order_col: str | None) -> str:
    """The packing order key MUST be an integral column: floor(key /
    bucket_span) on a string id silently casts to NULL buckets and rows
    vanish from the layout (the engine's own docs-out table has string ids
    like 'doc-00000003'). Refuse loudly — callers with string ids pass an
    explicit numeric ``order_col`` (e.g. the digits parsed out of the id,
    or a precomputed dense rank) — the geometry-guard idiom: a wrong
    layout must never be writable."""
    key = order_col or id_col
    dtype = dict(df.dtypes).get(key)
    if dtype not in _INTEGRAL_TYPES:
        raise ValueError(
            f"pack order key {key!r} must be an integral column, got "
            f"{dtype!r} — pass order_col with a numeric key (string ids "
            f"would floor-div to NULL buckets and silently drop rows)"
        )
    return key


def pack_sequences(df: DataFrame, id_col: str, text_col: str,
                   ctx_len: int = 2048, bucket_span: int = 1024,
                   order_col: str | None = None,
                   count_col: str | None = None) -> DataFrame:
    """Assign every non-empty doc its token interval in the concatenated
    corpus stream and the ctx_len packs it lands in.

    Output: (doc_id, n_tokens, tok_start, pack_start, pack_end, n_packs)
    where tok_start is the doc's exclusive token prefix-sum in order-key
    order, pack_start/pack_end = the first/last floor(token/ctx_len) window
    the doc touches. Deterministic: the layout is a pure function of the
    corpus.

    ``order_col``: integral column defining stream order (default: id_col,
    which must itself be integral — enforced loudly, see _order_key).
    ``count_col``: pre-computed per-doc token count to pack by (e.g. the
    BPE ``n_tokens`` bpe_encode emits — the count a training job actually
    consumes); default is the whitespace token_count of text_col.

    The prefix sum is a two-level distributed scan, NOT a global window:
      1. bucket = floor(key / bucket_span); one groupBy gives per-bucket
         token totals (n_buckets rows).
      2. exclusive bucket offsets via a window over that BUCKET table only
         (single task over n_docs/bucket_span narrow rows — pick bucket_span
         so this fits: 10^6 at 10^12 docs; recurse the same construction if
         it ever doesn't).
      3. within-bucket exclusive window PARTITION BY bucket ORDER BY key,
         plus the broadcast bucket offset.
    The result is bucket_span-invariant (property-tested), so the knob is
    purely physical."""
    key = _order_key(df, id_col, order_col)
    counted = (
        F.col(count_col).cast("bigint") if count_col
        else token_count(F.col(text_col)).cast("bigint")
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(key).alias("_key"),
        counted.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    b = toks.withColumn("bucket", F.floor(F.col("_key") / bucket_span))

    totals = b.groupBy("bucket").agg(F.sum("n_tokens").alias("bt"))
    # Window over the bucket table only: <= n_docs/bucket_span rows.
    off_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bt").over(off_w), F.lit(0)).cast("bigint").alias("bucket_off"),
    )

    in_w = (
        Window.partitionBy("bucket").orderBy("_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tok_start = (
        F.col("bucket_off") + F.coalesce(F.sum("n_tokens").over(in_w), F.lit(0))
    ).cast("bigint")
    out = (
        b.join(F.broadcast(offsets), "bucket")
        .withColumn("tok_start", tok_start)
        .withColumn("pack_start", F.floor(F.col("tok_start") / ctx_len).cast("bigint"))
        .withColumn(
            "pack_end",
            F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / ctx_len).cast("bigint"),
        )
    )
    return out.select(
        "doc_id", "n_tokens", "tok_start", "pack_start", "pack_end",
        (F.col("pack_end") - F.col("pack_start") + F.lit(1)).cast("bigint").alias("n_packs"),
    )


def pack_manifest(df: DataFrame, id_col: str, text_col: str,
                  ctx_len: int = 2048, bucket_span: int = 1024,
                  order_col: str | None = None,
                  count_col: str | None = None) -> DataFrame:
    """Per-pack rollup of pack_sequences: (pack_id, n_docs, n_tokens) where
    a doc spanning k packs contributes its per-pack token share to each.
    Integer-exact: tokens_in_pack = min(tok_end, (p+1)*ctx) - max(tok_start,
    p*ctx). The explode fans each doc out to its (usually 1-2) packs, then
    one groupBy on pack_id — all full packs carry exactly ctx_len tokens
    (asserted by the property tests); only the final pack may be short."""
    packed = pack_sequences(df, id_col, text_col, ctx_len, bucket_span,
                            order_col=order_col, count_col=count_col)
    per_pack = packed.select(
        "doc_id", "tok_start",
        (F.col("tok_start") + F.col("n_tokens")).alias("tok_end"),
        F.explode(F.sequence("pack_start", "pack_end")).alias("pack_id"),
    )
    share = (
        F.least(F.col("tok_end"), (F.col("pack_id") + 1) * ctx_len)
        - F.greatest(F.col("tok_start"), F.col("pack_id") * ctx_len)
    )
    return (
        per_pack.groupBy("pack_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(share).cast("bigint").alias("n_tokens"),
        )
    )


def epoch_shuffle(df: DataFrame, id_col: str, n_epochs: int,
                  n_shards: int, seed: str = "ep") -> DataFrame:
    """Deterministic per-epoch training order: every doc gets, for each
    epoch, a (shard, pos) placement drawn from md5(seed:epoch:id) — a
    reproducible pseudo-random permutation per epoch (different across
    epochs, identical across reruns/engines/cluster sizes), the order a
    multi-epoch training job reads packed data in.

    Output: (epoch, shard, pos, doc_id) with pos = the doc's 1-based rank
    inside its (epoch, shard).

    Scale shape: epochs fan out MAP-SIDE (explode of a sequence literal —
    no self-union), the only shuffle is the hash exchange feeding the
    (epoch, shard)-partitioned rank window, and no window ever sees more
    than one shard: pick n_shards so a shard's rows fit a task (10^5-10^6
    shards at 10^12 docs), exactly the bucket_span knob pack_sequences
    documents. There is NO global sort of the corpus anywhere — global
    order is (shard, pos), materialized shard-locally."""
    if int(n_epochs) < 1 or int(n_shards) < 1:
        raise ValueError("n_epochs and n_shards must be >= 1")
    keyed = df.select(F.col(id_col).alias("doc_id")).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_epochs) - 1))
        ).alias("epoch"),
    ).select(
        "epoch", "doc_id",
        F.md5(
            F.concat_ws(":", F.lit(seed), F.col("epoch").cast("string"),
                        F.col("doc_id").cast("string"))
        ).alias("_k"),
    ).select(
        "epoch", "doc_id", "_k",
        (F.conv(F.substring("_k", 1, 8), 16, 10).cast("bigint")
         % int(n_shards)).cast("bigint").alias("shard"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("_k", "doc_id")
    return keyed.select(
        F.col("epoch").cast("bigint").alias("epoch"), "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
        "doc_id",
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the Java-regex/RE2 common subset (no backrefs, no
# lookaround) so Spark and the DuckDB oracle match byte-identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[- ]\d{3}[- ]\d{4}"

_PII = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Replace emails, IPv4 addresses and +cc phone numbers with typed
    placeholders. Email first: an address like u1@ex3.org contains digit
    runs the IP pattern must never see. Pure Catalyst (3 chained
    regexp_replace; zero Python), idempotent (placeholders match no
    pattern)."""
    out = col
    for pat, tag in _PII:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) found in the raw text — the audit signal
    that rides next to the redacted column. Counted on the SAME precedence
    as redact_pii (ips/phones counted after email removal) so counts and
    redactions always reconcile."""
    no_email = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    return (
        F.regexp_count(col, F.lit(EMAIL_RE)).cast("bigint"),
        F.regexp_count(no_email, F.lit(IPV4_RE)).cast("bigint"),
        F.regexp_count(no_email, F.lit(PHONE_RE)).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# Temperature-weighted domain mixing
# ---------------------------------------------------------------------------


def temperature_mix(df: DataFrame, id_col: str, domain_col: str,
                    tau: float = 0.5, target_num: int = 1,
                    target_den: int = 2,
                    annotate: bool = False) -> DataFrame:
    """Deterministic domain-rebalanced sample: keep ~(target_num/target_den)
    of the corpus with per-domain quotas proportional to n_domain^tau — the
    temperature-sampling mix (tau<1 upweights small domains) used for
    multilingual/multi-source training sets.

    tau is restricted to {0.0, 0.5, 1.0} because the weight arithmetic is
    kept INTEGER-exact end-to-end (fixed-point floor(sqrt(n)*1e6) weights,
    integer quota and basis-point thresholds): a float pow + sum would make
    the oracle comparison depend on ulp-level addition order across engines.
    0.5 is the common temperature; 1.0 degenerates to uniform rate (plain
    downsampling); 0.0 to equal per-domain quotas.

    Shape at scale: one groupBy(domain) for counts (n_domains rows), the
    global sums via a window over THAT table, one broadcast join of the
    per-domain rate back onto the corpus, and the md5-basis-point keep
    filter — join-free per row otherwise, no corpus-sized shuffle at all.

    Returns kept rows: (doc_id, domain, rate_bp) with rate_bp the domain's
    keep rate in basis points (audit signal). ``annotate=True`` returns
    EVERY input row with a ``keep`` boolean instead of filtering — the
    audit-trail form composed runners record (a dropped doc's rate is part
    of its verdict)."""
    if tau == 0.5:
        s_s = F.floor(F.sqrt(F.col("n_s")) * 1_000_000).cast("bigint")
    elif tau == 1.0:
        s_s = (F.col("n_s") * F.lit(1_000_000)).cast("bigint")
    elif tau == 0.0:
        s_s = F.lit(1_000_000).cast("bigint")
    else:
        raise ValueError(
            "tau must be one of 0.0, 0.5, 1.0 — other exponents require "
            "float pow, which breaks integer-exact cross-engine parity"
        )
    counts = (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count("*").cast("bigint").alias("n_s"))
        .withColumn("s_s", s_s)
    )
    # Global sums over the DOMAIN table only (<= n_domains rows).
    all_w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = counts.select(
        "domain", "n_s", "s_s",
        F.sum("s_s").over(all_w).cast("bigint").alias("S"),
        F.sum("n_s").over(all_w).cast("bigint").alias("N"),
    )
    # quota q = min(n_s, floor(T * s_s / S)), T = floor(N * num / den);
    # all `div` — Spark's integer division — so the oracle's // agrees
    # exactly. At 10^12 docs promote to DECIMAL(38,0) before the product.
    rates = with_tot.select(
        "domain",
        F.least(
            F.lit(10_000).cast("bigint"),
            F.expr(
                f"(10000 * least(n_s, ((N * {target_num}) div {target_den})"
                f" * s_s div S)) div n_s"
            ),
        ).alias("rate_bp"),
    )
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10_000
    )
    joined = (
        df.select(F.col(id_col).alias("doc_id"), F.col(domain_col).alias("domain"))
        .join(F.broadcast(rates), "domain")
    )
    if annotate:
        return joined.select("doc_id", "domain", "rate_bp",
                             (h < F.col("rate_bp")).alias("keep"))
    return (
        joined.filter(h < F.col("rate_bp"))
        .select("doc_id", "domain", "rate_bp")
    )


def upsample_domains(df: DataFrame, id_col: str, domain_col: str,
                     factors_bp: dict[str, int],
                     default_bp: int = 10_000,
                     annotate: bool = False) -> DataFrame:
    """Per-domain repetition factors — the 'epochs' column of the GPT-3 /
    Llama pretraining mix tables (Wikipedia x3.4, books x1.x, web x<1),
    the UPSAMPLING complement of temperature_mix (whose rates are <= 1).

    ``factors_bp[domain]`` is the repetition factor in basis points
    (25_000 = 2.5 epochs; 5_000 = keep half); unlisted domains get
    ``default_bp``. Each doc emits floor(f) full copies plus one extra iff
    md5('upsample:' || doc_id) mod 10^4 < frac(f) — integer-exact,
    deterministic, and per-doc independent (the same doc decides its
    fractional copy the same way under any partitioning or rerun). The
    hash is SALTED with the operator name: temperature_mix and
    q_quality_sample threshold the UNSALTED md5(doc_id), so without the
    salt a composed pipeline's decisions would be perfectly correlated —
    e.g. after temperature_mix at rate_bp=5000, every survivor in a
    domain with fractional part >= 5000 bp would get the extra copy
    (100% instead of the promised fraction), biasing realized epochs.

    Output (doc_id, domain, copy, factor_bp): copy = 0..n_copies-1 keeps
    downstream shuffles/writes able to treat each repetition as a distinct
    row (e.g. distinct pack positions); factor_bp rides as the audit
    signal like temperature_mix's rate_bp.

    Scale shape: one broadcast join of the <= n_domains-row factor table,
    then a per-row sequence explode — zero corpus-sized shuffle; output
    volume is sum(f_s * n_s), exactly the token budget the mix table
    promises.

    ``annotate=True`` skips the explode and returns one row per INPUT doc:
    (doc_id, domain, n_copies, factor_bp) including n_copies = 0 (a
    downsampled-away doc) — the audit-trail form composed runners record."""
    spark = df.sparkSession
    rows = [(d, int(bp)) for d, bp in sorted(factors_bp.items())]
    if any(bp < 0 for _, bp in rows) or default_bp < 0:
        raise ValueError("repetition factors must be >= 0 basis points")
    ftbl = spark.createDataFrame(rows, "domain: string, factor_bp: bigint") \
        if rows else spark.createDataFrame([], "domain: string, factor_bp: bigint")
    h = (
        F.conv(F.substring(F.md5(F.concat(
            F.lit("upsample:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % 10_000
    )
    base = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.col(domain_col).alias("domain"))
        .join(F.broadcast(ftbl), "domain", "left")
        .withColumn("factor_bp",
                    F.coalesce("factor_bp", F.lit(int(default_bp))))
        .withColumn("_n", F.expr("factor_bp div 10000")
                    + F.when(h < F.col("factor_bp") % 10_000, 1).otherwise(0))
    )
    if annotate:
        return base.select(
            "doc_id", "domain",
            F.col("_n").cast("bigint").alias("n_copies"), "factor_bp",
        )
    return (
        base.filter(F.col("_n") > 0)
        .select(
            "doc_id", "domain",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("copy"),
            "factor_bp",
        )
    )


# ---------------------------------------------------------------------------
# Model-based quality filtering: hashed bag-of-words linear classifier
# ---------------------------------------------------------------------------


def make_hashed_weights(n_buckets: int, seed: str = "qw",
                        scale: int = 1_000_000) -> list[int]:
    """Deterministic stand-in for offline-trained classifier weights:
    ``w[b] = md5(seed + ':' + b)[:8] mod (2*scale+1) - scale`` — a signed
    integer micro-weight in [-scale, scale]. In production these come from a
    fasttext/CCNet-style trained model shipped as an artifact; here both
    engines recompute the identical table from the seed (no external data)."""
    import hashlib

    out = []
    for b in range(n_buckets):
        h = int(hashlib.md5(f"{seed}:{b}".encode()).hexdigest()[:8], 16)
        out.append(h % (2 * scale + 1) - scale)
    return out


def hashed_quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights_micros: list[int],
    bias_micros: int = 0,
    threshold_micros: int = 0,
) -> DataFrame:
    """fasttext/CCNet-shaped model-based quality scoring, ZERO-shuffle.

    Each token hashes into ``len(weights_micros)`` buckets via the repo's
    engine-portable md5 idiom; the doc's score is the integer sum of its
    buckets' micro-weights plus a bias, normalized by token count
    (integer ``div`` so both engines agree bit-for-bit — an i64 sum is
    order-independent where a float dot product is not).

    Scale shape: the weight table rides ONE broadcast row as an
    ``array<bigint>`` (the ann_ivf_bcast trick) — plan size constant in
    vocab size (a 2^20-bucket literal would not compile), the corpus side
    is a pure map (token transform + aggregate fold inside one Catalyst
    projection), and nothing shuffles: at 10^12 docs this is a
    scan-bounded pass like redact_pii.

    Returns (doc_id, n_tokens, score_sum, score_mean_micros, pass) with
    empty/whitespace docs scored NULL and pass=false (no evidence).
    """
    n = len(weights_micros)
    spark = df.sparkSession
    wrow = spark.createDataFrame(
        [(list(int(w) for w in weights_micros),)], "qw: array<bigint>"
    )
    toks = F.split(normalized(F.col(text_col)), " ")
    with_w = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
        .crossJoin(F.broadcast(wrow))
    )
    # bucket(tok) = conv(md5[:8]) % n, then element_at's 1-based lookup
    # (NOT qw[...]: Spark bracket indexing is 0-based and raises on +1
    # overflow at the last bucket)
    contrib = F.expr(
        f"aggregate(transform(_t, t -> element_at(qw, int(conv(substring("
        f"md5(t), 1, 8), 16, 10) % {n}) + 1)), bigint(0), (a, x) -> a + x)"
    )
    scored = with_w.select(
        "doc_id",
        F.when(F.array_join("_t", "") == "", F.lit(0))
        .otherwise(F.size("_t")).cast("bigint").alias("n_tokens"),
        (contrib + F.lit(int(bias_micros))).cast("bigint").alias("_raw"),
    )
    mean = F.expr("_raw div n_tokens")
    return scored.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") > 0, F.col("_raw")).alias("score_sum"),
        F.when(F.col("n_tokens") > 0, mean).alias("score_mean_micros"),
        F.when(
            F.col("n_tokens") > 0, mean >= F.lit(int(threshold_micros))
        ).otherwise(F.lit(False)).alias("pass"),
    )


def quality_margin_col(df: DataFrame, text_col: str,
                       weights_micros: list[int],
                       bias_micros: int = 0,
                       out_col: str = "model_quality_micros") -> DataFrame:
    """hashed_quality_score's margin appended AS A COLUMN (``out_col``),
    keeping every input column — for pipelines that must keep their row
    shape (the curation model gate) without a doc-keyed join back.

    Identical integer contract: margin = (sum of the doc's buckets'
    micro-weights + bias) div n_tokens, NULL on empty/whitespace docs.
    The weight table rides ONE broadcast array<bigint> row; the corpus
    side is a single Catalyst projection — zero shuffle, a narrow map."""
    n = len(weights_micros)
    spark = df.sparkSession
    wrow = spark.createDataFrame(
        [(list(int(w) for w in weights_micros),)], "_qmw: array<bigint>"
    )
    toks = F.split(normalized(F.col(text_col)), " ")
    margin = F.expr(
        f"(aggregate(transform(_qm_t, t -> element_at(_qmw, int(conv("
        f"substring(md5(t), 1, 8), 16, 10) % {n}) + 1)), bigint(0), "
        f"(a, x) -> a + x) + bigint({int(bias_micros)})) div size(_qm_t)"
    )
    return (
        df.crossJoin(F.broadcast(wrow))
        .withColumn("_qm_t", toks)
        .withColumn(
            out_col,
            F.when(F.array_join("_qm_t", "") != "", margin),
        )
        .drop("_qmw", "_qm_t")
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (hashed n-gram LLR)
# ---------------------------------------------------------------------------


def _dsir_feats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, feats: array<string>) — the DSIR hashed n-gram feature stream:
    word unigrams + bigrams, WITH multiplicity (multinomial counts — unlike
    decontamination's distinct-set overlap, every occurrence counts).
    Built map-side in one Catalyst projection; whitespace-only docs are
    dropped (no features, no evidence)."""
    toks = F.split(normalized(F.col(text_col)), " ")
    bigrams = F.expr(
        "CASE WHEN size(_t) >= 2 THEN "
        "transform(sequence(1, size(_t) - 1), "
        "i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1))) "
        "ELSE array() END"
    )
    return (
        df.select(F.col(id_col).alias("doc"), toks.alias("_t"))
        .filter(F.array_join("_t", "") != "")
        .select("doc", F.concat(F.col("_t"), bigrams).alias("feats"))
    )


def _dsir_bucket(col: Column, n_buckets: int) -> Column:
    """The repo's engine-portable md5 bucket idiom on a feature gram."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % n_buckets
    )


def _dsir_bucket_arrays(df: DataFrame, id_col: str, text_col: str,
                        n_buckets: int) -> DataFrame:
    """(doc, bkts: array<bigint>) — each doc's hashed-feature BUCKET ids
    with multiplicity, computed map-side in one projection (the md5 of
    every gram happens exactly here and nowhere else). This is the shared
    featurize pass: bucket counts explode it, scoring folds over it — so a
    select pipeline that needs both (dsir_select) hashes the corpus ONCE
    instead of once per consumer."""
    return _dsir_feats(df, id_col, text_col).select(
        "doc",
        F.transform("feats",
                    lambda g: _dsir_bucket(g, n_buckets)).alias("bkts"),
    )


def dsir_bucket_counts(df: DataFrame, id_col: str, text_col: str,
                       n_buckets: int) -> DataFrame:
    """(b, cnt) — total hashed-feature occurrences per bucket across the
    corpus: the sufficient statistic of DSIR's bag-of-hashed-ngrams
    multinomial. One explode + one groupBy on a bounded key space
    (<= n_buckets distinct values), so the shuffle is map-side-combined
    down to at most n_buckets rows per task — corpus-size-independent."""
    return _bucket_counts_from_arrays(
        _dsir_bucket_arrays(df, id_col, text_col, n_buckets))


def _bucket_counts_from_arrays(bkts_df: DataFrame) -> DataFrame:
    """(b, cnt) from a ``_dsir_bucket_arrays`` frame (same rollup as
    ``dsir_bucket_counts`` — the bucket of each occurrence is identical,
    only where the md5 is evaluated moves)."""
    return (
        bkts_df.select(F.explode("bkts").alias("b"))
        .groupBy("b")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def dsir_weights(raw: DataFrame, target: DataFrame, id_col: str,
                 text_col: str, n_buckets: int = 1024,
                 _raw_buckets: DataFrame | None = None) -> DataFrame:
    """Per-bucket DSIR importance weights — the log-likelihood ratio of the
    target vs raw hashed-ngram multinomials, Laplace-smoothed (DSIR, Xie et
    al. 2023: data selection via importance resampling on hashed n-gram
    features).

    Output, one row per bucket 0..n_buckets-1:
      (bucket, target_count, raw_count,
       w_micros = floor(1e6 * (ln((tc+1)/(T+B)) - ln((rc+1)/(R+B)))))

    The ONLY float arithmetic in the whole DSIR pass happens here, on this
    <= n_buckets-row table, and is immediately quantized to integer micros;
    every corpus-sized computation downstream (per-doc scores, ranking) is
    integer-exact and summation-order-independent. Cross-engine float risk
    is confined and quantifiable: both engines evaluate ln() on exact
    integer-valued doubles, each result correct to ~1 ulp, so the floor can
    only disagree if the true value of 1e6*llr sits within ~1.5e-8 of an
    integer — expected disagreements over a 2^10-bucket table: ~1e-5
    (and deterministic per fixture, so the hash gates pin it).

    Scale shape: two bounded-key groupBys (map-side-combined to n_buckets
    rows each), a join + window over the BUCKET table only (n_buckets rows,
    one task) — nothing corpus-sized shuffles.

    ``_raw_buckets``: optional precomputed ``_dsir_bucket_arrays`` frame
    for the raw side, so a caller that also scores the raw corpus
    (dsir_select) pays the featurize+md5 pass once — identical counts by
    construction."""
    spark = raw.sparkSession
    tc = dsir_bucket_counts(target, id_col, text_col, n_buckets)
    rc = (
        _bucket_counts_from_arrays(_raw_buckets) if _raw_buckets is not None
        else dsir_bucket_counts(raw, id_col, text_col, n_buckets)
    )
    frame = spark.range(n_buckets).select(F.col("id").alias("b"))
    counts = (
        frame.join(tc.withColumnRenamed("cnt", "target_count"), "b", "left")
        .join(rc.withColumnRenamed("cnt", "raw_count"), "b", "left")
        .select(
            "b",
            F.coalesce("target_count", F.lit(0)).cast("bigint").alias("target_count"),
            F.coalesce("raw_count", F.lit(0)).cast("bigint").alias("raw_count"),
        )
    )
    # Totals via a window over the bucket table only (n_buckets rows).
    all_w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = counts.select(
        "b", "target_count", "raw_count",
        F.sum("target_count").over(all_w).alias("T"),
        F.sum("raw_count").over(all_w).alias("R"),
    )
    llr = (
        F.log(F.col("target_count") + 1) - F.log(F.col("T") + n_buckets)
        - F.log(F.col("raw_count") + 1) + F.log(F.col("R") + n_buckets)
    )
    return with_tot.select(
        F.col("b").alias("bucket"), "target_count", "raw_count",
        F.floor(llr * 1_000_000).cast("bigint").alias("w_micros"),
    )


def dsir_score(df: DataFrame, id_col: str, text_col: str,
               weights_micros: list[int]) -> DataFrame:
    """Per-doc DSIR log importance weight, ZERO-shuffle: score_micros =
    sum over the doc's hashed unigram+bigram occurrences of that bucket's
    integer micro-LLR (so exp(score/1e6) ~ p_target(x)/p_raw(x) under the
    hashed multinomials).

    ``weights_micros[b]`` must be dsir_weights' w_micros column ordered by
    bucket — a <= n_buckets driver read, the same bounded-collect class as
    the IVF codebooks. The table rides ONE broadcast array<bigint> row
    (the hashed_quality_score trick: plan size constant in n_buckets); the
    corpus side is a single Catalyst projection (feature transform +
    integer aggregate fold) — at 10^12 docs this is a scan-bounded pass.

    Returns (doc_id, n_feats, score_micros); featureless (whitespace-only)
    docs are dropped — no features, no importance evidence."""
    n = len(weights_micros)
    spark = df.sparkSession
    wrow = spark.createDataFrame(
        [(list(int(w) for w in weights_micros),)], "dw: array<bigint>"
    )
    feats = _dsir_feats(df, id_col, text_col)
    contrib = F.expr(
        f"aggregate(transform(feats, g -> element_at(dw, int(conv(substring("
        f"md5(g), 1, 8), 16, 10) % {n}) + 1)), bigint(0), (a, x) -> a + x)"
    )
    return (
        feats.crossJoin(F.broadcast(wrow))
        .select(
            F.col("doc").alias("doc_id"),
            F.size("feats").cast("bigint").alias("n_feats"),
            contrib.cast("bigint").alias("score_micros"),
        )
    )


def _dsir_score_from_buckets(bkts_df: DataFrame,
                             weights_micros: list[int]) -> DataFrame:
    """``dsir_score`` over a precomputed ``_dsir_bucket_arrays`` frame: the
    per-occurrence weight lookup keys on the already-hashed bucket id, so
    the scoring pass re-hashes nothing. Same integer sum in the same
    multiset — summation-order-independent, bit-identical to dsir_score."""
    spark = bkts_df.sparkSession
    wrow = spark.createDataFrame(
        [(list(int(w) for w in weights_micros),)], "dw: array<bigint>"
    )
    contrib = F.expr(
        "aggregate(transform(bkts, b -> element_at(dw, int(b) + 1)), "
        "bigint(0), (a, x) -> a + x)"
    )
    return (
        bkts_df.crossJoin(F.broadcast(wrow))
        .select(
            F.col("doc").alias("doc_id"),
            F.size("bkts").cast("bigint").alias("n_feats"),
            contrib.cast("bigint").alias("score_micros"),
        )
    )


def dsir_select(raw: DataFrame, target: DataFrame, id_col: str,
                text_col: str, k: int, n_buckets: int = 1024) -> DataFrame:
    """End-to-end DSIR: fit target/raw hashed-ngram multinomials, score
    every raw doc's log importance weight, keep the top k.

    Selection is the DETERMINISTIC top-k by (score desc, doc_id asc) — the
    paper's Gumbel-top-k sampled-without-replacement variant perturbs each
    score with an independent Gumbel draw first; determinism is chosen here
    so both engines and every rerun agree bit-for-bit (plug a seeded
    perturbation into score_micros upstream of the sort to get the sampled
    form). At scale the top-k is a TakeOrderedAndProject (per-partition
    heaps + driver merge of k rows), never a global sort of the corpus.

    The raw corpus feeds BOTH the weight fit (its bucket counts) and the
    scoring pass; the shared ``_dsir_bucket_arrays`` frame is lazily
    localCheckpoint'd so the featurize + per-gram md5 pass — the dominant
    cost of the whole query — runs once, not once per consumer."""
    rb = _dsir_bucket_arrays(raw, id_col, text_col, n_buckets)
    rb = rb.localCheckpoint(eager=False)
    w = dsir_weights(raw, target, id_col, text_col, n_buckets,
                     _raw_buckets=rb)
    wm = [r["w_micros"] for r in
          w.select("bucket", "w_micros").orderBy("bucket").collect()]
    return (
        _dsir_score_from_buckets(rb, wm)
        .orderBy(F.col("score_micros").desc(), F.col("doc_id"))
        .limit(k)
    )


def gumbel_table_micros(tau: float, g_bits: int = 12) -> list[int]:
    """The quantized-Gumbel perturbation table: g[i] = floor(tau *
    -ln(-ln((i + 0.5) / 2^g_bits)) * 1e6) for i in 0..2^g_bits-1.

    The Gumbel-top-k trick (sampling k items without replacement with
    P(i) proportional to exp(s_i / tau) == top-k of s_i + tau * G_i,
    G_i ~ Gumbel(0,1)) needs one float draw PER DOC — which would put
    cross-engine float arithmetic in a corpus-sized expression. Instead
    the draw is QUANTIZED to a 2^g_bits-entry table computed driver-side
    in Python (the dsir_weights confinement trick, applied to the noise):
    each doc indexes the table with a salted md5, so the corpus-side plan
    is integer-exact end-to-end and both engines agree bit-for-bit. 12
    bits of noise resolution is far inside the sampling error of any
    realistic k."""
    import math

    n = 1 << g_bits
    return [
        math.floor(tau * -math.log(-math.log((i + 0.5) / n)) * 1_000_000)
        for i in range(n)
    ]


def dsir_select_sampled(raw: DataFrame, target: DataFrame, id_col: str,
                        text_col: str, k: int, n_buckets: int = 1024,
                        tau: float = 1.0, seed: str = "dsir",
                        g_bits: int = 12) -> DataFrame:
    """DSIR with the paper's Gumbel-top-k SAMPLED-without-replacement
    selection (dsir_select's docstring deferral): every raw doc's integer
    log-importance score is perturbed with a seeded quantized-Gumbel draw
    (gumbel_table_micros) and the top k by perturbed score are kept —
    P(select) proportional to exp(score / tau), yet fully deterministic
    (same seed => same selection on every engine and rerun; a different
    seed permutes equal-score docs differently).

    The hash is salted with 'gumbel:<seed>:' so composed pipelines'
    decisions stay independent of every other md5-threshold operator (the
    upsample_domains lesson). Scale shape = dsir_select's: the noise table
    rides the same broadcast-array row pattern as the weights; selection
    stays a TakeOrderedAndProject.

    Returns (doc_id, n_feats, score_micros, perturbed_micros)."""
    if not 1 <= g_bits <= 20:
        raise ValueError(f"g_bits must be in [1, 20], got {g_bits}")
    rb = _dsir_bucket_arrays(raw, id_col, text_col, n_buckets)
    rb = rb.localCheckpoint(eager=False)  # shared featurize pass, as in dsir_select
    w = dsir_weights(raw, target, id_col, text_col, n_buckets,
                     _raw_buckets=rb)
    wm = [r["w_micros"] for r in
          w.select("bucket", "w_micros").orderBy("bucket").collect()]
    gt = gumbel_table_micros(tau, g_bits)
    spark = raw.sparkSession
    grow = spark.createDataFrame([(gt,)], "gt: array<bigint>")
    idx = (
        F.conv(F.substring(F.md5(F.concat(
            F.lit(f"gumbel:{seed}:"),
            F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % (1 << g_bits)
    )
    return (
        _dsir_score_from_buckets(rb, wm)
        .crossJoin(F.broadcast(grow))
        .withColumn(
            "perturbed_micros",
            (F.col("score_micros")
             + F.element_at("gt", (idx + 1).cast("int"))).cast("bigint"),
        )
        .drop("gt")
        .orderBy(F.col("perturbed_micros").desc(), F.col("doc_id"))
        .limit(k)
    )
