"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: JVM-side ``F.aggregate``/``F.zip_with`` fold — no
  Python, no shuffle beyond the final top-k (a single reduce).
* sign-LSH bucketing: group vectors by a sign pattern — the scale path:
  candidate pairs only form within a bucket, so the O(n^2) compare becomes a
  per-bucket (equi-join-able) problem. Two variants:
  - axis-aligned (``sign_bucket``): signs of the leading dimensions —
    deterministic, trivially oracle-checkable, fixed at <= 2^n_bits buckets;
  - random-hyperplane SRP (``srp_bucket``): signs of dot products against
    seeded Gaussian hyperplanes — the production form; bits and table count
    are free parameters, and the hyperplanes are literal arrays so the
    DuckDB oracle computes identical buckets.
* embedding-cosine near-dup: bucket join (single- or multi-table) + exact
  cosine verify.

Sizing at scale (the recall/size trade, SURVEY.md §8): with b bits the
expected bucket population is n/2^b, and the within-bucket pair join costs
~n^2/2^b — so b must GROW with n: b = ceil(log2(n / target_bucket)) keeps
per-bucket work constant (``suggest_bits``). A pair at angle theta collides
in one b-bit table with probability (1 - theta/pi)^b, so recall for
near-dups (theta -> 0) stays ~1 while random pairs vanish; multiple
independent tables push recall 1 - (1 - p)^T at linear cost in T. The
axis-aligned variant is kept for hash-exact small-scale oracles; SRP is the
one to deploy.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

SRP_SEED = 1234


def suggest_bits(n_rows: int, target_bucket: int = 64) -> int:
    """Bits that keep the expected bucket population ~= target_bucket."""
    return max(8, math.ceil(math.log2(max(n_rows, 1) / target_bucket)))


def srp_hyperplanes(dim: int, n_bits: int, table: int = 0,
                    seed: int = SRP_SEED) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes, rounded to 6 decimals so the SQL
    oracle embeds bit-identical literals."""
    rng = np.random.RandomState(seed * 1_000_003 + table)
    return [[round(float(c), 6) for c in row]
            for row in rng.standard_normal((n_bits, dim))]


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(df: DataFrame, id_col: str, vec_col: str, query_vec: list[float],
                k: int = 10) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector (the exact
    baseline an ANN index is measured against)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col(vec_col), q), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def sign_bucket(vec_col: str, n_bits: int = 8):
    """Sign pattern of the first n_bits dimensions as a bigint bucket key."""
    out = F.lit(0)
    for j in range(n_bits):
        out = out + F.when(F.element_at(F.col(vec_col), j + 1) >= 0, 2**j).otherwise(0)
    return out.cast("bigint")


def srp_bucket(vec_col: str, planes: list[list[float]]):
    """SRP-LSH bucket: bit j = sign of dot(vec, hyperplane_j).

    The dot is rounded to 6 decimals before the sign test (as ``ivf_cell``
    does) so a product within one ulp of zero cannot flip a bit on one engine
    but not the other — the SQL oracle rounds identically."""
    out = F.lit(0)
    for j, h in enumerate(planes):
        hl = F.array(*[F.lit(float(c)) for c in h])
        out = out + F.when(F.round(dot(F.col(vec_col), hl), 6) >= 0, 2**j).otherwise(0)
    return out.cast("bigint")


def lsh_bucket_counts(df: DataFrame, vec_col: str, n_bits: int = 8) -> DataFrame:
    """Bucket histogram — the partition-size profile of the ANN scale path."""
    return (
        df.withColumn("bucket", sign_bucket(vec_col, n_bits))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def ivf_centroids(dim: int, n_cells: int, seed: int = SRP_SEED) -> list[list[float]]:
    """Deterministic coarse-quantizer centroids: seeded Gaussian directions,
    L2-normalized, rounded to 6 decimals (literal-embeddable in the SQL
    oracle). A production deployment would train these with k-means over a
    sample; the assignment/probe/rerank plan is identical."""
    rng = np.random.RandomState((seed * 7_000_003) % (2**32))
    c = rng.standard_normal((n_cells, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return [[round(float(x), 6) for x in row] for row in c]


def ivf_cell(vec_col: str, cents: list[list[float]]):
    """Cell id (1-based) = argmax over centroids of round(dot(v, c), 6).

    The rounding makes the argmax engine-portable: Spark's sequential
    ``aggregate`` fold and an oracle's unordered SUM can differ in the last
    ulp, but not at 1e-6 — both engines then pick the same first maximum."""
    dots = F.array(
        *[
            F.round(dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c])), 6)
            for c in cents
        ]
    )
    return F.array_position(dots, F.array_max(dots)).cast("int")


def pydot(a, b) -> float:
    """Driver-side sequential dot product — the parity-critical python twin
    of the Catalyst ``dot`` fold (always 6-dp-round its result before any
    cross-engine comparison). Shared by every place that pre-computes
    query-side literals (_probe_cells, pq.adc_table)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _probe_cells(query_vec: list[float], cents: list[list[float]],
                 n_probe: int) -> list[int]:
    """The query's n_probe nearest cells, 1-based (like array_position), with
    the rounded-dot / lowest-cell tie-break both IVF paths and the SQL oracle
    share — parity-critical, so it lives in exactly one place."""
    order = sorted(
        range(len(cents)), key=lambda j: (-round(pydot(query_vec, cents[j]), 6), j)
    )
    return [j + 1 for j in order[:n_probe]]


def ann_ivf_topk(df: DataFrame, id_col: str, vec_col: str,
                 query_vec: list[float], cents: list[list[float]],
                 n_probe: int = 4, k: int = 10) -> DataFrame:
    """IVF ANN: assign rows to coarse cells, scan only the query's n_probe
    nearest cells, exact cosine rerank. At 10^12 vectors the cell id is a
    partition column: probing reads n_probe/n_cells of the table via
    partition pruning instead of a full scan; cells are independent so the
    assignment is one narrow map and the rerank shuffles only candidates."""
    probe_cells = _probe_cells(query_vec, cents, n_probe)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        df.withColumn("cell", ivf_cell(vec_col, cents))
        .filter(F.col("cell").isin(probe_cells))
        .select(
            F.col(id_col).alias("vec_id"),
            "cell",
            F.round(cosine(F.col(vec_col), q), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_ivf_topk_broadcast(df: DataFrame, id_col: str, vec_col: str,
                           query_vec: list[float], cents: list[list[float]],
                           n_probe: int = 4, k: int = 10) -> DataFrame:
    """Scale-safe IVF ANN: centroids as DATA, not plan literals.

    ``ann_ivf_topk`` embeds every centroid coefficient as an ``F.lit`` — fine
    as the sf oracle anchor, but at a real IVF (4k-65k cells x 768 dims) the
    expression tree is millions of nodes and plan compilation dies before any
    data is read. Here the centroid table is a small DataFrame collapsed to
    ONE row holding array<struct<cell,cvec>> and broadcast cross-joined onto
    every vector row (BroadcastNestedLoopJoin of a 1-row side — no row
    multiplication, no shuffle). Cell assignment is then an array fold over
    that DATA column: argmax via array_max of struct(dot, -cell), which
    reproduces ``ivf_cell``'s first-maximum tie-break (lowest cell wins). The
    plan node count is CONSTANT in the number of centroids.

    Against the row-explosion alternative (broadcast equi-join to n x C rows
    + min_by/window argmax): that plan re-shuffles n rows on id for the
    group-back; this one never leaves the scan stage. Bound: the single
    broadcast row holds C x dim doubles (4k x 768 = 25 MB — within default
    broadcast limits; a 65k-cell deployment shards the fold or pre-assigns
    cells at write time and partition-prunes, per the module docstring).

    Same probe/rerank semantics as ``ann_ivf_topk``: rounded dots keep the
    assignment engine-portable; returns identical rows."""
    probe_cells = _probe_cells(query_vec, cents, n_probe)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    assigned = _with_bcast_cell(
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")), cents
    )
    return (
        assigned.filter(F.col("cell").isin(probe_cells))
        .select(
            "vec_id", "cell", F.round(cosine(F.col("v"), q), 6).alias("cos")
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def _cents_one_row(spark, cents: list[list[float]]) -> DataFrame:
    """The centroid table collapsed to ONE broadcastable row holding
    array<struct<cell, cvec>> — centroids as data, constant plan size."""
    cdf = spark.createDataFrame(
        [(j + 1, [float(x) for x in c]) for j, c in enumerate(cents)],
        "cell int, cvec array<double>",
    )
    return cdf.select(
        F.array_sort(F.collect_list(F.struct("cell", "cvec"))).alias("cents")
    )


def _with_bcast_cell(df_v: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Append ``cell`` = argmax-rounded-dot assignment to (…, v) rows via the
    broadcast 1-row centroid array (the ``ann_ivf_topk_broadcast`` shape:
    constant plan size, no shuffle, lowest-cell tie-break)."""
    carr = _cents_one_row(df_v.sparkSession, cents)
    best = F.array_max(
        F.transform(
            "cents",
            lambda c: F.struct(
                F.round(dot(F.col("v"), c["cvec"]), 6).alias("d"),
                (-c["cell"]).alias("negcell"),
            ),
        )
    )
    return (
        df_v.join(F.broadcast(carr))
        .withColumn("cell", (-best["negcell"]).cast("int"))
        .drop("cents")
    )


def ivf_assign_cells(df: DataFrame, id_col: str, vec_col: str,
                     cents: list[list[float]]) -> DataFrame:
    """(vec_id, v, cell) assignment rows — the materialization the IVF module
    docstring defers to write time. Same engine-portable argmax as every IVF
    path here."""
    return _with_bcast_cell(
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")), cents
    )


def write_ivf_index(df: DataFrame, id_col: str, vec_col: str,
                    cents: list[list[float]], path: str) -> None:
    """Write the IVF index at rest: vectors partitioned BY CELL, so a probe
    reads n_probe/n_cells of the table via partition pruning instead of
    assigning cells per query (the 10^12-vector layout the
    ``ann_ivf_topk`` docstring promises). One pass, one hash write."""
    (
        ivf_assign_cells(df, id_col, vec_col, cents)
        .repartition(len(cents), "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ann_ivf_topk_from_index(spark, path: str, query_vec: list[float],
                            cents: list[list[float]], n_probe: int = 4,
                            k: int = 10) -> DataFrame:
    """IVF probe against the written index: the cell filter is a PARTITION
    filter on the parquet layout — the scan never opens non-probed cells
    (plan-tested), which is the read shape that survives 10^12 vectors.
    Identical rows to ``ann_ivf_topk_broadcast`` over the same data."""
    probe_cells = _probe_cells(query_vec, cents, n_probe)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probe_cells))
        .select(
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            F.round(cosine(F.col("v"), q), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_train_kmeans(df: DataFrame, id_col: str, vec_col: str,
                     cents0: list[list[float]], n_iters: int = 2,
                     agg_mode: str = "perdim",
                     sample_fraction: float | None = None) -> DataFrame:
    """Train the IVF coarse quantizer: Lloyd k-means iterations as a LAZY
    DataFrame chain (no driver collect between iterations).

    Per iteration: (1) assign each vector to its argmax-dot cell against the
    CURRENT centroid table — centroids stay data (the broadcast 1-row array
    of ``ann_ivf_topk_broadcast``), so plan size is constant in n_cells;
    (2) new centroid = per-dimension mean of its members, empty cells keep
    their previous centroid.

    Engine-portable arithmetic (so a SQL oracle reproduces it bit-for-bit):
    dots are rounded to 6 decimals before the argmax (as ``ivf_cell``);
    member coordinates are rounded to 6 decimals and summed as
    DECIMAL(28,6) — exact and order-independent, unlike a float sum — then
    divided and re-rounded, so the means cannot drift between engines.

    Returns the flattened final centroid table (cell, dim, coord, n_members)
    with dim 1-based and n_members from the assignment that produced the
    final means.

    ``sample_fraction``: train on a DETERMINISTIC md5-threshold sample of the
    ids (the q_quality_sample rule: first 8 md5 hex digits of the id, as an
    integer, under fraction * 2^32) — the "at 10^12 vectors you train on a
    sample" story as one pushed-down filter, reproducible by any engine (the
    k-means SQL oracle generator takes the same fraction). Lloyd quality
    needs only a representative sample; assignment of the FULL corpus happens
    at write time (``write_ivf_index``), never during training.

    ``agg_mode`` picks the mean-aggregation shape — BOTH produce bit-identical
    centroids (the same exact fixed-point sums; pinned by test + the shared
    DuckDB oracle):

    * ``"perdim"``: posexplode to n x dim narrow rows, DECIMAL(28,6) sums via
      groupBy(cell, dim). Catalyst partial-aggregates map-side, so the
      shuffle is small; the cost is materializing and hash-aggregating
      n x dim generator rows in the JVM. This is the oracle-anchor form (its
      SQL transcription IS the DuckDB oracle).
    * ``"vector"``: coordinates scale to 10^6-fixed-point int64 arrays
      JVM-side (DECIMAL HALF_UP rounding, so numpy never rounds), an Arrow
      kernel (kernels.kmeans) collapses each batch to one partial sum per
      cell, and a zip_with fold combines the bounded partial list — dim x
      fewer aggregation input rows per Lloyd iteration. A/B-measured in
      BASELINE.md §kmeans agg A/B."""
    if n_iters < 1:
        # the SQL oracle generator (_kmeans_sql) also assumes >= 1 iteration;
        # returning the seeded table here would silently skip training
        raise ValueError(f"ivf_train_kmeans needs n_iters >= 1, got {n_iters}")
    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    if sample_fraction is not None:
        if not 0 < sample_fraction <= 1:
            raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
        base = base.filter(
            F.conv(F.substring(F.md5(F.col("vid").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            < int(sample_fraction * 2**32)
        )
    cents = spark.createDataFrame(
        [
            (j + 1, d + 1, float(c))
            for j, vec in enumerate(cents0)
            for d, c in enumerate(vec)
        ],
        "cell int, dim int, coord double",
    )
    out = None
    for _ in range(n_iters):
        carr = (
            cents.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "coord"))).alias("s"))
            .select("cell", F.transform("s", lambda x: x["coord"]).alias("cvec"))
        )
        one = carr.groupBy().agg(
            F.array_sort(F.collect_list(F.struct("cell", "cvec"))).alias("cents")
        )
        best = F.array_max(
            F.transform(
                "cents",
                lambda c: F.struct(
                    F.round(dot(F.col("v"), c["cvec"]), 6).alias("d"),
                    (-c["cell"]).alias("negcell"),
                ),
            )
        )
        assigned = (
            base.join(F.broadcast(one))
            .withColumn("cell", (-best["negcell"]).cast("int"))
            .select("vid", "v", "cell")
        )
        if agg_mode == "vector":
            from ..kernels.kmeans import partial_cell_sums_batch

            dim_n = len(cents0[0])
            scaled = assigned.select(
                "cell",
                F.transform(
                    "v",
                    lambda x: (
                        F.round(x.cast("double"), 6).cast("decimal(28,6)")
                        * 1000000
                    ).cast("long"),
                ).alias("sv"),
            )
            partials = scaled.mapInPandas(
                partial_cell_sums_batch,
                schema="cell int, psum array<bigint>, pcnt bigint",
            )
            zero = F.array_repeat(F.lit(0).cast("bigint"), dim_n)
            combined = partials.groupBy("cell").agg(
                F.aggregate(
                    F.collect_list("psum"), zero,
                    lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
                ).alias("ssum"),
                F.sum("pcnt").alias("n_members"),
            )
            # double(int64 s)/count reproduces the oracle's CAST(SUM(decimal)
            # AS DOUBLE)/COUNT only while |s| < 2^53; the decimal route is
            # exact at any magnitude, and it's k x dim rows — free
            sums = combined.select(
                "cell", "n_members", F.posexplode("ssum").alias("pos", "s")
            ).select(
                "cell",
                (F.col("pos") + 1).alias("dim"),
                F.round(
                    (F.col("s").cast("decimal(38,12)") / F.lit(1000000))
                    .cast("double")
                    / F.col("n_members"),
                    6,
                ).alias("new_coord"),
                "n_members",
            )
        else:
            ex = assigned.select(
                "cell", F.posexplode("v").alias("pos", "raw")
            ).select(
                "cell",
                (F.col("pos") + 1).alias("dim"),
                F.round(F.col("raw").cast("double"), 6).alias("mcoord"),
            )
            sums = ex.groupBy("cell", "dim").agg(
                F.round(
                    F.sum(F.col("mcoord").cast("decimal(28,6)")).cast("double")
                    / F.count("*"),
                    6,
                ).alias("new_coord"),
                F.count("*").alias("n_members"),
            )
        out = (
            cents.join(sums, ["cell", "dim"], "left")
            .select(
                "cell", "dim",
                F.coalesce("new_coord", "coord").alias("coord"),
                F.coalesce("n_members", F.lit(0)).alias("n_members"),
            )
        )
        # each iteration references `cents` twice (inside sums' assignment
        # subtree AND as the grid-join left side), doubling the plan per
        # iteration; a LAZY localCheckpoint truncates that growth at first
        # materialization without an extra job, keeping n_iters a safe knob
        cents = out.select("cell", "dim", "coord").localCheckpoint(eager=False)
    return out


def embedding_near_dup_srp(df: DataFrame, id_col: str, vec_col: str, dim: int,
                           threshold: float = 0.3, n_bits: int = 10,
                           n_tables: int = 2, seed: int = SRP_SEED,
                           impl: str = "pandas") -> DataFrame:
    """Scale-form near-dup: multi-table SRP-LSH candidates + exact cosine.

    Each table t buckets by ``srp_bucket`` with its own hyperplanes; a pair is
    a candidate if it collides in ANY table (recall 1 - (1-p)^T for per-table
    collision probability p = (1 - theta/pi)^n_bits); candidates are
    deduplicated across tables before the exact verify. ``n_bits`` should be
    ``suggest_bits(n)`` at deployment — per-bucket pair work stays ~constant
    as n grows, unlike the fixed-width axis variant.

    Join shape: all T buckets are computed in ONE scan per side (posexplode
    to (table, bucket) rows) and candidates come from a single self-equi-join
    on that composite key — T separate self-joins would scan the table 2T
    times. The exploded rows carry ONLY (vid, tbl, bucket): shuffling the
    vectors through the candidate join would move T x dim doubles per side
    per row (and re-move them for every multi-table duplicate candidate);
    instead candidates are deduplicated as bare id pairs and the two vectors
    are joined back ONCE per surviving pair. At scale the candidate set is
    tiny relative to n, so AQE turns those fetch joins into broadcasts and
    the vector payload never shuffles at all.

    ``impl="pandas"`` (default) computes the T x b bucket bits as numpy
    matmuls (kernels.srp; measured 2.6x over the per-bit Catalyst folds at
    sf0.1, interleaved best-of-3, identical output rows — BASELINE.md §SRP
    bucket kernel); ``impl="catalyst"`` keeps the fold form, whose SQL
    transcription is the DuckDB oracle.
    """
    planes = [srp_hyperplanes(dim, n_bits, table=t, seed=seed)
              for t in range(n_tables)]
    if impl == "pandas":
        # vectorized matmul kernel (kernels.srp) — bit-compatible with the
        # Catalyst folds (see the kernel's parity contract); A/B-measured in
        # BASELINE.md §SRP bucket kernel
        from ..kernels.srp import make_srp_buckets_batch

        id_type = df.schema[id_col].dataType.simpleString()
        b = df.select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
        ).mapInPandas(
            make_srp_buckets_batch(planes),
            schema=f"vid {id_type}, tbl int, bucket bigint",
        )
    else:
        all_buckets = F.array(
            *[srp_bucket(vec_col, p) for p in planes]
        )
        b = df.select(
            F.col(id_col).alias("vid"),
            F.posexplode(all_buckets).alias("tbl", "bucket"),
        )
    # the bucket frame feeds BOTH self-join sides; without a barrier the
    # bucket computation (and the whole input subtree under it — in the
    # curation tier that subtree is every earlier gate/dedup stage) runs
    # twice, since Spark reuses no exchanges across MapInPandas subtrees.
    # A lazy localCheckpoint materializes the (vid, tbl, bucket) rows once.
    b = b.localCheckpoint(eager=False)
    x, y = b.alias("x"), b.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vid") < F.col("y.vid")),
        )
        .select(F.col("x.vid").alias("id1"), F.col("y.vid").alias("id2"))
        .distinct()
    )
    # same argument for the two vector fetch sides of the verify join; the
    # L2 norm is computed PER VECTOR here (n fold evaluations) instead of
    # per candidate pair (2 x |pairs| — pairs >> vectors under LSH): the
    # norm fold is the identical expression over the identical array, and
    # the cosine below multiplies the same two doubles the inline form
    # would, so the rounded value is bit-identical
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("_nrm"),
    ).localCheckpoint(eager=False)
    v1 = base.select(F.col("vid").alias("id1"), F.col("v").alias("v1"),
                     F.col("_nrm").alias("_n1"))
    v2 = base.select(F.col("vid").alias("id2"), F.col("v").alias("v2"),
                     F.col("_nrm").alias("_n2"))
    return (
        cands.join(v1, "id1").join(v2, "id2")
        .select(
            "id1", "id2",
            F.round(
                dot(F.col("v1"), F.col("v2")) / (F.col("_n1") * F.col("_n2")),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                             threshold: float = 0.95, n_bits: int = 8) -> DataFrame:
    """Near-duplicate vector pairs: sign-LSH candidate join + exact cosine.

    Axis-aligned buckets — the hash-exact oracle form; at deployment scale
    prefer ``embedding_near_dup_srp`` with ``suggest_bits(n)`` (fixed 2^8
    buckets make the within-bucket join O(n^2/256), quadratic again)."""
    b = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    pairs = x.join(
        y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.vid") < F.col("y.vid"))
    )
    return (
        pairs.select(
            F.col("x.vid").alias("id1"),
            F.col("y.vid").alias("id2"),
            F.round(cosine(F.col("x.v"), F.col("y.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
