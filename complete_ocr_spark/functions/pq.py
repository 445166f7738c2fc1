"""IVF-PQ: product-quantized in-cell compression for 10^12-vector ANN.

The missing tier the IVF module docstring names (similarity.py): coarse
quantization prunes the SCAN to n_probe/n_cells of the table, but reranking
candidates still fetches full float vectors — at 10^12 x 768 x 4 B that is
3 PB of vector payload. Product quantization stores each vector as M
subspace code ids + its norm, and reranking becomes table lookups against a
query-specific distance table (ADC — asymmetric distance computation,
Jegou et al.'s IVFADC layout): candidates are scored WITHOUT touching the
float vectors, and only the top ``rerank`` survivors fetch true vectors for
an exact top-k verify.

Prototype geometry here: dim 64 -> M=8 subspaces x 8 dims, K=16 codes per
subspace -> 4-bit codes, so a whole vector's PQ payload packs into ONE
BIGINT (8 codes x 4 bits) + a 6-dp norm — 256 B of float vector becomes
~12 B. Codebooks start as seeded deterministic Gaussians (like
ivf_centroids) and are k-means-TRAINED on residual samples
(``pq_train_codebooks`` — per-subspace Lloyd, exact DECIMAL means), and
every distance is rounded to 6 decimals so the DuckDB oracle reproduces the
training, the codes, and the ADC scores bit-for-bit.

Shapes (all engine-portable, no Python in the hot path):
* encode: ONE broadcast row carries centroids + codebooks as DATA (constant
  plan size, the ann_ivf_topk_broadcast argument); residual -> per-subspace
  argmin is an array fold over that row.
* ADC: the query's M x K distance table and per-cell query dots are
  driver-computed (they depend only on the query — tiny) and ride one
  broadcast row as data, so the probe plan is constant in n_cells; scoring
  a candidate is M element_at lookups + an add chain. No shuffle before the
  rerank top-k.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .similarity import (
    SRP_SEED,
    _probe_cells,
    _with_bcast_cell,
    cosine,
    norm,
    pydot,
)

PQ_M = 8   # subspaces
PQ_K = 16  # codes per subspace (4 bits)


def pq_codebooks(dim: int, m: int = PQ_M, k: int = PQ_K,
                 seed: int = SRP_SEED) -> list[list[list[float]]]:
    """books[m][k] = 6-dp-rounded Gaussian codebook entry (dim/m floats),
    scaled to typical residual magnitude. Deterministic, literal-embeddable
    in the SQL oracle."""
    if dim % m:
        raise ValueError(f"dim {dim} must split into {m} equal subspaces")
    rng = np.random.RandomState((seed * 11_000_003) % (2**32))
    sub = dim // m
    return [
        [[round(float(x), 6) for x in rng.standard_normal(sub) * 0.35]
         for _ in range(k)]
        for _ in range(m)
    ]


def adc_table(query_vec: list[float],
              books: list[list[list[float]]]) -> list[list[float]]:
    """dt[m][k] = round(dot(q_m, books[m][k]), 6) — the query-specific lookup
    table ADC scores candidates with (inner-product PQ: approx dot(q, v) =
    dot(q, centroid_cell) + sum_m dt[m][code_m] for residual codes)."""
    sub = len(books[0][0])
    return [
        [round(pydot(query_vec[m * sub:(m + 1) * sub], e), 6) for e in bm]
        for m, bm in enumerate(books)
    ]


def _residuals(df: DataFrame, id_col: str, vec_col: str,
               cents: list[list[float]]) -> DataFrame:
    """(vec_id, v, cell, r): IVF argmax-dot cell assignment and the 6-dp
    residual vector v - centroid_cell. Centroids ride one broadcast row as
    data (plan size constant in n_cells)."""
    spark = df.sparkSession
    assigned = _with_bcast_cell(
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")),
        cents,
    )
    cdf = spark.createDataFrame(
        [([[float(x) for x in c] for c in cents],)],
        "cvecs array<array<double>>",
    )
    cent_v = F.element_at(F.col("cvecs"), F.col("cell"))
    resid = F.zip_with(
        F.col("v"), cent_v, lambda a, b: F.round(a.cast("double") - b, 6)
    )
    return (
        assigned.join(F.broadcast(cdf))
        .select("vec_id", "v", "cell", resid.alias("r"))
    )


def pq_encode(df: DataFrame, id_col: str, vec_col: str,
              cents: list[list[float]],
              books: list[list[list[float]]]) -> DataFrame:
    """(vec_id, cell, codes, vnorm): cell = IVF argmax-dot assignment,
    codes = the M 4-bit residual code ids packed into one BIGINT
    (code of subspace m at bits [4m, 4m+4)), vnorm = round(||v||, 6).

    Code m = argmin over the K codebook entries of the rounded squared L2
    distance to the residual subvector (v - centroid_cell sliced to subspace
    m), lowest code id on ties — the same first-minimum convention every IVF
    path here uses. Centroids and codebooks ride broadcast rows as data."""
    m, k = len(books), len(books[0])
    sub = len(books[0][0])
    if k > 16:
        raise ValueError("codes pack at 4 bits: K must be <= 16")
    spark = df.sparkSession
    bdf = spark.createDataFrame(
        [(books,)], "books array<array<array<double>>>"
    )
    withr = _residuals(df, id_col, vec_col, cents).join(F.broadcast(bdf))
    # ONE generated-SQL expression for the packed code word (the
    # simhash_band_keys rule, round 9): the Column-algebra loop built
    # M x 3 lambda expressions through py4j — ~0.8 s of driver time per
    # call at M=16 — for a tree the SQL parser assembles in one JVM call.
    # Same subexpressions (slice/zip_with/aggregate/round/array_min, the
    # first-minimum tie-break on (d, k)), same bigint packing.
    code_sql = (
        "CAST(array_min(transform(element_at(books, {M1}), (e, i) -> "
        "struct(round(aggregate(zip_with(slice(r, {OFF}, {SUB}), e, "
        "(a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + x), 6) AS d, i AS k))).k AS BIGINT)"
    )
    packed = F.expr(
        " + ".join(
            code_sql.format(M1=mi + 1, OFF=mi * sub + 1, SUB=sub)
            + f" * {2 ** (4 * mi)}"
            for mi in range(m)
        )
    )
    return withr.select(
        "vec_id",
        "cell",
        packed.alias("codes"),
        F.round(norm(F.col("v")), 6).alias("vnorm"),
    )


def pq_train_codebooks(df: DataFrame, id_col: str, vec_col: str,
                       cents: list[list[float]],
                       books0: list[list[list[float]]] | None = None,
                       n_iters: int = 2,
                       sample_fraction: float | None = None) -> DataFrame:
    """Train the PQ codebooks: per-subspace Lloyd k-means over RESIDUAL
    vectors (v - centroid_cell), the step the module docstring deferred to
    deployment (round-4 verdict #1 — untrained Gaussian books are the main
    recall leak in the IVF-PQ tier).

    One grouped k-means trains all M subspaces at once: points are
    (vec_id, m, residual-subvector-m) rows, codebook state is a
    (m, k, ds, coord) table seeded from ``books0`` (default: the seeded
    Gaussians of ``pq_codebooks`` — training REFINES the same deterministic
    seeds the oracle generator starts from). Per iteration: (1) assign each
    (point, m) to the argmin-distance entry of ITS subspace's current
    codebook — books ride one broadcast row, distances are 6-dp rounded,
    ties take the lowest code id (the ``pq_encode`` convention); (2) new
    entry = per-ds mean of its members as exact DECIMAL(28,6) sums (order-
    independent, so a SQL oracle reproduces coordinates bit-for-bit); empty
    entries keep their previous coordinates.

    ``sample_fraction``: deterministic md5-threshold sample of the ids (the
    ``ivf_train_kmeans`` rule) — at 10^12 vectors codebooks train on a
    sample as one pushed-down filter; full-corpus encode happens later.

    Returns the flattened final codebook table
    (m 0-based, k 0-based, ds 1-based, coord, n_members). Like
    ``ivf_train_kmeans`` this is a LAZY chain — no driver collect between
    iterations; collecting the M x K x dim/M result is a bounded read."""
    if books0 is None:
        dim = len(cents[0])
        books0 = pq_codebooks(dim)
    if n_iters < 1:
        raise ValueError(f"pq_train_codebooks needs n_iters >= 1, got {n_iters}")
    m, k = len(books0), len(books0[0])
    sub = len(books0[0][0])
    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    if sample_fraction is not None:
        if not 0 < sample_fraction <= 1:
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        base = base.filter(
            F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            < int(sample_fraction * 2**32)
        )
    pts = (
        _residuals(base, "vec_id", "v", cents)
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("m"),
            F.col("r"),
        )
        .select(
            "vec_id", "m",
            F.slice(F.col("r"), F.col("m") * sub + 1, F.lit(sub)).alias("rsub"),
        )
        .localCheckpoint(eager=False)  # shared by every iteration's two uses
    )
    bk = spark.createDataFrame(
        [
            (mi, ki, ds + 1, float(c))
            for mi, bm in enumerate(books0)
            for ki, entry in enumerate(bm)
            for ds, c in enumerate(entry)
        ],
        "m int, k int, ds int, coord double",
    )
    out = None
    for _ in range(n_iters):
        barr = (
            bk.groupBy("m", "k")
            .agg(F.array_sort(F.collect_list(F.struct("ds", "coord"))).alias("s"))
            .select("m", "k", F.transform("s", lambda x: x["coord"]).alias("e"))
            .groupBy("m")
            .agg(F.array_sort(F.collect_list(F.struct("k", "e"))).alias("s"))
            .select("m", F.transform("s", lambda x: x["e"]).alias("bm"))
            .groupBy()
            .agg(F.array_sort(F.collect_list(F.struct("m", "bm"))).alias("s"))
            .select(F.transform("s", lambda x: x["bm"]).alias("books"))
        )
        dists = F.transform(
            F.element_at(F.col("books"), F.col("m") + 1),
            lambda e, i: F.struct(
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("rsub"), e, lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    6,
                ).alias("d"),
                i.alias("k"),
            ),
        )
        assigned = (
            pts.join(F.broadcast(barr))
            .withColumn("k", F.array_min(dists)["k"].cast("int"))
            .select("m", "k", "rsub")
        )
        ex = assigned.select(
            "m", "k", F.posexplode("rsub").alias("pos", "rv")
        ).select("m", "k", (F.col("pos") + 1).alias("ds"), "rv")
        sums = ex.groupBy("m", "k", "ds").agg(
            F.round(
                F.sum(F.col("rv").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("new_coord"),
            F.count("*").alias("n_members"),
        )
        out = bk.join(sums, ["m", "k", "ds"], "left").select(
            "m", "k", "ds",
            F.coalesce("new_coord", "coord").alias("coord"),
            F.coalesce("n_members", F.lit(0)).alias("n_members"),
        )
        # lazy localCheckpoint truncates the per-iteration plan doubling
        # (the ivf_train_kmeans argument)
        bk = out.select("m", "k", "ds", "coord").localCheckpoint(eager=False)
    return out


def collect_books(trained: DataFrame,
                  books0: list[list[list[float]]]) -> list[list[list[float]]]:
    """Bounded driver read of a trained codebook table (M x K x dim/M rows —
    small by definition) back into the nested-list form every PQ entry point
    takes; ``books0`` supplies the geometry."""
    books = [[[0.0] * len(books0[0][0]) for _ in bm] for bm in books0]
    for r in trained.collect():
        books[r["m"]][r["k"]][r["ds"] - 1] = r["coord"]
    return books


def write_ivf_pq_index(df: DataFrame, id_col: str, vec_col: str,
                       cents: list[list[float]],
                       books: list[list[list[float]]], path: str) -> None:
    """The full IVFADC layout at rest: (vec_id, codes, vnorm, v) partitioned
    BY CELL. A probe partition-prunes to n_probe/n_cells of the table, scores
    the pruned rows from codes+norm alone (ReadSchema stays narrow — the
    float vector column is never materialized for ADC), and only the rerank
    survivors' vectors are read for the exact verify. One encode pass, one
    partitioned write."""
    enc = pq_encode(df, id_col, vec_col, cents, books)
    vecs = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    (
        enc.join(vecs, "vec_id")
        .repartition(len(cents), "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ann_ivf_pq_topk_from_index(spark, path: str, query_vec: list[float],
                               cents: list[list[float]],
                               books: list[list[list[float]]],
                               n_probe: int = 4, rerank: int = 30,
                               k: int = 10) -> DataFrame:
    """IVF-PQ probe against the written index: cell pruning happens at the
    parquet partition level, ADC scoring reads only (vec_id, codes, vnorm),
    and the exact verify fetches ``v`` for the rerank survivors alone.
    Identical rows to ``ann_ivf_pq_topk`` over the same data."""
    idx = spark.read.parquet(path)
    enc = idx.select("vec_id", F.col("cell").cast("int").alias("cell"),
                     "codes", "vnorm")
    return ann_ivf_pq_topk(
        idx.select("vec_id", "v"), "vec_id", "v", query_vec, cents, books,
        n_probe=n_probe, rerank=rerank, k=k, encoded=enc,
    )


def ann_ivf_pq_topk(df: DataFrame, id_col: str, vec_col: str,
                    query_vec: list[float], cents: list[list[float]],
                    books: list[list[list[float]]], n_probe: int = 4,
                    rerank: int = 30, k: int = 10,
                    encoded: DataFrame | None = None) -> DataFrame:
    """IVF-PQ ANN: probe n_probe cells, ADC-score candidates from codes alone
    (no vector fetch), keep the top ``rerank`` by approximate cosine, then
    exact-verify ONLY those against true vectors for the final top-k.

    Returns (vec_id, cell, adc_cos, cos) — the approximate score that ranked
    the candidate and the exact one that confirmed it. ``encoded`` reuses a
    pre-built code table (at rest: partition by cell, as write_ivf_index
    does for vectors); by default codes are built in-query."""
    probe_cells = _probe_cells(query_vec, cents, n_probe)
    dt = adc_table(query_vec, books)
    qc = [round(pydot(query_vec, c), 6) for c in cents]
    qnorm = round(math.sqrt(pydot(query_vec, query_vec)), 6)
    if qnorm == 0:
        raise ValueError("query vector has zero norm — cosine is undefined")
    enc = encoded if encoded is not None else pq_encode(
        df, id_col, vec_col, cents, books
    )
    # a zero-norm vector has no cosine direction; without this guard the
    # adc_cos division yields Inf/NaN, polluting the rerank top-N and
    # diverging from the oracle (engines order NaN differently)
    cand = enc.filter(F.col("cell").isin(probe_cells) & (F.col("vnorm") != 0))
    # the query's per-cell dots and M x K lookup table ride ONE broadcast row
    # as DATA — embedding them as literals would grow the plan linearly in
    # n_cells (the same argument as ann_ivf_topk_broadcast / pq_encode);
    # the ADC itself stays code-shifts + array lookups with zero shuffle
    qdf = df.sparkSession.createDataFrame(
        [(qc, dt)], "qdots array<double>, qdt array<array<double>>"
    )
    cand = cand.join(F.broadcast(qdf))
    # one generated-SQL ADC fold (the pq_encode / simhash_band_keys rule):
    # identical shift+mask+lookup terms, assembled in a single JVM call
    adc = F.expr(
        "element_at(qdots, cell)"
        + "".join(
            f" + element_at(element_at(qdt, {mi + 1}), "
            f"CAST((shiftright(codes, {4 * mi}) & 15) + 1 AS INT))"
            for mi in range(len(dt))
        )
    )
    ranked = (
        cand.withColumn(
            "adc_cos",
            F.round(F.round(adc, 6) / (F.lit(qnorm) * F.col("vnorm")), 6),
        )
        .select("vec_id", "cell", "codes", "vnorm", "adc_cos")
        .orderBy(F.col("adc_cos").desc(), "vec_id")
        .limit(rerank)
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    vecs = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    return (
        ranked.join(vecs, "vec_id")
        .select(
            "vec_id", "cell", "adc_cos",
            F.round(cosine(F.col("v"), q), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id"))
        .limit(k)
    )
