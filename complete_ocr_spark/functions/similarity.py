"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: JVM-side ``F.aggregate``/``F.zip_with`` fold — no
  Python, no shuffle beyond the final top-k (a single reduce).
* sign-LSH bucketing: group vectors by the sign pattern of their leading
  dimensions — the scale path: candidate pairs only form within a bucket, so
  the O(n^2) compare becomes a per-bucket (equi-join-able) problem. With a
  random-hyperplane matrix this is classic SRP-LSH; the deterministic
  axis-aligned variant keeps the DuckDB oracle exact.
* embedding-cosine near-dup: bucket join + exact cosine verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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


def lsh_bucket_counts(df: DataFrame, vec_col: str, n_bits: int = 8) -> DataFrame:
    """Bucket histogram — the partition-size profile of the ANN scale path."""
    return (
        df.withColumn("bucket", sign_bucket(vec_col, n_bits))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
    )


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                             threshold: float = 0.95, n_bits: int = 8) -> DataFrame:
    """Near-duplicate vector pairs: sign-LSH candidate join + exact cosine."""
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
