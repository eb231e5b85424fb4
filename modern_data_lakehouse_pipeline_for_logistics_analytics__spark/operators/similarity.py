"""Similarity search over embedding columns (north-star extension).

Brute-force cosine as the correctness baseline; random-hyperplane LSH
bucketing as the scale path.  All vector math is JVM-side (zip_with /
aggregate in float64) -- Python never touches the hot loop.

Scale notes: brute-force is O(n_queries x corpus) -- fine when the query
set broadcasts (it is broadcast here) and the corpus streams.  The LSH
variant hashes the corpus once (one narrow pass), then only joins within
buckets.  An IVF layout (k-means coarse quantizer) would replace the random
planes with learned centroids; the bucketing/plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    """Float64 dot product of two array columns (JVM fold, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: F.Column, b: F.Column, decimals: int = 6) -> F.Column:
    """Rounded cosine similarity (6dp absorbs fold-order ulps so results
    hash identically across engines)."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), decimals)


def cosine_pairs_above(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup detection).
    Brute force -- the exact-verify stage; feed it LSH candidates at scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    out = pairs.withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
    return out.filter(F.col("cos_sim") >= threshold).select("id_a", "id_b", "cos_sim")


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k neighbors for each query vector.

    ``queries`` (small) is broadcast; the corpus is scanned once, no
    shuffle until the per-query top-k window (keyed by query id).
    Deterministic: ranked on rounded cosine with id tie-break.
    Output: ``query_id, neighbor_id, cos_sim, rank``.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def hyperplane_buckets(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int = 16, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit pattern of dot products
    with ``n_planes`` pseudo-random planes.

    Planes are derived deterministically from xxhash64(plane, component) --
    reproducible across runs/executors with no driver-side state, mapped
    to [-0.5, 0.5).  Output: ``id, bucket``.
    """
    plane_exprs = []
    for p in range(n_planes):
        comps = F.array(
            *[
                (
                    (F.xxhash64(F.lit(p * 131071 + i)) % 1000000) / F.lit(2000000.0)
                ).cast("double")
                for i in range(dim)
            ]
        )
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        plane_exprs.append(F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0))
    bucket = plane_exprs[0]
    for e in plane_exprs[1:]:
        bucket = bucket + e
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k restricted to same-bucket candidates (recall < 1 by
    construction; the scale path when brute force is too wide)."""
    cb = hyperplane_buckets(df, id_col, vec_col, n_planes, dim)
    qb = hyperplane_buckets(queries, id_col, vec_col, n_planes, dim)
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).join(
        cb.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).join(
        qb.withColumnRenamed("id", "query_id"), "query_id"
    )
    scored = (
        c.join(F.broadcast(q), (F.col("query_id") != F.col("neighbor_id"))
               & (c["bucket"] == q["bucket"]))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )
