"""Round-9 widening: exact fixed-point k-means, weighted shortest
paths, count-min sketch frequency estimation, tokenizer-vocabulary OOV
audit, compaction bin planning, Fellegi-Sunter linkage scoring.

Each query follows the portable-oracle recipe (BIGINT arithmetic or the
floor half-up formula at every engine boundary) so the driver
hash-verifies values, not just shapes.  Reference parity: none of these
exist in the reference -- they extend the clustering / graph / sketch /
training-data / engine-ops families the engine already carries
(SURVEY §2.11 'beyond-reference training-data operators').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# --------------------------------------------------------------------------
# Exact fixed-point k-means over the embeddings table
# --------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3
_KM_DIM = 64
_KM_SCALE = 1000


def _kmeans_oracle(k: int, iters: int, dim: int, scale: int) -> str:
    """Unrolled-CTE DuckDB replay of the exact Lloyd loop (the
    PageRank/PCA pattern: matvec-style iterations UNROLL as numbered
    CTEs; recursive CTEs cannot aggregate over the recursive table)."""
    parts = [
        f"""
        WITH u AS (
          SELECT vec_id AS id, gs.i AS i,
                 CAST(floor(CAST(embedding[gs.i + 1] AS DOUBLE) * {scale} + 0.5)
                      AS BIGINT) AS x
          FROM embeddings, generate_series(0, {dim - 1}) AS gs(i)),
        sel AS (
          SELECT vec_id AS id,
                 CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster
          FROM embeddings ORDER BY vec_id LIMIT {k}),
        c0 AS (SELECT s.cluster, u.i, u.x AS c FROM sel s JOIN u ON u.id = s.id)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
        d{t} AS (
          SELECT u.id, c.cluster,
                 CAST(SUM((u.x - c.c) * (u.x - c.c)) AS BIGINT) AS dist
          FROM u JOIN c{t - 1} c ON c.i = u.i GROUP BY u.id, c.cluster),
        a{t} AS (
          SELECT id, cluster, dist FROM (
            SELECT id, cluster, dist,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cluster) AS rn
            FROM d{t}) WHERE rn = 1),
        n{t} AS (
          SELECT a.cluster, u.i,
                 CAST(SUM(u.x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
          FROM a{t} a JOIN u ON u.id = a.id GROUP BY a.cluster, u.i),
        c{t} AS (
          SELECT p.cluster, p.i, COALESCE(n.c, p.c) AS c
          FROM c{t - 1} p LEFT JOIN n{t} n ON n.cluster = p.cluster AND n.i = p.i)"""
        )
    parts.append(
        f""",
        stats AS (
          SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_pts,
                 CAST(SUM(dist) AS BIGINT) AS inertia_fp
          FROM a{iters} GROUP BY cluster)
        SELECT c{iters}.cluster, c{iters}.i, c{iters}.c AS c_fp,
               COALESCE(s.n_pts, CAST(0 AS BIGINT)) AS n_pts,
               COALESCE(s.inertia_fp, CAST(0 AS BIGINT)) AS inertia_fp
        FROM c{iters} LEFT JOIN stats s ON s.cluster = c{iters}.cluster"""
    )
    return "".join(parts)


@register(
    "kmeans_embedding_clusters",
    oracle=_kmeans_oracle(_KM_K, _KM_ITERS, _KM_DIM, _KM_SCALE),
)
def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Lloyd k-means over the embedding corpus: 3 fixed-point
    rounds, deterministic smallest-id init, argmin ties to the lowest
    cluster, sum-div-count centroid updates -- the IVF coarse-quantizer
    / dataset-cartography building block, hash-verified cell by cell
    against an unrolled-CTE DuckDB replay
    (`operators/clustering.py::kmeans_lloyd_fixedpoint`)."""
    from ..operators.clustering import kmeans_lloyd_fixedpoint

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_lloyd_fixedpoint(
        emb, "vec_id", "embedding", k=_KM_K, iterations=_KM_ITERS,
        dim=_KM_DIM, scale=_KM_SCALE,
    )


# --------------------------------------------------------------------------
# Bounded weighted shortest paths (Bellman-Ford) over part<->supplier
# --------------------------------------------------------------------------

_SP_ROUNDS = 4
_SP_SEEDS = 10
_SP_TOPN = 100


def _sssp_oracle(rounds: int) -> str:
    parts = [
        f"""
        WITH seeds AS (
          SELECT 2 * s_suppkey + 1 AS node FROM supplier
          ORDER BY s_acctbal DESC, s_suppkey LIMIT {_SP_SEEDS}),
        ew AS (
          SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
                 CAST(MIN(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS w
          FROM lineitem GROUP BY l_partkey, l_suppkey),
        edges AS (SELECT src, dst, w FROM ew
                  UNION ALL SELECT dst, src, w FROM ew),
        d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
        d{t} AS (
          SELECT node, CAST(MIN(dv) AS BIGINT) AS dist FROM (
            SELECT node, dist AS dv FROM d{t - 1}
            UNION ALL
            SELECT e.dst AS node, d.dist + e.w AS dv
            FROM d{t - 1} d JOIN edges e ON e.src = d.node)
          GROUP BY node)"""
        )
    parts.append(
        f"""
        SELECT node, dist FROM d{rounds} ORDER BY dist, node LIMIT {_SP_TOPN}"""
    )
    return "".join(parts)


@register("cheapest_reach_part_supplier", oracle=_sssp_oracle(_SP_ROUNDS))
def q_cheapest_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted blast-radius: exact min-COST distance (integer cents,
    cheapest observed line price per part-supplier link) from the 10
    highest-balance suppliers, bounded at 4 edges -- Bellman-Ford as
    iterative min-plus relaxation, the weighted sibling of
    ``bfs_hops_part_supplier``
    (`operators/graph.py::shortest_paths_bounded`)."""
    from ..operators.graph import shortest_paths_bounded

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    ew = (
        li.groupBy(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("w")
        )
    )
    edges = ew.unionByName(
        ew.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    seeds = (
        sup.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(_SP_SEEDS)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    out = shortest_paths_bounded(edges, seeds, rounds=_SP_ROUNDS)
    return out.orderBy("dist", "node").limit(_SP_TOPN)
