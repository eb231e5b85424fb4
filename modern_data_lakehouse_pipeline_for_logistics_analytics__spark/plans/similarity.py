"""Similarity-search plans over the ``embeddings`` fixture (north-star).

Oracle cosine is computed in float64 via unnest (DuckDB's builtin
``list_cosine_similarity`` accumulates in float32 and cannot hash-match a
float64 engine); 6dp rounding absorbs summation-order ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    cosine_pairs_above,
    cosine_topk,
    ivf_topk,
    lsh_neardup_pairs,
    lsh_topk,
)
from .registry import register, table_path

_COS_CTE = """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    nrm AS (SELECT vec_id, SQRT(SUM(v * v)) AS n FROM e GROUP BY 1)
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "embeddings"))


@register(
    "embedding_neardup_pairs",
    oracle=_COS_CTE
    + """
    , dot AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.v * b.v) AS d
      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, ROUND(d / (na.n * nb.n), 6) AS cos_sim
    FROM dot JOIN nrm na ON na.vec_id = id_a JOIN nrm nb ON nb.vec_id = id_b
    WHERE ROUND(d / (na.n * nb.n), 6) >= 0.4
    """,
)
def q_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= 0.4): brute-force exact stage.
    At scale this runs per LSH bucket, not on all pairs."""
    return cosine_pairs_above(_emb(spark, sf_dir), "vec_id", "embedding", threshold=0.4)


@register("embedding_neardup_lsh")  # hash-derived planes -> rows-only
def q_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane LSH + exact verify
    on candidates only -- the path that replaces the all-pairs product at
    100 TB.  Recall vs the exact operator is measured in
    tests/test_northstar.py."""
    return lsh_neardup_pairs(
        _emb(spark, sf_dir), "vec_id", "embedding", threshold=0.4, n_bands=12
    )


@register(
    "ann_bruteforce_topk",
    oracle=_COS_CTE
    + """
    , dot AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.v * c.v) AS d
      FROM e q JOIN e c ON q.i = c.i AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 5
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             ROUND(d / (nq.n * nc.n), 6) AS cos_sim
      FROM dot JOIN nrm nq ON nq.vec_id = query_id
               JOIN nrm nc ON nc.vec_id = neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 10
    """,
)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors (vec_id < 5): broadcast
    queries, stream the corpus, per-query top-k window.  Deterministic:
    ranked on 6dp-rounded cosine with id tie-break."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, "vec_id", "embedding", k=10)


@register("ann_lsh_topk")  # hash-derived planes -> rows-only
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k (8 random hyperplanes): the scale path.
    Recall vs brute force is measured in tests/test_northstar.py."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, queries, "vec_id", "embedding", k=10, n_planes=8)


@register("ann_ivf_topk")  # KMeans-derived buckets -> rows-only
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k: k-means coarse quantizer, nprobe=4 of 16 clusters.
    Recall vs brute force is measured in tests/test_northstar.py."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, "vec_id", "embedding", k=10, n_clusters=16, nprobe=4)
