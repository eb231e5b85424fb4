"""Nested-type plans (SURVEY.md section 2.8 F10-F11; section 1.2 array<struct>).

The reference's one nested op is exploding the checkpoints array
(`Silver_tranformation.py:78`) and reading struct fields (`:90-93`).  The
driver's stand-in is ``embeddings.embedding`` (list<float>) -- explode with
position -- plus array aggregation/construction the star-schema consumption
implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "explode_embedding_positions",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def q_explode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: posexplode -- array-of-N to N rows with 0-based position
    (`explode(checkpoints)` semantics with ordinal retained).  float32
    widens to float64 exactly, but the oracle must CAST explicitly: a bare
    ``unnest(embedding)`` stays FLOAT in DuckDB and the driver then hashes
    float32 representations against Spark's float64 (r1 hash-FAIL)."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select("vec_id", F.posexplode("embedding").alias("pos", "val")).select(
        "vec_id", F.col("pos").cast("long").alias("pos"), F.col("val").cast("double").alias("val")
    )


@register(
    "array_stats_per_vec",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val
    FROM embeddings
    """,
)
def q_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions: size, element_at, array_max/min.  Exact
    float32 comparisons (no arithmetic), rounded only to normalize the
    float->double widening display."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).cast("long").alias("dim"),
        F.round(F.element_at(e, 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max(e).cast("double"), 6).alias("max_val"),
        F.round(F.array_min(e).cast("double"), 6).alias("min_val"),
    )


@register(
    "array_agg_statuses",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_set + sort_array (deterministic order --
    bare collect_list order is partition-dependent and must never be
    hash-compared).  The sorted array is serialized to a comma-joined
    STRING on both sides because the driver's canonicalizer cannot hash
    array-typed cells (r1 'unhashable type: list')."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "higherorder_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4)
             AS l2_norm_sq
    FROM embeddings
    """,
)
def q_higherorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter / transform / aggregate) -- the
    JVM-side path for vector math, no Python UDF.  Squared-L2 accumulates
    in float64 sequentially in both engines; 4dp rounding absorbs any
    fold-order ulps."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    sq_sum = F.aggregate(
        F.transform(e, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.round(sq_sum, 4).alias("l2_norm_sq"),
    )
