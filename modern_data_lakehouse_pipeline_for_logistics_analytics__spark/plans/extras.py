"""Remaining SURVEY.md section-2 inventory: outer/cross joins, outer
explode, try_cast coercion, SQL-frontend GROUPING SETS, unionByName."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "join_full_outer_order_counts",
    oracle="""
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_mktsegment,
           COALESCE(o.n_orders, 0) AS n_orders
    FROM customer c
    FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders
                     FROM orders WHERE o_orderstatus = 'F'
                     GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with COALESCE key/default handling -- customers with
    zero finished orders keep a 0 count, orphan order keys survive."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cnts = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = cust.join(cnts, cust["c_custkey"] == cnts["o_custkey"], "full_outer")
    return j.select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
        "c_mktsegment",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
    )


@register(
    "join_cross_status_region",
    oracle="""
    SELECT r.r_name, s.o_orderstatus FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def q_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two dim-sized inputs (scaffold grids; never facts)."""
    region = _t(spark, sf_dir, "region").select("r_name")
    statuses = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(statuses)


@register(
    "explode_outer_with_empties",
    oracle="""
    WITH src AS (
      SELECT vec_id,
             CASE WHEN vec_id % 50 = 0 THEN NULL ELSE embedding END AS emb
      FROM embeddings WHERE vec_id < 200)
    SELECT vec_id, CAST(unnest(emb) AS DOUBLE) AS val FROM src WHERE emb IS NOT NULL
    UNION ALL
    SELECT vec_id, CAST(NULL AS DOUBLE) AS val FROM src WHERE emb IS NULL
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with null arrays survive as a null element (the
    reference's plain explode silently drops them -- SURVEY F10)."""
    src = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .withColumn(
            "emb",
            F.when(F.col("vec_id") % 50 == 0, F.lit(None)).otherwise(F.col("embedding")),
        )
    )
    return src.select("vec_id", F.explode_outer("emb").alias("val")).select(
        "vec_id", F.col("val").cast("double").alias("val")
    )


@register(
    "scalar_try_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           TRY_CAST(event_type AS BIGINT) AS et_num,
           COALESCE(TRY_CAST(event_type AS BIGINT), -1) AS et_num_filled
    FROM events
    """,
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast coercion (pandas to_numeric errors='coerce' parity,
    `pastapi.py:208`): parseable strings -> numbers, junk -> NULL."""
    from .registry import read_events

    e = read_events(spark, sf_dir)
    et_num = F.col("event_type").try_cast("bigint")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_num"),
        et_num.alias("et_num"),
        F.coalesce(et_num, F.lit(-1)).alias("et_num_filled"),
    )


@register(
    "sql_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           GROUPING(o_orderstatus, o_orderpriority) AS grp_id
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL frontend surface: the engine accepts raw ANSI SQL via
    spark.sql; GROUPING SETS has no direct DataFrame API equivalent."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS grp_id
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "union_by_name_mismatched",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-evolution-tolerant
    union (U1 done right -- the reference's positional union breaks on
    reordered columns)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_totalprice")
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "skew_salted_event_counts",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_cents
    FROM events GROUP BY event_type
    """,
)
def q_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through ``operators.skew.salted_aggregate``:
    event_type has single-digit cardinality, so an unsalted groupBy puts
    each key's entire volume through one reducer task -- the canonical
    skew shape at 100 TB.  The two-phase (key, salt) -> key plan bounds
    any task at rows/buckets.  Salting is invisible in the result (sums
    of exact integer cents re-aggregate associatively), so a plain
    GROUP BY oracle verifies it -- the driver row proves the salted plan
    is value-identical, not just pytest-equivalent."""
    from ..operators.skew import salted_aggregate
    from .registry import read_events

    e = read_events(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("value_cents"),
    )
    return salted_aggregate(e, "event_type", ["value_cents"], buckets=8)
