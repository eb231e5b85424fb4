"""Window-function plans (SURVEY.md section 2.5, W0).

Domain shapes: latest checkpoint per shipment -> latest lineitem per order;
courier leaderboard -> priority ranking; rolling 7-day delivery average ->
trailing order-amount average per customer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import global_ntile, lag_delta_days, latest_per_key, rank_by
from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "window_latest_line_per_order",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM (
      SELECT l_orderkey, l_linenumber, l_shipdate,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
      FROM lineitem) WHERE rn = 1
    """,
)
def q_latest_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Latest checkpoint per shipment' (`extraction.py:80-94` semantics):
    deterministic top-1 per key."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate")
    return latest_per_key(
        li,
        keys=["l_orderkey"],
        order_by=[F.desc("l_shipdate"), F.desc("l_linenumber")],
    )


@register(
    "window_rank_priorities",
    oracle="""
    SELECT o_orderpriority, avg_price,
           RANK() OVER (ORDER BY avg_price DESC) AS price_rank
    FROM (SELECT o_orderpriority, ROUND(AVG(o_totalprice), 2) AS avg_price
          FROM orders GROUP BY o_orderpriority)
    """,
)
def q_rank_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Courier-leaderboard shape: rank over an aggregated (dim-sized)
    result -- the single-partition window is safe only post-aggregation."""
    agg = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
    )
    return rank_by(agg, [F.desc("avg_price")], "price_rank")


@register(
    "window_rolling_sum_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_spend_cents,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_in_window
    FROM orders
    """,
)
def q_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row frame per customer (rolling 7-day delivery-avg shape).

    Money is summed in exact integer cents: per-row float window outputs
    across thousands of rows WILL hit half-ulp rounding knife-edges between
    engines (observed at sf0.01), so cross-engine-hashable plans keep frame
    arithmetic integral.  Cents via ``floor(x*100 + 0.5)`` on BOTH sides:
    Spark ``round`` is decimal-string HALF_UP while DuckDB rounds the binary
    double, and the two disagree on inexact-binary .5 edges (r1 hash-FAIL).
    The float-averaging operator itself is ``operators.windows.rolling_avg``.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-6, 0)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rolling_spend_cents", F.sum(cents).over(w))
        .withColumn("n_in_window", F.count(F.lit(1)).over(w))
        .select("o_custkey", "o_orderkey", "rolling_spend_cents", "n_in_window")
    )


@register(
    "window_running_sum_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_spend_cents
    FROM orders
    """,
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative customer spend (exact integer cents via half-up floor;
    see window_rolling_sum_spend for why)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("cum_spend_cents", F.sum(cents).over(w))
        .select("o_custkey", "o_orderkey", "cum_spend_cents")
    )


@register(
    "window_days_between_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           DATE_DIFF('day',
             CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS DATE),
             CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    """,
)
def q_lag_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival days per customer (lag)."""
    df = lag_delta_days(
        _t(spark, sf_dir, "orders"),
        keys=["o_custkey"],
        order_by=[F.asc("o_orderdate"), F.asc("o_orderkey")],
        ts_col="o_orderdate",
        alias="days_since_prev",
    )
    return df.select("o_custkey", "o_orderkey", "days_since_prev")


@register(
    "topn_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-limit (top-3 orders per customer): the rank-filter shape
    Spark rewrites into WindowGroupLimit, so each partition keeps only
    3 rows per key BEFORE the full window sort materializes."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "window_ntile_spend_quartiles",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS spend_quartile
    FROM orders
    """,
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing (spend quartiles) -- DISTRIBUTED: ``global_ntile``
    range-partitions on the sort keys and reconstructs exact global ranks
    from per-partition offsets, so no unpartitioned window ever funnels the
    fact table through one task (r1 used a bare Window.orderBy)."""
    return global_ntile(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=4,
        range_col="o_totalprice",
        alias="spend_quartile",
        range_desc=True,
    ).select("o_orderkey", F.col("spend_quartile").cast("int").alias("spend_quartile"))
