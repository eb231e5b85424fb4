"""Analytic extensions the star-schema consumption implies (SURVEY.md
O2/A10 negative findings): RANGE window frames, pivot, argmin/argmax
aggregates, exact median / stddev."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "window_range_7day_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS spend_7d_cents
    FROM orders
    """,
)
def q_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (true trailing 7 *days*, not 7 rows): the rolling
    delivery-metrics shape done on event time.  Ordering key is epoch-day
    so the frame bound is numeric on both engines.  Integer-cents sums are
    CAST back to BIGINT in the oracle: DuckDB SUM(BIGINT) returns HUGEINT,
    which pandas widens to float64 and the driver then hash-mismatches
    (the actual root cause of r1's window hash-FAILs)."""
    o = _t(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-6, 0)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return o.select(
        "o_custkey", "o_orderkey", F.sum(cents).over(w).alias("spend_7d_cents")
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (BI cross-tab).  Pivot values are declared explicitly --
    letting Spark discover them adds a whole extra collect pass at scale."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("F").alias("n_F"),
            F.col("O").alias("n_O"),
            F.col("P").alias("n_P"),
        )
    )


@register(
    "agg_minby_maxby",
    oracle="""
    SELECT o_orderpriority,
           ARG_MAX(o_orderkey, o_totalprice ORDER BY o_orderkey) AS biggest_order,
           ARG_MIN(o_orderkey, o_totalprice ORDER BY o_orderkey) AS smallest_order,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) -- 'which order' not just 'how much'.
    Ties on the ordering value are broken deterministically (DuckDB ORDER
    BY clause; Spark values are distinct here so semantics align)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@register(
    "agg_median_stddev",
    oracle="""
    SELECT o_orderpriority,
           ROUND(MEDIAN(o_totalprice), 2) AS median_price,
           ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_median_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / interpolated p90 / sample stddev per group.  The
    scale variant is approx_percentile (t-digest) -- exact percentile
    requires a per-group sort, acceptable only on dim-sized groups."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 2).alias("median_price"),
        F.round(F.stddev_samp("o_totalprice"), 2).alias("sd_price"),
        F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90_price"),
    )
