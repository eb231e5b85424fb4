"""Python-UDF-surface plans (M8): each Arrow extension point exercised
with a DuckDB oracle where the math is reproducible."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.udfs import log1p_weight, weighted_mean, zscore_within_group
from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "pandas_udf_scalar_log1p",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(LN(1 + l_quantity), 6) AS log_qty
    FROM lineitem
    """,
)
def q_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (numpy log1p) -- matches LN(1+x) to 6dp."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(log1p_weight(F.col("l_quantity")), 6).alias("log_qty"),
    )


@register(
    "pandas_udf_grouped_weighted_mean",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas_udf: quantity-weighted mean price per flag
    (np.average == sum(v*w)/sum(w); 4dp absorbs summation-order ulps)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_mean(F.col("l_extendedprice"), F.col("l_quantity")), 4).alias(
            "wavg_price"
        )
    )


@register(
    "apply_in_pandas_zscore",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND((o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_custkey))
                 / STDDEV_POP(o_totalprice) OVER (PARTITION BY o_custkey), 6) AS zscore
    FROM orders
    QUALIFY STDDEV_POP(o_totalprice) OVER (PARTITION BY o_custkey) > 0
    """,
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas whole-group transform: per-customer z-score (ddof=0
    == STDDEV_POP).  Zero-variance groups are excluded identically on both
    sides (the UDF emits 0.0 there, SQL emits NULL)."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    out = zscore_within_group(o, ["o_custkey"], "o_totalprice")
    varying = (
        o.groupBy("o_custkey")
        .agg(F.stddev_pop("o_totalprice").alias("__sd"))
        .filter(F.col("__sd") > 0)
        .select("o_custkey")
    )
    return (
        # left_semi: varying is per-customer (SF-scaled) -- no forced
        # broadcast hint; AQE picks the strategy from observed size.
        out.join(varying, "o_custkey", "left_semi")
        .select("o_custkey", "o_orderkey", "zscore")
    )
