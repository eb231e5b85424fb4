"""Core relational plans (SURVEY.md sections 2.2, 2.4, 2.6, 2.7).

Domain -> driver-table mapping per FIXTURES.md: the courier-metrics aggregate
(`Gold_layer/starschema.py:137-145`) is transplanted onto ``orders`` grouped
by ``o_orderpriority``; dim extraction (`starschema.py:75-96`) onto
``customer.c_mktsegment``; dedup (`MLOPS/prediction.py:99`) onto
orders-per-customer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import (
    cube_metrics,
    group_metrics,
    group_metrics_approx,
    rollup_metrics,
)
from ..operators.cleaning import fill_defaults, normalize_code, status_flag
from ..operators.dims import dedup_by_key, dim_with_hashed_key, dim_with_ordered_key
from .registry import register, table_path


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "orders"))


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "lineitem"))


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "customer"))


# --------------------------------------------------------------------------
# Flagship: courier-metrics shape (A1-A5) on orders.
# --------------------------------------------------------------------------
@register(
    "courier_metrics",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
             COUNT(DISTINCT o_orderkey) AS total_cnt,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS matched_cnt,
             ROUND(AVG(o_totalprice), 2) AS avg_val
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, total_cnt, matched_cnt, avg_val,
           ROUND(matched_cnt / total_cnt * 100, 2) AS matched_pct
    FROM m
    """,
)
def q_courier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`starschema.py:137-145` semantics: distinct count + conditional count
    + 2dp avg + derived pct, keyed by priority."""
    return group_metrics(
        _orders(spark, sf_dir),
        group_col="o_orderpriority",
        distinct_col="o_orderkey",
        cond=F.col("o_orderstatus") == "F",
        avg_col="o_totalprice",
    )


@register("courier_metrics_approx")  # HLL++ -- no exact SQL oracle (rows-only)
def q_courier_metrics_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 scale variant of the flagship (approx_count_distinct)."""
    return group_metrics_approx(
        _orders(spark, sf_dir),
        group_col="o_orderpriority",
        distinct_col="o_orderkey",
        cond=F.col("o_orderstatus") == "F",
        avg_col="o_totalprice",
    )


# --------------------------------------------------------------------------
# TPC-H Q1 pricing summary -- the headline bench aggregate.
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate scan.  Filter sits directly on
    the scan (parquet min/max skipping); single shuffle on the 2-key group."""
    li = _lineitem(spark, sf_dir)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Projections / cleaning (P1-P11, F1-F2)
# --------------------------------------------------------------------------
@register(
    "project_normalize",
    oracle="""
    SELECT c_custkey,
           UPPER(TRIM(c_mktsegment)) AS segment_norm,
           CAST(TRUNC(c_acctbal) AS BIGINT) AS acctbal_int,
           ROUND(c_acctbal, 1) AS acctbal_1dp
    FROM customer
    """,
)
def q_project_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/F1/F2: rename+normalize+cast projection
    (`Silver_tranformation.py:79-94` shape).  Spark double->long cast
    truncates toward zero; oracle mirrors with TRUNC."""
    return _customer(spark, sf_dir).select(
        "c_custkey",
        normalize_code("c_mktsegment").alias("segment_norm"),
        F.col("c_acctbal").cast("long").alias("acctbal_int"),
        F.round("c_acctbal", 1).alias("acctbal_1dp"),
    )


@register(
    "filter_isin_case",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CASE WHEN l_linestatus = 'F' THEN 'CLOSED' ELSE 'OPEN' END AS line_state
    FROM lineitem
    WHERE l_returnflag IN ('R', 'A')
    """,
)
def q_filter_isin_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+P8: membership predicate + CASE WHEN
    (`Silver_tranformation.py:108-110`)."""
    li = _lineitem(spark, sf_dir)
    return li.filter(F.col("l_returnflag").isin("R", "A")).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        status_flag("l_linestatus", ["F"], "CLOSED", "OPEN").alias("line_state"),
    )


@register(
    "fillna_defaults",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'NONE') AS prio_filled
    FROM orders
    """,
)
def q_fillna_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: null fill (`Silver_tranformation.py:102-106`).  Fixture tables have
    no nulls, so nulls are injected with NULLIF on both sides first."""
    df = _orders(spark, sf_dir).select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_filled"),
    )
    return fill_defaults(df, {"prio_filled": "NONE"})


# --------------------------------------------------------------------------
# Dimensions + dedup (A7, A9, W0)
# --------------------------------------------------------------------------
@register(
    "dim_ordered_key",
    oracle="""
    SELECT c_mktsegment,
           ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS segment_id
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
)
def q_dim_ordered_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+W0: dim extraction with contiguous deterministic surrogate keys
    (replaces `starschema.py:75` monotonically_increasing_id)."""
    df = dim_with_ordered_key(_customer(spark, sf_dir), ["c_mktsegment"], "segment_id")
    return df.withColumn("segment_id", F.col("segment_id").cast("long"))


@register(
    "dim_hashed_key_unique",
    oracle="""
    SELECT COUNT(*) AS n_keys, COUNT(*) AS n_ids
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    """,
)
def q_dim_hashed_key_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W0 scale variant: xxhash64 surrogate keys.  DuckDB cannot reproduce
    the hash values, so the checkable invariant is injectivity: distinct id
    count == distinct key count."""
    dim = dim_with_hashed_key(_customer(spark, sf_dir), ["c_mktsegment"], "segment_id")
    return dim.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.countDistinct("segment_id").alias("n_ids"),
    )


@register(
    "dedup_first_order",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def q_dedup_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 with deterministic survivor: earliest order per customer
    (pandas `drop_duplicates` parity, `prediction.py:99`, made stable)."""
    return dedup_by_key(
        _orders(spark, sf_dir).select("o_custkey", "o_orderkey", "o_orderdate"),
        keys=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
    )


# --------------------------------------------------------------------------
# Grouping sets (A10)
# --------------------------------------------------------------------------
@register(
    "rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS row_cnt,
           ROUND(SUM(o_totalprice), 2) AS sum_val,
           GROUPING(o_orderstatus, o_orderpriority) AS grp_id
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: ROLLUP subtotals -- one Expand + one shuffle, not N groupBys."""
    df = rollup_metrics(_orders(spark, sf_dir), ["o_orderstatus", "o_orderpriority"], "o_totalprice")
    return df.withColumn("grp_id", F.col("grp_id").cast("long"))


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS row_cnt,
           ROUND(SUM(o_totalprice), 2) AS sum_val,
           GROUPING(o_orderstatus, o_orderpriority) AS grp_id
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: CUBE cross-tab subtotals."""
    df = cube_metrics(_orders(spark, sf_dir), ["o_orderstatus", "o_orderpriority"], "o_totalprice")
    return df.withColumn("grp_id", F.col("grp_id").cast("long"))


# --------------------------------------------------------------------------
# Sort / limit / top-k (O1-O2)
# --------------------------------------------------------------------------
@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k -- plans as TakeOrderedAndProject (per-partition heaps +
    driver merge), never a full global sort."""
    return (
        _orders(spark, sf_dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Set operations (U1-U2)
# --------------------------------------------------------------------------
@register(
    "union_fold",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_union_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: positional union fold (`prediction.py:80` / `pastapi.py:118`).
    Spark ``union`` == SQL UNION ALL (no dedup)."""
    o = _orders(spark, sf_dir).select("o_orderkey", "o_orderstatus", "o_orderpriority")
    return o.filter(F.col("o_orderstatus") == "F").union(
        o.filter(F.col("o_orderpriority") == "1-URGENT")
    )


@register(
    "intersect_custkeys",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: INTERSECT (distinct) -- day-over-day dim-drift audit shape."""
    building = (
        _customer(spark, sf_dir).filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    )
    with_orders = _orders(spark, sf_dir).select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(with_orders)


@register(
    "except_custkeys",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: EXCEPT (distinct) -- customers with no finished order."""
    cust = _customer(spark, sf_dir).select("c_custkey")
    finished = (
        _orders(spark, sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.exceptAll(finished).distinct()


@register("global_count", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def q_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: global count (`Silver_tranformation.py:71`) -- computed once, as a
    plan, not an eager double-count."""
    return _lineitem(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_rows"))
