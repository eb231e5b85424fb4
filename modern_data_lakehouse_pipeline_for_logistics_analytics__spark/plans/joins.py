"""Join plans (SURVEY.md section 2.3) -- star-schema consumption queries the
reference defers to its warehouse (`README.md:41-43`), expressed Spark-first
over the TPC-H-ish fixtures.

Physical intent (checked with .explain("formatted")):
  - BOUNDED dims (nation 25 rows, region 5 rows -- fixed by the data
    model at any SF) carry an explicit ``F.broadcast`` hint: they are
    broadcast-safe forever.
  - SF-SCALED tables (customer, supplier, part) are NEVER force-hinted:
    an explicit hint overrides ``autoBroadcastJoinThreshold`` AND AQE's
    runtime size check, so at sf100 (~15M customers) a forced broadcast
    becomes an executor OOM instead of a graceful SMJ fallback.  AQE
    (on in ``session.py``) still broadcasts them at small SF from
    observed sizes -- same local plan, safe 100x scale-up.
  - fact<->fact (orders<->lineitem) shuffles on the join key once; AQE
    picks SMJ vs shuffled-hash by observed sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import anti_join, asof_join, dim_join, range_join, semi_join
from .registry import read_events, register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "join_broadcast_region_revenue",
    oracle="""
    SELECT r.r_name,
           COUNT(*) AS order_cnt,
           ROUND(SUM(o.o_totalprice), 2) AS total_revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact -> dim-chain enrichment.  nation/region (bounded) broadcast by
    hint; customer is SF-scaled so AQE picks its strategy from observed
    size (broadcast at this SF, SMJ at sf100)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    df = dim_join(
        orders, cust, on=orders["o_custkey"] == cust["c_custkey"], how="inner",
        broadcast_dim=False,
    )
    df = dim_join(df, nation, on=df["c_nationkey"] == nation["n_nationkey"], how="inner")
    df = dim_join(df, region, on=df["n_regionkey"] == region["r_regionkey"], how="inner")
    return df.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: filtered customer join + fact-fact equi-join + top-k.
    Filters sit on the scans (pushdown); top-k is TakeOrderedAndProject.
    customer is SF-scaled (no forced hint); AQE broadcasts the filtered
    single-column side while it fits, SMJ beyond."""
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    df = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
    )
    return df.orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")).limit(10)


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: multi-way join with a cross-table residual
    (customer and supplier in the same nation)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    df = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return df.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg -- the pushdown benchmark.  All four
    predicates reach the parquet reader (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(YEAR(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_e4
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name, YEAR(l.l_shipdate)
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year -- the same dim
    table (nation) joined twice under different roles.  Revenue in exact
    integer ten-thousandths via half-up floor on BOTH sides: ~4k small
    groups make per-row rounded doubles hit cross-engine .5 knife-edges,
    and Spark ``round`` (decimal-string HALF_UP) disagrees with DuckDB
    ``ROUND`` (binary) on exactly those edges (r1 hash-FAIL)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    df = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    rev_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    return df.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("ship_year")
    ).agg(F.sum(rev_e4).alias("revenue_e4"))


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    df = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
    )
    return df.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


@register(
    "join_semi_urgent_customers",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: existence check, no payload duplication."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return semi_join(cust, urgent, cust["c_custkey"] == urgent["o_custkey"])


@register(
    "join_anti_no_finished",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti: orphan audit (customers with no finished order)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    fin = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return anti_join(cust, fin, cust["c_custkey"] == fin["o_custkey"])


@register(
    "join_range_ship_window",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS lines_in_window
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: equi key + interval residual (checkpoint_time within
    [created_at, updated_at] validation shape, SURVEY section 2.3).  The
    equi key keeps this a hash join with residual filter, not a BNLJ."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    df = range_join(
        li,
        orders,
        equi=li["l_orderkey"] == orders["o_orderkey"],
        lower=li["l_shipdate"] >= orders["o_orderdate"],
        upper=li["l_shipdate"] <= F.date_add(orders["o_orderdate"], 90),
    )
    return df.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("lines_in_window"))


@register(
    "asof_prev_error_per_event",
    oracle="""
    SELECT event_id, user_id, ts AS prev_error_ts, prev_id AS prev_error_id
    FROM (
      SELECT l.event_id, l.user_id, r.ts, r.event_id AS prev_id,
             ROW_NUMBER() OVER (PARTITION BY l.event_id
                                ORDER BY r.ts DESC, r.event_id DESC) AS rn
      FROM events l
      JOIN events r ON r.user_id = l.user_id
                   AND r.event_type = 'error'
                   AND r.ts < l.ts
    ) WHERE rn = 1
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the same user's most recent STRICTLY
    earlier 'error' event -- the reference's checkpoints[last] semantics
    (`extraction.py:80-94`) generalized to a keyed temporal self-join.
    (An orders->events as-of is vacuous on these fixtures: every event
    postdates every order date.)"""
    events = read_events(spark, sf_dir)
    left = events.select("event_id", "user_id", "ts")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"), F.col("event_id").alias("e_id")
    )
    df = asof_join(
        left,
        errors,
        left_key="user_id",
        right_key="e_user",
        left_ts="ts",
        right_ts="e_ts",
        tie_breakers=["e_id"],
        strict=True,
    )
    return df.select(
        "event_id",
        "user_id",
        F.col("e_ts").alias("prev_error_ts"),
        F.col("e_id").alias("prev_error_id"),
    )
