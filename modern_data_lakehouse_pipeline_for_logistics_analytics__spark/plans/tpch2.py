"""Second TPC-H batch: the optimizer shapes round 1 lacked -- correlated
EXISTS with date arithmetic (Q4), CASE-conditional aggregation after a
fact-fact join (Q12), ratio-of-conditional-sums over a broadcast dim join
(Q14), and OR-of-ANDs disjunctive pushdown (Q19).  Adapted to the driver
fixture's columns (no shipmode/commitdate/container; l_returnflag and
p_type/p_brand/p_size stand in)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import round_half_up, sql_round_half_up
from .registry import register, table_path

# Per-row revenue in exact integer ten-thousandths (half-up floor) -- the
# same cross-engine posture tpch_q7 uses (plans/joins.py): summing exact
# integers removes float-summation-order ambiguity, and the final rounding
# uses floor(x*10^d + 0.5) on BOTH engines instead of the engines' native
# ROUND (Spark HALF_UP decimal-string vs DuckDB binary -- the r1 q7
# hash-FAIL knife-edge).
_SQL_REV_E4 = "CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT)"


def _rev_e4() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "tpch_q4_late_shipments",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > CAST(o.o_orderdate AS DATE) + 60)
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders in a half-year window (1996H1; the fixture's orders span 1995-2001) having at least one line
    shipped >60 days after order date, counted by priority.  The
    correlated EXISTS with a date-arithmetic residual becomes one
    left-semi join; the date window is pushed into the orders scan."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate").cast("date") > F.date_add(F.col("o_orderdate").cast("date"), 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q12_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: CASE-conditional counts after a fact-fact equi-join
    (returnflag standing in for shipmode).  The year filter pushes to the
    lineitem scan; the join shuffles once on orderkey."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue_share",
    oracle=f"""
    SELECT {sql_round_half_up(
        "100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN " + _SQL_REV_E4 + " ELSE 0 END) AS DOUBLE)"
        " / CAST(SUM(" + _SQL_REV_E4 + ") AS DOUBLE)", 4)} AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promotion revenue share -- ratio of conditional sums over
    a part join; one aggregate row.  Exact-integer per-row revenue + one
    deterministic double division + half-up floor rounding on both engines
    (the q7 playbook).  No forced broadcast: part scales with SF, so the
    hint is left to AQE's size estimate (a forced hint would override
    autoBroadcastJoinThreshold and OOM executors at sf100)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo_e4 = F.when(F.col("p_type") == "PROMO", _rev_e4()).otherwise(F.lit(0).cast("long"))
    share = (
        F.lit(100.0)
        * F.sum(promo_e4).cast("double")
        / F.sum(_rev_e4()).cast("double")
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(round_half_up(share, 4).alias("promo_share_pct"))
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_round_half_up(
        "CAST(SUM(" + _SQL_REV_E4 + ") AS DOUBLE) / 10000.0", 2)} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs across both join sides.  Catalyst extracts
    the per-side disjunction closures (brand/size to the part scan,
    quantity bounds to the lineitem scan) before the join -- the classic
    disjunctive-pushdown test.  Revenue summed as exact integer e4 then
    half-up rounded to 2dp on both engines (q7 playbook).  part is
    SF-scaled, so no forced broadcast -- AQE decides."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            round_half_up(F.sum(_rev_e4()).cast("double") / F.lit(10000.0), 2).alias("revenue")
        )
    )
