"""Third TPC-H batch (r4): optimizer shapes batches 1-2 lacked --
conditional-join count distribution (Q13), max-of-aggregate selection
(Q15), NOT-IN + count-distinct grouping (Q16), correlated per-group
scalar threshold (Q17), HAVING-driven semi join on a fact aggregate
(Q18), double-negated existential self-joins (Q21), global-scalar
anti-join aggregation (Q22), and value-concentration HAVING against a
global total (Q11, partsupp adapted to lineitem).

The reference ships no joins at all (SURVEY J0, `README.md:41-43`);
these queries are pure engine surface.  Float posture: every value that
crosses an equality/threshold/hash boundary is exact-integer (quantities
are integral, money in half-up-floored e2/e4 units -- the q7 playbook),
so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, table_path
from .tpch2 import _SQL_REV_E4, _rev_e4


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "tpch_q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customer distribution by (conditionally joined) order
    count.  The join predicate lives in the LEFT JOIN's ON clause -- a
    WHERE would silently turn it inner and drop zero-order customers.
    Two aggregations, both integer-exact; AQE picks the join strategy
    (customer is SF-scaled, no hint)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).cast("long").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(SUM({_SQL_REV_E4.replace('l.', '')}) AS BIGINT) AS total_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT l_suppkey AS s_suppkey, total_e4
    FROM rev WHERE total_e4 = (SELECT MAX(total_e4) FROM rev)
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum half-year revenue --
    an aggregate compared against the max of the same aggregate.  Exact
    integer-e4 revenue makes the max-equality test safe (double revenue
    would make 'equal to the max' engine-dependent).  The max is a 1-row
    aggregate broadcast back -- never a global window over all
    suppliers (that would sort every supplier on one task at scale)."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_e4()).cast("long").alias("total_e4"))
    )
    mx = rev.agg(F.max("total_e4").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_e4"] == mx["__mx"])
        .select(F.col("l_suppkey").alias("s_suppkey"), "total_e4")
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#23'
      AND p.p_type <> 'MEDIUM'
      AND p.p_size IN (1, 4, 7, 10, 14, 19, 23, 36)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts by part attributes with a
    NOT IN exclusion.  s_suppkey is non-null so NOT IN == anti join (a
    nullable NOT IN column would need the null-aware single-join plan);
    the part attribute filters push to the part scan."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#23")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 10000 + 0.5) AS BIGINT)) AS BIGINT)
             AS small_qty_revenue_e4
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT CAST(0.2 AS DOUBLE) * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: lines below 20% of their part's average quantity.  The
    correlated scalar subquery decorrelates into one per-part average
    joined back.  The threshold compare is deterministic: quantities are
    integral, so the per-part sum (and hence AVG and 0.2*AVG) is the
    same IEEE double on both engines regardless of summation order."""
    brand_parts = (
        _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
    )
    avg_q = li.groupBy("p_partkey").agg(F.avg("l_quantity").alias("__avg"))
    price_e4 = F.floor(F.col("l_extendedprice") * 10000 + F.lit(0.5)).cast("long")
    return (
        li.join(avg_q, "p_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("__avg"))
        .agg(F.sum(price_e4).cast("long").alias("small_qty_revenue_e4"))
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250)
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: large-volume orders -- an IN over a HAVING aggregate
    becomes a semi join from orders to the qualifying order keys; top-100
    is TakeOrderedAndProject.  total_qty sums integral quantities as
    longs (exact); the o_orderkey tiebreak makes the limit
    deterministic."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select(F.col("l_orderkey").alias("__big_ok"))
    )
    orders = _t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("__big_ok"), "left_semi"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    df = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"))
    )
    return df.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY l_suppkey
    ORDER BY numwait DESC, s_suppkey LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (receiptdate adapted to shipdate-vs-orderdate+60): the
    sole late supplier in multi-supplier finished orders.

    Single-scan aggregate shape: instead of decorrelating EXISTS/NOT
    EXISTS into a semi + anti join chain (three lineitem passes -- the
    r6 plan), both quantifiers collapse into per-order counts over ONE
    lineitem scan: EXISTS another supplier == n_supp > 1, NOT EXISTS
    another LATE supplier == n_late_supp == 1 (l1 itself is late, so
    "no other late supplier" means exactly one).  Because all lateness
    is then attributable to that single supplier, numwait is the sum of
    the order's late LINES credited to max(late suppkey).

    Two-level aggregate keeps everything partial-agg friendly: per
    (order, supplier) first -- map-side combine collapses multi-line
    suppliers before the shuffle -- then per order.  At 100x the triple
    scan + two non-equi joins were the dominant cost; this is one scan,
    two narrow shuffles, and a final aggregate over only the qualifying
    orders."""
    o_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lines = li.join(o_f, li["l_orderkey"] == o_f["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .cast("long")
        .alias("is_late"),
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("any_late"),
        F.sum("is_late").alias("late_lines"),
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
        F.max(F.when(F.col("any_late") == 1, F.col("l_suppkey"))).alias("s_suppkey"),
        F.sum("late_lines").alias("n_late_lines"),
    )
    sole = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    df = sole.groupBy("s_suppkey").agg(
        F.sum("n_late_lines").cast("long").alias("numwait")
    )
    return df.orderBy(F.desc("numwait"), F.asc("s_suppkey")).limit(20)


@register(
    "tpch_q22_lapsed_customers",
    oracle="""
    WITH cents AS (
      SELECT c_custkey, c_mktsegment,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
      FROM customer),
    avgpos AS (
      SELECT AVG(CAST(bal_c AS DOUBLE)) AS a FROM cents WHERE bal_c > 0)
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
    FROM cents, avgpos
    WHERE CAST(bal_c AS DOUBLE) > a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = cents.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (country-code prefix adapted to mktsegment; 'no orders'
    adapted to 'no orders since 2000' -- every fixture customer has some
    order): above-average-balance customers gone quiet.  The global
    average is a 1-row broadcast scalar; the NOT EXISTS is a left-anti
    against date-filtered orders (filter pushed to the scan).  Balances
    in exact half-up cents: integer-valued doubles sum exactly in any
    order, so the AVG threshold is bit-identical across engines."""
    cents = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal_c"),
    )
    avgpos = cents.filter(F.col("bal_c") > 0).agg(
        F.avg(F.col("bal_c").cast("double")).alias("__a")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    lapsed = cents.join(recent, cents["c_custkey"] == recent["o_custkey"], "left_anti")
    return (
        lapsed.crossJoin(F.broadcast(avgpos))
        .filter(F.col("bal_c").cast("double") > F.col("__a"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("bal_c").cast("long").alias("totacctbal_c"),
        )
    )


@register(
    "tpch_q11_value_concentration",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS value_e4
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, value_e4
    FROM val
    WHERE CAST(value_e4 AS DOUBLE) >
          (SELECT CAST(SUM(value_e4) AS DOUBLE) * CAST(1.5 AS DOUBLE) / COUNT(*) FROM val)
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (partsupp value adapted to lineitem revenue): parts
    holding more than 1.5x the MEAN part value -- a per-group aggregate
    filtered against a scalar derived from the global total of the SAME
    aggregate.  (TPC-H's fixed 0.01%% fraction is vacuous on the
    near-uniform fixture -- 0 rows at every SF, which would pass the
    oracle trivially; the mean-relative cut keeps ~1%% of parts at any
    scale.)  The total is a 1-row broadcast; per-part values are exact
    e4 integers, and both engines evaluate the identical double
    expression (sum * 1.5 / count, all three operands exact), so the cut
    is deterministic."""
    price_e4 = F.floor(F.col("l_extendedprice") * 10000 + F.lit(0.5)).cast("long")
    val = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(price_e4).cast("long").alias("value_e4"))
    )
    tot = val.agg(
        (F.sum("value_e4").cast("double") * F.lit(1.5) / F.count(F.lit(1))).alias("__t")
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_e4").cast("double") > F.col("__t"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_e4")
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH pairs AS (
      SELECT l_partkey, l_suppkey,
             CAST(MIN(CAST(FLOOR(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS BIGINT)
               AS cost_e4
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    esupp AS (
      SELECT s.s_suppkey, s.s_name, n.n_name,
             CAST(FLOOR(s.s_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'),
    ep AS (
      SELECT p.p_partkey, pr.l_suppkey, pr.cost_e4
      FROM pairs pr
      JOIN part p ON pr.l_partkey = p.p_partkey
      JOIN esupp e ON pr.l_suppkey = e.s_suppkey
      WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'),
    minc AS (SELECT p_partkey, MIN(cost_e4) AS min_e4 FROM ep GROUP BY p_partkey)
    SELECT e.bal_c, e.s_name, e.n_name, ep.p_partkey, ep.cost_e4
    FROM ep
    JOIN minc ON ep.p_partkey = minc.p_partkey AND ep.cost_e4 = minc.min_e4
    JOIN esupp e ON ep.l_suppkey = e.s_suppkey
    ORDER BY e.bal_c DESC, e.s_name, ep.p_partkey LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (partsupp supply cost adapted to the cheapest observed
    line price per part-supplier pair): for each qualifying part, the
    region-eligible supplier(s) achieving the minimum cost -- the
    correlated MIN subquery decorrelated into a per-part min joined back.
    Costs/balances are exact integers (e4 / cents) so the min-equality
    test is engine-independent; (s_name, p_partkey) makes the top-100
    order total.  nation/region broadcast (bounded); supplier/part stay
    AQE-planned (SF-scaled)."""
    price_e4 = F.floor(F.col("l_extendedprice") * 10000 + F.lit(0.5)).cast("long")
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(price_e4).cast("long").alias("cost_e4"))
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = (
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    )
    esupp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal_c"),
        )
    )
    parts = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    ep = (
        pairs.join(parts, pairs["l_partkey"] == parts["p_partkey"])
        .join(esupp.select("s_suppkey"), pairs["l_suppkey"] == F.col("s_suppkey"), "left_semi")
        .select("p_partkey", "l_suppkey", "cost_e4")
    )
    minc = ep.groupBy(F.col("p_partkey").alias("__pk")).agg(F.min("cost_e4").alias("__min_e4"))
    df = (
        ep.join(minc, (ep["p_partkey"] == F.col("__pk")) & (ep["cost_e4"] == F.col("__min_e4")))
        .join(esupp, ep["l_suppkey"] == esupp["s_suppkey"])
        .select("bal_c", "s_name", "n_name", "p_partkey", "cost_e4")
    )
    return df.orderBy(F.desc("bal_c"), F.asc("s_name"), F.asc("p_partkey")).limit(100)


@register(
    "tpch_q20_promotion_suppliers",
    oracle="""
    WITH sm AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    pairq AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total,
             CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                            AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_1996
      FROM lineitem JOIN sm ON l_partkey = sm.p_partkey
      GROUP BY l_partkey, l_suppkey)
    SELECT s.s_name, CAST(FLOOR(s.s_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM pairq WHERE 5 * qty_1996 > qty_total)
    ORDER BY s.s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (availqty-vs-shipped adapted to 1996-concentration: a
    part-supplier pair qualifies when 1996 shipments exceed 20%% of its
    all-time total -- a minority, mirroring Q20's rare-pass threshold):
    the quantity-threshold semi-join chain part -> pair aggregate ->
    supplier, then a bounded region filter.  Integral quantities sum as
    longs and the threshold is cross-multiplied (5*q96 > total), so no
    division touches the cut.  Two conditional sums in ONE pass over the
    pair groups -- never two scans of lineitem."""
    sm = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    in_1996 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    qty = F.col("l_quantity").cast("long")
    pair_ok = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(sm, F.col("l_partkey") == sm["p_partkey"], "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qty).cast("long").alias("qty_total"),
            F.sum(F.when(in_1996, qty).otherwise(F.lit(0))).cast("long").alias("qty_1996"),
        )
        .filter(F.lit(5) * F.col("qty_1996") > F.col("qty_total"))
        .select("l_suppkey")
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = (
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    df = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(pair_ok, F.col("s_suppkey") == pair_ok["l_suppkey"], "left_semi")
        .select(
            "s_name",
            F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal_c"),
        )
    )
    return df.orderBy("s_name")


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT order_year,
           {{share}} AS mkt_share_pct
    FROM (
      SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
             SUM(CASE WHEN sn.n_name = 'NATION_3' THEN {_SQL_REV_E4} ELSE 0 END)
               AS nat_e4,
             SUM({_SQL_REV_E4}) AS tot_e4
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'ASIA'
      GROUP BY YEAR(o.o_orderdate))
    """.format(
        share="CAST(FLOOR((100.0 * CAST(nat_e4 AS DOUBLE) / CAST(tot_e4 AS DOUBLE))"
        " * 10000 + 0.5) AS BIGINT) / 10000.0"
    ),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one supplier nation's share of a region's yearly revenue
    -- nation joined under two roles (customer side filters the region,
    supplier side tags the share numerator), then a ratio of conditional
    sums per year.  Exact-e4 numerator/denominator + half-up floor at
    4dp, identical double expression both engines.  Hints only on the
    bounded nation/region dims; customer/supplier stay AQE-planned."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    region = (
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    df = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), cust["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_reg") == region["r_regionkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(sn), supp["s_nationkey"] == F.col("sn_key"))
    )
    nat_e4 = F.when(F.col("supp_nation") == "NATION_3", _rev_e4()).otherwise(
        F.lit(0).cast("long")
    )
    yearly = df.groupBy(F.year("o_orderdate").cast("long").alias("order_year")).agg(
        F.sum(nat_e4).alias("nat_e4"), F.sum(_rev_e4()).alias("tot_e4")
    )
    share = F.lit(100.0) * F.col("nat_e4").cast("double") / F.col("tot_e4").cast("double")
    from ..operators.textstats import round_half_up

    return yearly.select("order_year", round_half_up(share, 4).alias("mkt_share_pct"))


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           CAST(YEAR(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT)
                    - CAST(FLOOR(p.p_retailprice * l.l_quantity * 10000 + 0.5) AS BIGINT))
                AS BIGINT) AS profit_e4
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_type = 'STANDARD'
    GROUP BY sn.n_name, YEAR(o.o_orderdate)
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year over a 5-way
    join (retailprice*quantity stands in for the missing
    ps_supplycost*quantity).  Per-row revenue and cost each floor to
    exact e4 before the subtraction, so the grouped sums are exact
    integers on both engines.  part/supplier un-hinted (SF-scaled);
    nation broadcast."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_retailprice")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost_e4 = F.floor(F.col("p_retailprice") * F.col("l_quantity") * 10000 + F.lit(0.5)).cast(
        "long"
    )
    df = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    )
    return df.groupBy(
        F.col("n_name").alias("supp_nation"),
        F.year("o_orderdate").cast("long").alias("order_year"),
    ).agg(F.sum(_rev_e4() - cost_e4).cast("long").alias("profit_e4"))
