"""Logistics-domain KPI queries -- the reference's own analytics
vertical, generalized: ABC (Pareto) inventory classification, OTIF
delivery performance, item-item recommendations, and a seasonal
decomposition of daily revenue.

All four follow the repo's exact-arithmetic discipline: money in
e4 fixed-point BIGINT (`plans/tpch2._rev_e4` convention), ratios as
half-up micro units via integer `div`, cosines with one terminal
half-up rounding over IEEE-exact doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, table_path

_REV_E4 = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "lineitem"))


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "orders"))


@register(
    "abc_part_classification",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey, CAST(SUM({_REV_E4}) AS BIGINT) AS rev_e4
      FROM lineitem GROUP BY l_partkey),
    cum AS (
      SELECT l_partkey, rev_e4,
             CAST(SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS cum_e4,
             CAST(SUM(rev_e4) OVER () AS BIGINT) AS tot_e4
      FROM pr),
    cls AS (
      SELECT CASE WHEN cum_e4 * 5 <= tot_e4 * 4 THEN 'A'
                  WHEN cum_e4 * 20 <= tot_e4 * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev_e4, tot_e4
      FROM cum)
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_e4) AS BIGINT) AS class_rev_e4,
           CAST((2 * (SUM(rev_e4) // 10000) * 1000000
                 + (MAX(tot_e4) // 10000))
                // (2 * (MAX(tot_e4) // 10000)) AS BIGINT) AS rev_share_micro
    FROM cls GROUP BY abc_class
    """,
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by revenue,
    class A while the running share stays <= 80%, B to 95%, C beyond --
    the stocking-policy split every warehouse runs.

    Exactness: revenue in e4 fixed-point BIGINT; class boundaries are
    INTEGER cross-multiplications (cum*5 <= tot*4), never a float share
    (a float boundary can flip the part sitting exactly on 80%); the
    reported share rounds half-up to micro by integer div over
    DOLLAR-TRUNCATED sums (e4 sums overflowed 2e6x multiplication at
    sf0.01 -- dollars keep 2*s*1e6 under 2^63 to ~$4.6e12 total).
    Headroom on the class boundary itself: tot_e4*20 < 2^63 while
    total revenue < ~4.6e16 e4-units.

    Scale shape: the per-part aggregate is map-side combinable; the
    GLOBAL running sum uses the two-phase range-partition prefix-sum
    (`operators/windows.py::global_cumsum` -- per-partition window +
    broadcast offsets, one bounded P-row collect), NOT a single-task
    Window.orderBy; the classifier is pure codegen and the final rollup
    is 3 rows."""
    from ..operators.dedup import _cache_aged
    from ..operators.windows import global_cumsum

    pr = (
        _lineitem(spark, sf_dir)
        .groupBy("l_partkey")
        .agg(F.expr(f"CAST(SUM({_REV_E4}) AS BIGINT)").alias("rev_e4"))
    )
    # Four consumers read pr (the split-point probe and offset collect
    # inside global_cumsum, the cum branch, and the total) -- cache it
    # once or the fact-table scan+aggregate runs four times.
    pr = _cache_aged("abc_pr", pr)
    cum = global_cumsum(
        pr,
        order_by=[F.desc("rev_e4"), F.asc("l_partkey")],
        range_col="rev_e4",
        value_col="rev_e4",
        alias="cum_e4",
        range_desc=True,
    )
    tot = pr.agg(F.sum("rev_e4").cast("long").alias("tot_e4"))
    cls = cum.crossJoin(F.broadcast(tot)).withColumn(
        "abc_class",
        F.when(F.col("cum_e4") * 5 <= F.col("tot_e4") * 4, "A")
        .when(F.col("cum_e4") * 20 <= F.col("tot_e4") * 19, "B")
        .otherwise("C"),
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("rev_e4").cast("long").alias("class_rev_e4"),
        F.expr(
            "CAST((2 * (SUM(rev_e4) DIV 10000) * 1000000"
            " + (MAX(tot_e4) DIV 10000))"
            " DIV (2 * (MAX(tot_e4) DIV 10000)) AS BIGINT)"
        ).alias("rev_share_micro"),
    )


@register(
    "otif_supplier_month",
    oracle="""
    WITH j AS (
      SELECT l.l_suppkey,
             CAST(DATE_TRUNC('month', o.o_orderdate) AS DATE) AS month,
             CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                  THEN 1 ELSE 0 END AS on_time,
             CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
                   AND l.l_returnflag <> 'R' THEN 1 ELSE 0 END AS otif
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT l_suppkey, month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST((2 * SUM(on_time) * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS on_time_micro,
           CAST((2 * SUM(otif) * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS otif_micro
    FROM j GROUP BY l_suppkey, month
    """,
)
def q_otif_supplier_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTIF (on-time-in-full) per supplier-month: share of lines shipped
    within the 30-day SLA of the order date, and the stricter OTIF share
    (on time AND not returned) -- the core logistics delivery KPI
    (receipt/commit dates adapted to the fixture's shipdate-vs-orderdate
    the same way `tpch_q21` adapts).

    Exactness: flag counts are exact; both shares are half-up micro via
    integer div.  Scale shape: the orders->lineitem equi-join shuffles
    on orderkey (co-partitioned/bucketed tables make it Exchange-free;
    AQE broadcasts the filtered side at small SF), then one map-side-
    combinable aggregate on (supplier, month)."""
    l = _lineitem(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_returnflag"
    )
    o = _orders(spark, sf_dir).select("o_orderkey", "o_orderdate")
    j = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.when(
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            1,
        )
        .otherwise(0)
        .alias("on_time"),
        F.when(
            (
                F.col("l_shipdate")
                <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            )
            & (F.col("l_returnflag") != "R"),
            1,
        )
        .otherwise(0)
        .alias("otif"),
    )
    return j.groupBy("l_suppkey", "month").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.expr(
            "CAST((2 * SUM(on_time) * 1000000 + COUNT(*))"
            " DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("on_time_micro"),
        F.expr(
            "CAST((2 * SUM(otif) * 1000000 + COUNT(*))"
            " DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("otif_micro"),
    )


_ITEMCF_SUPPORT = 3
_ITEMCF_K = 5


@register(
    "itemcf_part_recommendations",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_i
           FROM items GROUP BY item),
    freq AS (SELECT item FROM ic WHERE n_i >= {_ITEMCF_SUPPORT}),
    pi AS (SELECT basket, item FROM items JOIN freq USING (item)),
    prs AS (
      SELECT a.item AS item_a, b.item AS item_b
      FROM pi a JOIN pi b ON a.basket = b.basket AND a.item < b.item),
    cnt AS (
      SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM prs GROUP BY item_a, item_b
      HAVING COUNT(*) >= {_ITEMCF_SUPPORT}),
    sym AS (
      SELECT item_a AS item, item_b AS neighbor, n_ab FROM cnt
      UNION ALL
      SELECT item_b AS item, item_a AS neighbor, n_ab FROM cnt),
    sc AS (
      SELECT s.item, s.neighbor, s.n_ab,
             CAST(FLOOR(CAST(s.n_ab AS DOUBLE)
                  / sqrt(CAST(i1.n_i AS DOUBLE) * CAST(i2.n_i AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS cos_micro
      FROM sym s
      JOIN ic i1 ON i1.item = s.item
      JOIN ic i2 ON i2.item = s.neighbor),
    rk AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY item
                     ORDER BY cos_micro DESC, neighbor) AS BIGINT) AS rank
      FROM sc)
    SELECT item, neighbor, n_ab, cos_micro, rank
    FROM rk WHERE rank <= {_ITEMCF_K}
    """,
)
def q_itemcf_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Ships-with" part recommendations: top-5 co-occurrence-cosine
    neighbors per part over order baskets, A-Priori-pruned at support 3
    (`operators/mining.py::itemcf_topk`)."""
    from ..operators.mining import itemcf_topk

    # max_basket_items=None: the oracle's pair CTE has no basket cap, so
    # the Spark side must not cap either (a capped side silently drops
    # pairs the oracle keeps once a basket exceeds the cap -- r10 review
    # finding).  Order baskets are <= 7 lines here; a production caller
    # with unbounded baskets should keep the operator's default cap.
    return itemcf_topk(
        _lineitem(spark, sf_dir),
        "l_orderkey",
        "l_partkey",
        min_support=_ITEMCF_SUPPORT,
        k=_ITEMCF_K,
        max_basket_items=None,
    )


# Shared daily-revenue + centered-7-day-trend CTE text: the SQL twin of
# `_daily_detrended` below, written once for the seasonal decomposition
# and the anomaly query (same single-source discipline as _PATHS_G_CTE).
_DAILY_DET_CTES = f"""
    daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             CAST(SUM({_REV_E4}) AS BIGINT) AS rev_e4
      FROM lineitem GROUP BY 1),
    tr AS (
      SELECT d, rev_e4,
             CAST(SUM(rev_e4) OVER w AS BIGINT) AS s7,
             CAST(COUNT(*) OVER w AS BIGINT) AS c7
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
      SELECT d, rev_e4,
             rev_e4 - CAST((2 * s7 + 7) // 14 AS BIGINT) AS det_e4
      FROM tr WHERE c7 = 7)"""


def _daily_detrended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily e4 revenue with the centered-7-day half-up trend removed
    (full windows only): ``d, rev_e4, det_e4``.  The day series is
    post-aggregate (365 rows/yr), so the single-task trend window is
    the right plan."""
    from pyspark.sql import Window

    daily = (
        _lineitem(spark, sf_dir)
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.expr(f"CAST(SUM({_REV_E4}) AS BIGINT)").alias("rev_e4"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.withColumn(
        "s7", F.sum("rev_e4").over(w).cast("long")
    ).withColumn("c7", F.count(F.lit(1)).over(w).cast("long"))
    return tr.filter(F.col("c7") == 7).select(
        "d",
        "rev_e4",
        (
            F.col("rev_e4") - F.expr("CAST((2 * s7 + 7) DIV 14 AS BIGINT)")
        ).alias("det_e4"),
    )


@register(
    "seasonal_decompose_daily_revenue",
    oracle=f"""
    WITH {_DAILY_DET_CTES},
    dows AS (
      SELECT CAST((dayofweek(d) + 6) % 7 AS BIGINT) AS dow, det_e4
      FROM det)
    SELECT dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(det_e4) AS BIGINT) AS sum_det_e4,
           CAST(SUM(det_e4) // COUNT(*) AS BIGINT) AS seasonal_e4
    FROM dows GROUP BY dow
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average seasonal decomposition of daily revenue: trend =
    centered 7-day mean (half-up e4, full windows only), seasonal =
    per-weekday mean of the detrended series -- the classical
    decomposition a capacity planner reads for day-of-week shape.

    Determinism: revenue in e4 BIGINT; the trend divides half-up by
    integer arithmetic; the per-dow seasonal mean divides with `div`
    (truncation toward zero -- identical in Spark and DuckDB, probed --
    documented rather than half-up because detrended sums are signed).
    dow is 0=Monday via Spark `weekday` / DuckDB (dayofweek+6)%7 (their
    native DAYOFWEEK bases differ).

    Scale shape: the only scan-scale stage is the daily aggregate
    (map-side combinable); the trend/seasonal windows run over ONE ROW
    PER DAY -- a bounded series (365/yr) where a single-task window is
    the right plan, not a bottleneck.  Daily/trend construction is the
    shared `_daily_detrended`."""
    det = _daily_detrended(spark, sf_dir).select(
        F.expr("CAST(weekday(d) AS BIGINT)").alias("dow"), "det_e4"
    )
    return det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("det_e4").cast("long").alias("sum_det_e4"),
        F.expr("CAST(SUM(det_e4) DIV COUNT(*) AS BIGINT)").alias("seasonal_e4"),
    )


# --------------------------------------------------------------------------
# Geofence assignment (exact integer ray casting)
# --------------------------------------------------------------------------

_GRID_SCALE = 1_000_000
_FENCES: dict[str, list[tuple[int, int]]] = {
    "zone_a": [(100000, 100000), (400000, 150000), (250000, 450000)],
    "zone_b": [
        (300000, 300000),
        (700000, 320000),
        (680000, 640000),
        (320000, 600000),
    ],
    "zone_c": [
        (500000, 50000),
        (800000, 120000),
        (900000, 400000),
        (700000, 550000),
        (550000, 300000),
    ],
}


def _geofence_oracle() -> str:
    edge_rows = []
    for fid, verts in _FENCES.items():
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
            edge_rows.append(f"('{fid}', {x1}, {y1}, {x2}, {y2})")
    edges = ", ".join(edge_rows)
    fl = ", ".join(f"('{fid}')" for fid in sorted(_FENCES))
    xy = (
        "CAST(('0x' || substring(md5('x:' || CAST(c_custkey AS VARCHAR)), 2, 15))"
        f" AS BIGINT) % {_GRID_SCALE} AS x,"
        " CAST(('0x' || substring(md5('y:' || CAST(c_custkey AS VARCHAR)), 2, 15))"
        f" AS BIGINT) % {_GRID_SCALE} AS y"
    )
    return f"""
    WITH pts AS (SELECT c_custkey, {xy} FROM customer),
    edges(fence_id, x1, y1, x2, y2) AS (VALUES {edges}),
    par AS (
      SELECT p.c_custkey, e.fence_id, COUNT(*) AS k
      FROM pts p CROSS JOIN edges e
      WHERE (e.y1 > p.y) <> (e.y2 > p.y)
        AND ((e.x2 - e.x1) * (p.y - e.y1) - (p.x - e.x1) * (e.y2 - e.y1))
            * (CASE WHEN e.y2 > e.y1 THEN 1 ELSE -1 END) > 0
      GROUP BY p.c_custkey, e.fence_id),
    ins AS (SELECT fence_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM par WHERE k % 2 = 1 GROUP BY fence_id),
    fl(fence_id) AS (VALUES {fl})
    SELECT fl.fence_id, CAST(COALESCE(ins.n, 0) AS BIGINT) AS n_inside
    FROM fl LEFT JOIN ins ON fl.fence_id = ins.fence_id
    """


@register("geofence_customer_zones", oracle=_geofence_oracle())
def q_geofence_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery-zone assignment: customers (deterministic hash-derived
    integer coordinates, same convention as `spatial_nearest_supplier`)
    counted per literal polygon fence by exact integer ray casting --
    no float geometry anywhere
    (`operators/spatial.py::point_in_polygon_counts`)."""
    from ..operators.spatial import hashed_coords, point_in_polygon_counts

    cust = hashed_coords(
        spark.read.parquet(table_path(sf_dir, "customer")).select("c_custkey"),
        "c_custkey",
        _GRID_SCALE,
    )
    return point_in_polygon_counts(cust, _FENCES, "c_custkey")


@register(
    "dp_noisy_orders_by_priority",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM orders GROUP BY o_orderpriority),
    h AS (
      SELECT *,
             CAST(('0x' || substring(md5('r10dp' || chr(31)
                   || COALESCE(CAST(o_orderpriority AS VARCHAR),
                               chr(0) || 'null')), 2, 15)) AS BIGINT)
             % 4503599627370496 AS hh
      FROM g)
    SELECT o_orderpriority, n_exact,
      CAST(n_exact * 1000000000 + CAST(FLOOR(
        -CAST(1.0 AS DOUBLE)
        * (CASE WHEN hh >= 2251799813685248 THEN 1.0 ELSE -1.0 END)
        * ln(CAST(1 AS DOUBLE)
             - 2.0 * abs((CAST(hh AS DOUBLE) + 0.5)
                         / CAST(4503599627370496 AS DOUBLE) - 0.5))
        * 1000000000.0 + 0.5) AS BIGINT) AS BIGINT) AS noisy_count_nano
    FROM h
    """,
)
def q_dp_noisy_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-noised order counts per priority (epsilon = 1): the DP
    release arithmetic with hash-derived deterministic noise so the
    whole release replays bit-for-bit -- salt rotation / true RNG is the
    documented production swap point
    (`operators/privacy.py::dp_noisy_counts`)."""
    from ..operators.privacy import dp_noisy_counts

    return dp_noisy_counts(
        spark.read.parquet(table_path(sf_dir, "orders")),
        ["o_orderpriority"],
        epsilon=1.0,
        salt="r10dp",
    )


# --------------------------------------------------------------------------
# Business-day SLA + safety stock
# --------------------------------------------------------------------------


def _sla_oracle() -> str:
    from ..operators.timeseries import sql_business_days

    bd_ship = sql_business_days("l.l_shipdate", engine="duckdb")
    bd_order = sql_business_days("o.o_orderdate", engine="duckdb")
    return f"""
    WITH j AS (
      SELECT o.o_orderpriority,
             ({bd_ship}) - ({bd_order}) AS bd
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(bd) AS BIGINT) AS sum_bd,
           CAST(MAX(bd) AS BIGINT) AS max_bd,
           CAST((2 * SUM(bd) * 1000000 + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS avg_bd_micro
    FROM j GROUP BY o_orderpriority
    """


@register("sla_business_days_by_priority", oracle=_sla_oracle())
def q_sla_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping delay in BUSINESS days (Mon-Fri) per order priority --
    the SLA the ops team actually quotes.  The weekday count is a
    CLOSED FORM per date (5 * weeks + clamped partial week from a fixed
    epoch Monday -- `operators/timeseries.py::business_days_expr`), so
    the delay is O(1) exact BIGINT per row: no per-row calendar arrays,
    no holiday table scan (holiday calendars join in as a tiny
    broadcast dim when a deployment needs them).

    Scale shape: one orderkey equi-join, then a map-side-combinable
    5-row aggregate; the mean is half-up micro by integer div."""
    from ..operators.timeseries import business_days_expr

    l = _lineitem(spark, sf_dir).select("l_orderkey", "l_shipdate")
    o = _orders(spark, sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        (
            business_days_expr("l_shipdate")
            - business_days_expr("o_orderdate")
        ).alias("bd"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("bd").cast("long").alias("sum_bd"),
        F.max("bd").cast("long").alias("max_bd"),
        F.expr(
            "CAST((2 * SUM(bd) * 1000000 + COUNT(*))"
            " DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("avg_bd_micro"),
    )


import math as _math

# z(95%) * sqrt(lead time of 7 days): ONE Python-computed literal shared
# by both engines (repr = shortest round-trip double), so neither engine
# computes sqrt(7) itself.
_SS_ZL = repr(1.645 * _math.sqrt(7.0))


@register(
    "safety_stock_parts",
    oracle=f"""
    WITH daily AS (
      SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2),
    st AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(q) AS BIGINT) AS sum_q,
             CAST(SUM(q * q) AS BIGINT) AS sum_q2
      FROM daily GROUP BY l_partkey)
    SELECT l_partkey, n_days,
           CAST((2 * sum_q * 1000000 + n_days)
                // (2 * n_days) AS BIGINT) AS mean_demand_micro,
           CAST(FLOOR(CAST({_SS_ZL} AS DOUBLE)
                * sqrt(CAST(n_days * sum_q2 - sum_q * sum_q AS DOUBLE))
                / CAST(n_days AS DOUBLE)
                * 1000000.0 + 0.5) AS BIGINT) AS safety_stock_micro
    FROM st
    """,
)
def q_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock per part: z(95%) * sqrt(lead time) * sigma of daily
    demand over the part's observed demand days -- the reorder-point
    buffer every inventory policy carries.

    Exactness: daily demand is integer units, so the variance numerator
    ``n * sum(q^2) - sum(q)^2`` is exact BIGINT; sigma enters through
    ONE IEEE sqrt (correctly rounded on both engines) and the z *
    sqrt(L) factor is a shared Python literal -- one terminal half-up
    micro rounding.  The mean is half-up micro by integer div.

    Scale shape: two map-side-combinable aggregates (lineitem ->
    (part, day) -> part); nothing else.  Population sigma over observed
    demand days (zero-demand days are a date-spine join a deployment
    adds when its calendar says so)."""
    daily = (
        _lineitem(spark, sf_dir)
        .groupBy(
            "l_partkey", F.col("l_shipdate").cast("date").alias("d")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q")
        )
    )
    st = daily.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("q").cast("long").alias("sum_q"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sum_q2"),
    )
    return st.select(
        "l_partkey",
        "n_days",
        F.expr(
            "CAST((2 * sum_q * 1000000 + n_days)"
            " DIV (2 * n_days) AS BIGINT)"
        ).alias("mean_demand_micro"),
        F.expr(
            f"CAST(FLOOR(CAST({_SS_ZL} AS DOUBLE)"
            f" * sqrt(CAST(n_days * sum_q2 - sum_q * sum_q AS DOUBLE))"
            f" / CAST(n_days AS DOUBLE)"
            f" * 1000000.0D + 0.5D) AS BIGINT)"
        ).alias("safety_stock_micro"),
    )


@register(
    "seasonal_anomaly_days",
    oracle=f"""
    WITH {_DAILY_DET_CTES},
    med AS (
      SELECT det_e4 AS v,
             ROW_NUMBER() OVER (ORDER BY det_e4, d) AS rn,
             COUNT(*) OVER () AS n
      FROM det),
    m1 AS (SELECT v AS med FROM med WHERE rn = (n + 1) // 2),
    dev AS (
      SELECT det.d, det.rev_e4, det.det_e4,
             ABS(det.det_e4 - m1.med) AS adev
      FROM det CROSS JOIN m1),
    med2 AS (
      SELECT adev, d,
             ROW_NUMBER() OVER (ORDER BY adev, d) AS rn,
             COUNT(*) OVER () AS n
      FROM dev),
    m2 AS (SELECT adev AS mad FROM med2 WHERE rn = (n + 1) // 2)
    SELECT dev.d, dev.rev_e4, dev.det_e4
    FROM dev CROSS JOIN m2
    WHERE dev.adev > 3 * m2.mad
    """,
)
def q_seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly days: detrend daily revenue (shared
    `_daily_detrended`), then flag days whose deviation from the median
    detrended value exceeds 3x the MAD -- the robust alert rule that
    survives both trend drift (removed by the MA) and heavy tails
    (median/MAD, not mean/stddev).

    Exactness: detrended values are BIGINT; medians are exact
    rank-selected elements (lower median at rank (n+1) div 2,
    deterministic (value, day) tie-break); the 3x MAD threshold is an
    integer comparison.  No float enters the rule.

    Scale shape: everything after the daily aggregate operates on the
    bounded day series (row_number windows over ~hundreds of rows);
    both medians broadcast as single-row frames."""
    from pyspark.sql import Window

    det = _daily_detrended(spark, sf_dir)
    w1 = Window.orderBy("det_e4", "d")
    med = (
        det.withColumn("rn", F.row_number().over(w1))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("det_e4").alias("med"))
    )
    dev = det.crossJoin(F.broadcast(med)).withColumn(
        "adev", F.abs(F.col("det_e4") - F.col("med"))
    )
    w2 = Window.orderBy("adev", "d")
    mad = (
        dev.withColumn("rn", F.row_number().over(w2))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("adev").alias("mad"))
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .filter(F.col("adev") > 3 * F.col("mad"))
        .select("d", "rev_e4", "det_e4")
    )


@register(
    "theilsen_daily_revenue_trend",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             CAST(SUM({_REV_E4}) AS BIGINT) AS rev_e4
      FROM lineitem GROUP BY 1),
    idx AS (
      SELECT rev_e4,
             CAST(date_diff('day', DATE '1992-01-06', d) AS BIGINT) AS x
      FROM daily),
    slopes AS (
      SELECT CAST(((b.rev_e4 - a.rev_e4) * 1000
                   + (CASE WHEN b.rev_e4 >= a.rev_e4 THEN 1 ELSE -1 END)
                     * (b.x - a.x) // 2)
                  // (b.x - a.x) AS BIGINT) AS slope_milli
      FROM idx a JOIN idx b ON b.x > a.x),
    ranked AS (
      SELECT slope_milli,
             ROW_NUMBER() OVER (ORDER BY slope_milli) AS rn,
             COUNT(*) OVER () AS n
      FROM slopes)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2
                    THEN slope_milli END) AS BIGINT) AS slope_lo_milli,
           CAST(MAX(CASE WHEN rn = n // 2 + 1
                    THEN slope_milli END) AS BIGINT) AS slope_hi_milli
    FROM ranked
    """,
)
def q_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the median of all
    pairwise slopes -- the estimator that shrugs off the outlier days a
    least-squares fit chases (complement to the median/MAD anomaly
    rule).  Reports BOTH middle order statistics (lower/upper median)
    so even-count medians need no cross-engine averaging.

    Exactness: slopes are half-up MILLI-e4-units-per-day fixed point
    computed in pure integer arithmetic -- (dy * 1000 + sign * dx/2)
    / dx with dx > 0, where the sign term makes truncation toward zero
    equal half-up rounding for either dy sign; median selection is an
    exact rank pick over ROW_NUMBER.

    Scale shape, stated honestly: the pair join is O(days^2) -- ~3M
    pairs for a decade of days -- which is fine BECAUSE it runs on the
    post-aggregate day series, never on raw rows; for multi-decade
    second-granularity series, subsample pairs or use the repeated-
    median variant.  The day aggregate is the only row-scale stage.
    Median selection (r12) goes histogram -> distributed prefix sum
    (``global_cumsum``) -> min-value-at-rank: the previous global
    ``row_number`` window sorted all ~3M slope rows in ONE task (7.4s
    materialized at sf0.1 -> 2.5s), exactly the single-task pattern the
    partitioned primitives exist to avoid."""
    from ..operators.windows import global_cumsum

    daily = (
        _lineitem(spark, sf_dir)
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.expr(f"CAST(SUM({_REV_E4}) AS BIGINT)").alias("rev_e4"))
    )
    idx = daily.select(
        "rev_e4",
        F.expr(
            "CAST(datediff(d, DATE'1992-01-06') AS BIGINT)"
        ).alias("x"),
    )
    a = idx.select(F.col("rev_e4").alias("ya"), F.col("x").alias("xa"))
    b = idx.select(F.col("rev_e4").alias("yb"), F.col("x").alias("xb"))
    slopes = a.join(b, F.col("xb") > F.col("xa")).select(
        F.expr(
            "CAST(((yb - ya) * 1000"
            " + (CASE WHEN yb >= ya THEN 1 ELSE -1 END) * (xb - xa) DIV 2)"
            " DIV (xb - xa) AS BIGINT)"
        ).alias("slope_milli")
    )
    # Exact order statistics without a global sort: per-value counts,
    # a distributed prefix sum over the value order, then the k-th
    # statistic is the least value whose cumulative count reaches k.
    # The histogram feeds FOUR consumers (the cumsum's split-point
    # action, its offsets collect, the final plan, and the total) --
    # cache it or the O(days^2) pair join replays per consumer.
    from ..operators.dedup import _cache_aged

    hist = _cache_aged(
        "theilsen_hist",
        slopes.groupBy("slope_milli").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        ),
    )
    cum = global_cumsum(
        hist, [F.asc("slope_milli")], "slope_milli", "cnt", alias="crank"
    )
    tot = hist.agg(F.sum("cnt").cast("long").alias("n"))
    return cum.crossJoin(F.broadcast(tot)).agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.min(
            F.when(F.col("crank") >= F.expr("(n + 1) div 2"), F.col("slope_milli"))
        ).cast("long").alias("slope_lo_milli"),
        F.min(
            F.when(F.col("crank") >= F.expr("n div 2 + 1"), F.col("slope_milli"))
        ).cast("long").alias("slope_hi_milli"),
    )


_SEG_SQL = (
    "CASE WHEN spend_e4 < 10000000000 THEN 'LOW'"
    " WHEN spend_e4 < 15000000000 THEN 'MID'"
    " ELSE 'HIGH' END"
)


@register(
    "segment_transition_halves",
    oracle=f"""
    WITH s AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate >= TIMESTAMP '1998-07-01'
                  THEN 1 ELSE 0 END AS h2,
             CAST(SUM({_REV_E4.replace('l_extendedprice * (1 - l_discount)',
                                       'o_totalprice')}) AS BIGINT)
               AS spend_e4
      FROM orders GROUP BY 1, 2),
    seg AS (SELECT o_custkey, h2, {_SEG_SQL} AS seg FROM s),
    tr AS (
      SELECT a.seg AS seg_from, b.seg AS seg_to
      FROM seg a JOIN seg b
        ON a.o_custkey = b.o_custkey AND a.h2 = 0 AND b.h2 = 1)
    SELECT seg_from, seg_to, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST((2 * COUNT(*) * 1000000
                 + SUM(COUNT(*)) OVER (PARTITION BY seg_from))
                // (2 * SUM(COUNT(*)) OVER (PARTITION BY seg_from))
                AS BIGINT) AS row_share_micro
    FROM tr GROUP BY seg_from, seg_to
    """,
)
def q_segment_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment transition matrix across the two halves of
    the order history (split 1998-07-01): exact e4 spend per customer
    per half, fixed LOW/MID/HIGH boundaries (~terciles, stable across
    SF), transition counts with half-up micro row shares -- the churn /
    upgrade read a retention team watches.  One map-side-combinable
    aggregate builds both halves; the transition join is per-customer."""
    o = _orders(spark, sf_dir)
    s = (
        o.groupBy(
            "o_custkey",
            (F.col("o_orderdate") >= F.lit("1998-07-01").cast("timestamp"))
            .cast("int")
            .alias("h2"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT))"
                " AS BIGINT)"
            ).alias("spend_e4")
        )
        .withColumn("seg", F.expr(_SEG_SQL))
    )
    a = s.filter(F.col("h2") == 0).select("o_custkey", F.col("seg").alias("seg_from"))
    b = s.filter(F.col("h2") == 1).select("o_custkey", F.col("seg").alias("seg_to"))
    from pyspark.sql import Window

    tr = a.join(b, "o_custkey").groupBy("seg_from", "seg_to").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    tot = F.sum("n_customers").over(Window.partitionBy("seg_from"))
    return (
        tr.withColumn("__t", tot.cast("long"))
        .select(
            "seg_from",
            "seg_to",
            "n_customers",
            F.expr(
                "CAST((2 * n_customers * 1000000 + __t)"
                " DIV (2 * __t) AS BIGINT)"
            ).alias("row_share_micro"),
        )
    )
