"""Lakehouse-maintenance plans: MERGE upsert, SCD2, correlation stats."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.maintenance import merge_upsert, scd2_from_events
from .registry import read_events, register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


@register(
    "merge_upsert_orders",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 3 <> 0),
    updates AS (
      SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0)
    SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice
    FROM target t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics (update + keep + insert) as one full-outer plan:
    target = keys not divisible by 3, updates = even keys doubled -- so
    the result exercises all three MERGE branches."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    target = o.filter(F.col("o_orderkey") % 3 != 0)
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
    )
    return merge_upsert(target, updates, key="o_orderkey")


@register(
    "scd2_user_event_type",
    oracle="""
    WITH runs AS (
      SELECT user_id, event_type, ts,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR event_type <> LAG(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    numbered AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM runs),
    intervals AS (
      SELECT user_id, run, event_type, MIN(ts) AS valid_from
      FROM numbered GROUP BY user_id, run, event_type)
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) IS NULL
             AS is_current
    FROM intervals
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension from an event history: validity intervals per run of
    equal attribute values (gaps-and-islands), open interval flagged
    current."""
    e = read_events(spark, sf_dir)
    return scd2_from_events(e, key="user_id", attr="event_type", ts="ts")


@register(
    "agg_corr_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS qty_price_cov,
           ROUND(VAR_SAMP(l_discount), 8) AS disc_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation, sample covariance, variance
    per group (dim-sized output; rounded to absorb summation-order ulps)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_cov"),
        F.round(F.var_samp("l_discount"), 8).alias("disc_var"),
    )


@register(
    "scd2_apply_segment_updates",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
           TIMESTAMP '2023-01-01 00:00:00' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to,
           CAST(1 AS BIGINT) AS is_current
    FROM customer WHERE c_custkey % 7 <> 0
    UNION ALL
    SELECT c_custkey, c_mktsegment,
           TIMESTAMP '2023-01-01 00:00:00',
           TIMESTAMP '2024-06-01 00:00:00',
           CAST(0 AS BIGINT)
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, 'MIGRATED',
           TIMESTAMP '2024-06-01 00:00:00',
           CAST(NULL AS TIMESTAMP),
           CAST(1 AS BIGINT)
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey + 1000000, 'NEWSEG',
           TIMESTAMP '2024-06-01 00:00:00',
           CAST(NULL AS TIMESTAMP),
           CAST(1 AS BIGINT)
    FROM customer WHERE c_custkey % 31 = 0
    """,
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 MERGE over a customer-segment dim: %7 keys change
    segment (close + new version), %13 keys arrive as NO-OP updates
    (same attrs -- must not create a spurious version), %31 keys appear
    as brand-new members.  The oracle constructs the expected dim
    directly, so any versioning mistake (double-close, missed no-op,
    dropped new key) hash-fails."""
    from ..operators.maintenance import scd2_apply

    c = _t(spark, sf_dir, "customer")
    dim = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("2023-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    ts = F.lit("2024-06-01 00:00:00").cast("timestamp")
    changed = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.lit("MIGRATED").alias("segment"),
        ts.alias("ts"),
    )
    noop = c.filter((F.col("c_custkey") % 13 == 0) & (F.col("c_custkey") % 7 != 0)).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        ts.alias("ts"),
    )
    newbies = c.filter(F.col("c_custkey") % 31 == 0).select(
        (F.col("c_custkey") + 1000000).alias("custkey"),
        F.lit("NEWSEG").alias("segment"),
        ts.alias("ts"),
    )
    updates = changed.unionByName(noop).unionByName(newbies)
    out = scd2_apply(dim, updates, key="custkey", attrs=["segment"], ts_col="ts")
    return out.select(
        "custkey", "segment", "valid_from", "valid_to",
        F.col("is_current").cast("long").alias("is_current"),
    )


@register(
    "gold_incremental_agg_state",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total,
           CAST(MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS vmin,
           CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS vmax
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental == full: fold the post-1996 order batch into the
    pre-1996 aggregate state and the result must hash-equal one full
    GROUP BY over all orders (the mergeability property the gold-layer
    maintenance pattern rests on).  Exact integer cents so the split
    point cannot introduce float summation-order drift."""
    from ..operators.maintenance import merge_agg_state

    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    src = o.select("o_orderpriority", "o_orderdate", cents.alias("price_c"))
    cut = F.lit("1996-01-01 00:00:00").cast("timestamp")
    history = src.filter(F.col("o_orderdate") < cut)
    batch = src.filter(F.col("o_orderdate") >= cut)
    state = history.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("price_c").alias("total"),
        F.min("price_c").alias("vmin"),
        F.max("price_c").alias("vmax"),
    )
    out = merge_agg_state(state, batch, keys=["o_orderpriority"], value_col="price_c")
    return out.select(
        "o_orderpriority",
        "cnt",
        F.col("total").cast("long").alias("total"),
        F.col("vmin").cast("long").alias("vmin"),
        F.col("vmax").cast("long").alias("vmax"),
    )


@register(
    "table_diff_orders_replica",
    oracle="""
    SELECT o_orderkey, 'changed' AS diff_status
    FROM orders WHERE o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey, 'only_in_a'
    FROM orders WHERE o_orderkey % 97 = 0
    UNION ALL
    SELECT o_orderkey + 50000000, 'only_in_b'
    FROM orders WHERE o_orderkey % 103 = 0
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile orders against a deterministically drifted replica:
    %101 keys changed priority, %97 keys missing from the replica, %103
    keys exist only there.  The oracle constructs the expected diff from
    the drift conditions, so a digest collision bug, a null-handling
    bug, or a dropped side hash-fails."""
    from ..operators.maintenance import table_diff

    o = _t(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    replica_changed = o.filter(F.col("o_orderkey") % 101 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.lit("9-DRIFTED").alias("o_orderpriority"),
    )
    replica_same = o.filter(
        (F.col("o_orderkey") % 101 != 0) & (F.col("o_orderkey") % 97 != 0)
    ).select("o_orderkey", *cols)
    replica_extra = o.filter(F.col("o_orderkey") % 103 == 0).select(
        (F.col("o_orderkey") + 50000000).alias("o_orderkey"), *cols
    )
    replica = replica_same.unionByName(
        replica_changed.filter(F.col("o_orderkey") % 97 != 0)
    ).unionByName(replica_extra)
    return table_diff(o, replica, key="o_orderkey", compare_cols=cols)


@register(
    "data_quality_rule_counts",
    oracle="""
    WITH agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_price_positive,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                             OR o_orderstatus IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_status_domain,
             CAST(SUM(CASE WHEN o_orderdate IS NULL
                             OR o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_date_sane
      FROM orders)
    SELECT 'price_positive' AS rule, v_price_positive AS n_violations, n_rows FROM agg
    UNION ALL
    SELECT 'status_domain', v_status_domain, n_rows FROM agg
    UNION ALL
    SELECT 'date_sane', v_date_sane, n_rows FROM agg
    """,
)
def q_rule_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three expectations over orders folded into ONE aggregate pass
    (price positivity, status domain, date sanity) -- N rules, one
    scan.  The fixture is clean, so violations are zero; the oracle
    still exercises the whole fold+stack shape."""
    from ..operators.validation import rule_violation_counts

    o = _t(spark, sf_dir, "orders")
    rules = {
        "price_positive": F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
        "status_domain": ~F.col("o_orderstatus").isin("O", "F", "P")
        | F.col("o_orderstatus").isNull(),
        "date_sane": F.col("o_orderdate").isNull()
        | (F.col("o_orderdate") < F.lit("1990-01-01 00:00:00").cast("timestamp")),
    }
    return rule_violation_counts(o, rules)


@register(
    "cdc_apply_order_changes",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders WHERE o_orderkey % 13 <> 0 AND o_orderkey % 11 <> 0
    UNION ALL
    SELECT o_orderkey, 'X'
    FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 13 <> 0
    UNION ALL
    SELECT o_orderkey + 90000000, 'N'
    FROM orders WHERE o_orderkey % 17 = 0
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC feed over an orders snapshot: %13 keys DELETE, %11 (minus the
    deleted) UPDATE to status 'X', %17 keys arrive as INSERTs under new
    ids; a superseded earlier update on the deleted keys proves
    latest-change-wins.  The oracle constructs the expected snapshot
    from the feed conditions."""
    from ..operators.maintenance import apply_changes

    o = _t(spark, sf_dir, "orders")
    target = o.select("o_orderkey", "o_orderstatus")
    t1 = F.lit("2024-06-01 00:00:00").cast("timestamp")
    t2 = F.lit("2024-06-02 00:00:00").cast("timestamp")
    stale_updates = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey", F.lit("STALE").alias("o_orderstatus"),
        F.lit("U").alias("op"), t1.alias("ts"),
    )
    deletes = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey", F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit("D").alias("op"), t2.alias("ts"),
    )
    updates = o.filter((F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 13 != 0)).select(
        "o_orderkey", F.lit("X").alias("o_orderstatus"),
        F.lit("U").alias("op"), t2.alias("ts"),
    )
    inserts = o.filter(F.col("o_orderkey") % 17 == 0).select(
        (F.col("o_orderkey") + 90000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit("I").alias("op"), t2.alias("ts"),
    )
    changes = stale_updates.unionByName(deletes).unionByName(updates).unionByName(inserts)
    return apply_changes(target, changes, key="o_orderkey")


# --------------------------------------------------------------------------
# Sort-key pruning audit (zone-map effectiveness per candidate layout)
# --------------------------------------------------------------------------

from datetime import date as _date

_PA_EPOCH = _date(1992, 1, 6)


def _pa_day(y: int, m: int, d: int) -> int:
    return (_date(y, m, d) - _PA_EPOCH).days


_PA_LAYOUTS = {
    "by_custkey": "k_cust",
    "by_orderdate": "k_day",
    "by_totalprice": "k_p4",
}
_PA_PROBES = [
    ("date_1996q1", "k_day", _pa_day(1996, 1, 1), _pa_day(1996, 3, 31)),
    ("date_1997h2", "k_day", _pa_day(1997, 7, 1), _pa_day(1997, 12, 31)),
    ("price_mid", "k_p4", 100000 * 10000, 150000 * 10000),
    ("price_low", "k_p4", 0, 20000 * 10000),
]
_PA_RPF = 1000


def _pa_oracle() -> str:
    base = (
        "SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS k_cust,"
        " CAST(date_diff('day', DATE '1992-01-06',"
        " CAST(o_orderdate AS DATE)) AS BIGINT) AS k_day,"
        " CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT) AS k_p4"
        " FROM orders"
    )
    parts = []
    ctes = [f"base AS ({base})"]
    for lname, scol in _PA_LAYOUTS.items():
        ctes.append(
            f"""f_{scol}_{lname} AS (
      SELECT ((rk - 1) // {_PA_RPF}) AS fid,
             MIN(k_day) AS mn_k_day, MAX(k_day) AS mx_k_day,
             MIN(k_p4) AS mn_k_p4, MAX(k_p4) AS mx_k_p4
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY {scol}, o_orderkey)
                      AS rk FROM base)
      GROUP BY 1)"""
        )
        for pid, pcol, lo, hi in _PA_PROBES:
            parts.append(
                f"""SELECT '{lname}' AS layout, '{pid}' AS pred_id,
       CAST(COUNT(*) AS BIGINT) AS files_total,
       CAST(SUM(CASE WHEN {lo} <= mx_{pcol} AND {hi} >= mn_{pcol}
                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST((2 * SUM(CASE WHEN {lo} <= mx_{pcol} AND {hi} >= mn_{pcol}
                     THEN 1 ELSE 0 END) * 1000000 + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS scan_share_micro
FROM f_{scol}_{lname}"""
            )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(parts)


@register("sortkey_pruning_audit", oracle=_pa_oracle())
def q_sortkey_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which clustering key earns its rewrite: simulate 1000-row files
    under three candidate sort keys and count the files each workload
    predicate's zone maps would prune -- exact global ranks via the
    two-phase prefix-sum, BIGINT zone-map overlap tests
    (`operators/layout.py::pruning_audit`)."""
    from ..operators.layout import pruning_audit

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("k_cust"),
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1992-01-06')"
            " AS BIGINT)"
        ).alias("k_day"),
        F.expr(
            "CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT)"
        ).alias("k_p4"),
    )
    # pruning_audit caches its projected input internally (one orders
    # scan instead of ~9 across the three layouts).
    return pruning_audit(
        base,
        "o_orderkey",
        _PA_LAYOUTS,
        ["k_day", "k_p4"],
        _PA_PROBES,
        rows_per_file=_PA_RPF,
    )
