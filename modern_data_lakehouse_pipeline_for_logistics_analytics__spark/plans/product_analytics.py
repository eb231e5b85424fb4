"""Product-analytics shapes over the events fixture: funnel conversion
and cohort retention -- the sequence/temporal aggregations BI consumption
of an event stream implies (SURVEY sections 2.4/2.5 extensions).

Both are single-shuffle-per-stage window/aggregate pipelines; no joins
against the raw stream are needed (self-join funnel formulations explode
on hot users)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import read_events, register

# Shared conversion-path CTE text -- the SQL twin of
# `operators/timeseries.py::conversion_paths`, written ONCE so the
# attribution / journey / Shapley oracles cannot drift from each other
# (r10 review finding: the block was copy-pasted into three oracles).
_PATHS_G_CTE = """
    g AS (
      SELECT user_id, event_id, ts, event_type, value,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id
                     ORDER BY ts DESC, event_id DESC) AS grp
      FROM events)"""

_PATHS_GG_CTE = (
    _PATHS_G_CTE
    + """,
    gg AS (
      SELECT user_id, grp, event_id, ts, event_type,
             CAST(FLOOR(MAX(CASE WHEN event_type = 'purchase'
                                 THEN value END)
                        OVER (PARTITION BY user_id, grp)
                        * 100.0 + 0.5) AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id, grp) AS BIGINT) AS n_t
      FROM g WHERE grp > 0)"""
)


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'view') AS t_view,
             MIN(ts) FILTER (WHERE event_type = 'click') AS t_click,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id),
    flags AS (
      SELECT user_id,
             CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS s1,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END AS s2,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view
                   AND t_purchase > t_click THEN 1 ELSE 0 END AS s3
      FROM per_user)
    SELECT CAST(SUM(s1) AS BIGINT) AS n_view,
           CAST(SUM(s2) AS BIGINT) AS n_view_click,
           CAST(SUM(s3) AS BIGINT) AS n_view_click_purchase
    FROM flags
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per-user earliest
    timestamps per stage in ONE aggregation, strict ordering between
    stages.  No stream self-join (the naive per-stage-join funnel is
    O(events^2) on hot users); one shuffle on user_id, then a global
    1-row rollup."""
    e = read_events(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.sum(s1.cast("int")).cast("long").alias("n_view"),
        F.sum(s2.cast("int")).cast("long").alias("n_view_click"),
        F.sum(s3.cast("int")).cast("long").alias("n_view_click_purchase"),
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, CAST(DATE_TRUNC('week', e.ts) AS DATE) AS act_week
      FROM events e),
    joined AS (
      SELECT f.cohort_week,
             CAST(DATE_DIFF('week', f.cohort_week, a.act_week) AS BIGINT) AS week_no,
             a.user_id
      FROM activity a JOIN firsts f ON a.user_id = f.user_id)
    SELECT cohort_week, week_no,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM joined GROUP BY 1, 2
    """,
)
def q_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    per weeks-since-cohort.

    Aggregate-first shape (r7): events collapse to (user, act_week) in
    ONE hash aggregate -- map-side combine shrinks the stream to
    user-week rows BEFORE anything shuffles (the r6 plan windowed over
    raw events then paid a second full-width distinct).  The cohort week
    is then a window min over those tiny rows (week truncation is
    monotonic, so min(act_week) == week of min(ts)), and the final count
    is a plain count: each (user, act_week) row is unique by
    construction, so no countDistinct expand is needed."""
    e = read_events(spark, sf_dir)
    uw = (
        e.select("user_id", F.date_trunc("week", "ts").cast("date").alias("act_week"))
        .groupBy("user_id", "act_week")
        .agg(F.count(F.lit(1)).alias("__n"))
        .drop("__n")
    )
    w = Window.partitionBy("user_id")
    weekly = uw.withColumn("cohort_week", F.min("act_week").over(w))
    week_no = (
        F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        weekly.withColumn("week_no", week_no)
        .groupBy("cohort_week", "week_no")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


@register(
    "attribution_position_value",
    oracle=f"""
    WITH {_PATHS_GG_CTE},
    touch AS (
      SELECT event_type, cents, n_t,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id, grp
                                     ORDER BY ts, event_id) AS BIGINT) AS p
      FROM gg WHERE event_type <> 'purchase'),
    w AS (
      SELECT event_type, cents,
             CAST(CASE WHEN n_t = 1 THEN 1000000
                       WHEN n_t = 2 THEN 500000
                       WHEN p = 1 OR p = n_t THEN 400000
                       ELSE 200000 // GREATEST(n_t - 2, 1)
                            + CASE WHEN p - 1 <= 200000 % GREATEST(n_t - 2, 1)
                                   THEN 1 ELSE 0 END
                  END AS BIGINT) AS wt
      FROM touch)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(cents * wt) AS BIGINT) AS attributed_microcents
    FROM w GROUP BY event_type
    """,
)
def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each purchase's
    value is split across the user's touches since the previous purchase
    -- 40% first touch, 40% last, 20% spread over the middles (100% /
    50-50 for 1- and 2-touch paths) -- the marketing-analytics read of
    an event stream (which channel gets credit for conversions).

    Exact arithmetic end-to-end: purchase value rounds half-up to cents
    ONCE, weights are integer micro-shares whose per-path sum is exactly
    1,000,000 (the middle remainder goes to the earliest middles, one
    micro each), and attribution is BIGINT cents x micro -- no float
    splits, so the per-type totals replay exactly anywhere.

    Scale shape: conversion paths form with ONE descending cumulative
    sum per user (no stream self-join -- the naive per-purchase join is
    O(events^2) on hot users); the path's purchase value and touch count
    ride the same rows as (user, grp) window aggregates.  All four
    windows cluster on user_id, so the whole plan is a single Exchange;
    the final rollup is a few-row hash aggregate
    (`operators/timeseries.py::position_attribution`)."""
    from ..operators.timeseries import position_attribution

    return position_attribution(read_events(spark, sf_dir))


@register(
    "journey_top_paths",
    oracle=f"""
    WITH {_PATHS_GG_CTE},
    paths AS (
      SELECT user_id, grp,
             string_agg(event_type, '->' ORDER BY ts, event_id) AS path,
             MAX(cents) AS cents
      FROM gg WHERE event_type <> 'purchase'
      GROUP BY user_id, grp)
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM paths GROUP BY path
    ORDER BY n_conversions DESC, path LIMIT 20
    """,
)
def q_journey_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top converting journeys: the ordered touch-type sequence of each
    conversion path (same path construction as
    ``attribution_position_value``), counted and revenue-summed, top 20
    by frequency.  The product-analytics read: which exact sequences of
    interactions lead to purchases.

    Scale shape: one user-clustered Exchange builds paths; the
    per-path sequence is an array_sort over a collect_list bounded by
    the path length (events between two consecutive purchases of one
    user -- the usual hot-key caveat, nothing else scales with total
    rows); paths then hash-aggregate to distinct sequences and a
    TakeOrderedAndProject keeps 20.  Determinism: ties inside a path
    break on (ts, event_id); equal-frequency paths rank by path text.
    Path construction is the shared
    `operators/timeseries.py::conversion_paths`."""
    from ..operators.timeseries import conversion_paths

    gg = conversion_paths(read_events(spark, sf_dir), value_col="value")
    paths = (
        gg.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "__grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                "->",
            ).alias("path"),
            F.max("__cents").alias("cents"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy(F.desc("n_conversions"), F.asc("path"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Shapley channel attribution + hash-split A/B z-test
# --------------------------------------------------------------------------

_SHAPLEY_CHANNELS = ["view", "click", "error", "signup"]


def _shapley_oracle() -> str:
    from math import factorial

    from ..operators.experiments import _popcount_sql

    ordered = sorted(_SHAPLEY_CHANNELS)
    n = len(ordered)
    case_bits = " ".join(
        f"WHEN '{c}' THEN {1 << i}" for i, c in enumerate(ordered)
    )
    in_list = ", ".join(f"'{c}'" for c in ordered)
    values = ", ".join(
        f"('{c}', CAST({1 << i} AS BIGINT))" for i, c in enumerate(ordered)
    )
    wt_cases = " ".join(
        f"WHEN {k} THEN {factorial(k) * factorial(n - 1 - k)}"
        for k in range(n)
    )
    popcnt = _popcount_sql("v1.t", n)
    return f"""
    WITH {_PATHS_G_CTE},
    masks AS (
      SELECT user_id, grp,
             CAST(bit_or(CASE event_type {case_bits} END) AS BIGINT) AS m
      FROM g
      WHERE grp > 0 AND event_type <> 'purchase'
        AND event_type IN ({in_list})
      GROUP BY user_id, grp),
    cm AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c_m FROM masks GROUP BY m),
    lat AS (SELECT CAST(range AS BIGINT) AS t FROM range(0, {1 << n})),
    vt AS (SELECT t, CAST(COALESCE(SUM(c_m), 0) AS BIGINT) AS v
           FROM lat LEFT JOIN cm ON (m & t) = m GROUP BY t),
    chan AS (SELECT * FROM (VALUES {values}) AS c(channel, b)),
    pairs AS (
      SELECT chan.channel,
             CAST(CASE CAST(({popcnt}) AS INT) {wt_cases} END AS BIGINT) AS w,
             v1.v AS v_t, v2.v AS v_tb
      FROM chan
      JOIN vt v1 ON (v1.t & chan.b) = 0
      JOIN vt v2 ON v2.t = v1.t + chan.b)
    SELECT channel, CAST(SUM(w * (v_tb - v_t)) AS BIGINT) AS phi_xnfact
    FROM pairs GROUP BY channel
    """


@register("shapley_channel_attribution", oracle=_shapley_oracle())
def q_shapley_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value credit per touch channel over conversion-path
    channel sets -- the order-independent counterpart to the position
    attribution query; pure-BIGINT lattice arithmetic, credits reported
    x n! (`operators/experiments.py::shapley_channel_attribution`)."""
    from ..operators.experiments import shapley_channel_attribution

    return shapley_channel_attribution(
        read_events(spark, sf_dir), _SHAPLEY_CHANNELS
    )


@register(
    "abtest_hash_split_purchase",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id),
    units AS (
      SELECT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 2, 15)
                  AS BIGINT) % 2 AS variant,
             converted
      FROM per_user),
    agg AS (
      SELECT
        CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_ctl,
        CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT)
          AS conv_ctl,
        CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_trt,
        CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT)
          AS conv_trt
      FROM units)
    SELECT n_ctl, conv_ctl, n_trt, conv_trt,
      CASE WHEN n_ctl > 0 AND n_trt > 0 THEN
        CAST(FLOOR((CAST(conv_trt AS DOUBLE) / CAST(n_trt AS DOUBLE)
                    - CAST(conv_ctl AS DOUBLE) / CAST(n_ctl AS DOUBLE))
                   * 1000000.0 + 0.5) AS BIGINT)
      ELSE NULL END AS lift_micro,
      CASE WHEN n_ctl > 0 AND n_trt > 0
            AND conv_ctl + conv_trt > 0
            AND conv_ctl + conv_trt < n_ctl + n_trt THEN
        CAST(FLOOR(
          (CAST(conv_trt AS DOUBLE) / CAST(n_trt AS DOUBLE)
           - CAST(conv_ctl AS DOUBLE) / CAST(n_ctl AS DOUBLE))
          / sqrt(
            (CAST(conv_ctl + conv_trt AS DOUBLE)
             / CAST(n_ctl + n_trt AS DOUBLE))
            * (CAST(1.0 AS DOUBLE) - CAST(conv_ctl + conv_trt AS DOUBLE)
               / CAST(n_ctl + n_trt AS DOUBLE))
            * (CAST(1.0 AS DOUBLE) / CAST(n_ctl AS DOUBLE)
               + CAST(1.0 AS DOUBLE) / CAST(n_trt AS DOUBLE)))
          * 1000000.0 + 0.5) AS BIGINT)
      ELSE NULL END AS z_micro
    FROM agg
    """,
)
def q_abtest_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B readout with a deterministic hash split: users bucket into
    control/treatment by the portable 60-bit md5 hash (the split any
    engine can replay), conversion = ever purchased; pooled
    two-proportion z and absolute lift in half-up micro units
    (`operators/experiments.py::two_proportion_ztest`).  sqrt is the
    only non-rational step and IEEE-754 rounds it correctly on both
    engines."""
    from ..operators.dedup import portable_base_hash
    from ..operators.experiments import two_proportion_ztest

    per_user = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
    )
    units = per_user.withColumn(
        "variant",
        F.pmod(portable_base_hash(F.col("user_id").cast("string")), F.lit(2)),
    )
    return two_proportion_ztest(units, "variant", "converted")


def _ttc_oracle() -> str:
    from ..operators.sketches import hdr_bounds_sql, hdr_bucket_sql

    b = hdr_bucket_sql("secs", div="//")
    lo, hi = hdr_bounds_sql("bucket", div="//")
    return f"""
    WITH per_user AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'view') AS t_view,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id),
    deltas AS (
      SELECT CAST(date_diff('second', t_view, t_purchase) AS BIGINT)
               AS secs
      FROM per_user
      WHERE t_view IS NOT NULL AND t_purchase > t_view),
    regs AS (
      SELECT CAST({b} AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM deltas GROUP BY 1),
    cum AS (
      SELECT bucket, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n_total
      FROM regs),
    qs(q_label, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10)),
    hits AS (
      SELECT q_label, n_total, CAST(MIN(bucket) AS BIGINT) AS bucket
      FROM cum CROSS JOIN qs
      WHERE cum >= (num * n_total + den - 1) // den
      GROUP BY q_label, n_total)
    SELECT q_label, n_total, bucket,
           CAST({lo} AS BIGINT) AS est_lo,
           CAST({hi} AS BIGINT) AS est_hi
    FROM hits
    """


@register("funnel_time_to_convert_hdr", oracle=_ttc_oracle())
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per-user first-view -> first-
    purchase delay in seconds, summarized by the HDR quantile sketch
    (p50/p90 with <= 1/16 relative bounds) -- sketch composition over
    the funnel instead of a global sort of deltas."""
    from ..operators.sketches import hdr_quantiles, hdr_registers

    e = read_events(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    deltas = per_user.filter(
        F.col("t_view").isNotNull()
        & (F.col("t_purchase") > F.col("t_view"))
    ).select(
        (
            F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view")
        ).cast("long").alias("secs")
    )
    # hdr_registers with no group cols is already per-bucket -- no merge
    # needed (the r10 review caught a redundant identity re-aggregate).
    regs = hdr_registers(deltas, [], "secs")
    return hdr_quantiles(regs, [("p50", 1, 2), ("p90", 9, 10)])
