"""Event-time window plans (SURVEY.md section 2.9, T5).

The reference has no event-time processing -- its incrementality is daily
batch re-runs (T1/T2).  These plans give the events fixture the tumbling /
sliding / session-window surface; the same expressions run under Structured
Streaming (streaming/ module) where the batch plans here double as the
batch-equivalence oracle.

Money-like ``value`` sums use exact integer cents (see windows.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import read_events, register


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


@register(
    "tumbling_hourly_counts",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events GROUP BY 1, 2
    """,
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: tumbling 1-hour event-time window.  ``F.window`` starts are
    epoch-aligned, identical to DATE_TRUNC for hour buckets."""
    e = read_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents("value")).alias("sum_value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value_cents")
    )


@register(
    "sliding_2h_hop_1h",
    oracle="""
    WITH assigned AS (
      SELECT DATE_TRUNC('hour', ts) AS window_start, value FROM events
      UNION ALL
      SELECT DATE_TRUNC('hour', ts) - INTERVAL 1 HOUR AS window_start, value FROM events)
    SELECT window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM assigned GROUP BY window_start
    """,
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: sliding window (2h length, 1h hop) -- each event lands in two
    windows; the oracle materializes the same assignment with a UNION."""
    e = read_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents("value")).alias("sum_value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value_cents")
    )


@register(
    "session_windows_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events),
    numbered AS (
      SELECT user_id, ts,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: session windows (30-minute inactivity gap) per user.  Spark's
    ``session_window`` vs the oracle's gaps-and-islands construction --
    same session boundaries by definition."""
    e = read_events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


@register(
    "daily_incremental_counts",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def q_daily_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: the reference's daily-batch grain (`orchestration.py:90-91`) as a
    single partitioned aggregation -- what each per-date re-run computes,
    done once over all dates."""
    e = read_events(spark, sf_dir)
    return e.groupBy(
        F.to_date("ts").alias("event_date"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
