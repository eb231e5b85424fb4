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
