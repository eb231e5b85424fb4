"""Window-function operators (SURVEY.md section 2.5, W0).

The reference has no window functions; the domain implies them (latest
checkpoint per shipment, courier rankings, rolling delivery averages --
SURVEY section 2.5).  All of these shuffle once on the partition key; at
scale, pre-bucketing fact tables on the key removes even that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Top-1 per group: 'latest checkpoint per shipment' shape.  row_number
    (not rank) guarantees exactly one survivor; pass tie-breakers in
    ``order_by`` for determinism."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def rank_by(df: DataFrame, order_by: list[Column], alias: str, dense: bool = False) -> DataFrame:
    """Global ranking (courier leaderboard shape).  Single-partition window
    -- only valid on aggregated/dim-sized input, never raw facts."""
    w = Window.orderBy(*order_by)
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(alias, fn.over(w))


def rolling_avg(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    value_col: str,
    window_rows: int,
    alias: str,
) -> DataFrame:
    """Trailing N-row average per key (rolling 7-day delivery avg shape)."""
    w = Window.partitionBy(*keys).orderBy(*order_by).rowsBetween(-(window_rows - 1), 0)
    return df.withColumn(alias, F.round(F.avg(value_col).over(w), 2))


def running_sum(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    value_col: str,
    alias: str,
) -> DataFrame:
    """Cumulative sum per key."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(alias, F.round(F.sum(value_col).over(w), 2))


def lag_delta_days(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    ts_col: str,
    alias: str,
) -> DataFrame:
    """Days since the previous row per key (inter-arrival shape)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    prev = F.lag(F.col(ts_col)).over(w)
    return df.withColumn(alias, F.datediff(F.col(ts_col).cast("date"), prev.cast("date")))
