"""Join operators (SURVEY.md section 2.3).

The reference contains **no joins** (J0 negative finding) -- its star schema
defers fact<->dim joins to warehouse consumption (`README.md:41-43`).  This
module ships the join surface that consumption requires, Spark-first:

  - ``dim_join``: broadcast hash join for fact->dim enrichment.  Dims are
    small by construction (distinct natural keys, `starschema.py:75-96`), so
    the build side ships to every executor and the fact side never shuffles
    -- the only join strategy that survives a 100 TB fact table.
  - ``semi_join`` / ``anti_join``: existence checks (orphan-dim audits)
    without payload duplication -- left_semi/left_anti never widen rows.
  - ``range_join``: equi-key + interval residual (checkpoint_time within
    [created_at, updated_at] validation, SURVEY section 2.3).  Keeping the
    equi key in the ON clause keeps this a hash/SMJ join with a residual
    filter, never a cartesian BNLJ.
  - ``asof_join``: "latest event per entity as of t" -- the reference's
    checkpoints[last] semantics (`Bronze_layer/extraction.py:80-94`).
    Composed as equi-join + residual + window top-1; at scale prefer
    bucketing both sides on the key so the join and the window share one
    shuffle (AQE coalesces the rest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact->dim enrichment join; broadcasts the dim by default."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """Rows of ``left`` with at least one match (EXISTS)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """Rows of ``left`` with no match (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join with an interval residual predicate."""
    return left.join(right, equi & lower & upper, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    tie_breakers: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (``< left_ts`` when ``strict`` -- required for
    self-as-of so a row cannot match itself) sharing the key (inner
    semantics: left rows with no prior right row drop out).

    Deterministic: ties on ``right_ts`` break by ``tie_breakers`` descending.
    """
    cmp = (
        right[right_ts] < left[left_ts] if strict else right[right_ts] <= left[left_ts]
    )
    joined = left.join(
        right,
        (left[left_key] == right[right_key]) & cmp,
        "inner",
    )
    order = [right[right_ts].desc()] + [right[c].desc() for c in (tie_breakers or [])]
    w = Window.partitionBy(*[left[c] for c in left.columns]).orderBy(*order)
    return joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
