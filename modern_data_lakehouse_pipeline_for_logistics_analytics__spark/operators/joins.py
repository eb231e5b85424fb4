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

    Algorithm: union both sides tagged, one window per key ordered by
    (ts, side, tie-breakers), fill the right payload with
    last_value(ignoreNulls) -- ONE shuffle on the key and O(n log n)
    work.  A join-then-top-1 formulation materializes every (left row x
    earlier right row) pair first, which explodes on keys with long
    history; this never does.

    The entire right row is packed into ONE struct column and filled with
    a single ``last(struct, ignorenulls=True)``: filling each right column
    independently would back-fill a NULL payload cell from an OLDER right
    row, emitting a mixed row that never existed (a matched right row with
    a NULL column must surface that NULL).

    Left/right column names must be disjoint.  Deterministic: ties on
    ``right_ts`` break by ``tie_breakers`` (greatest wins).
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"asof_join requires disjoint column names; overlap: {overlap}")

    import pyspark.sql.types as T

    r_struct = T.StructType([right.schema[c] for c in right.columns])
    l_tag = left.select(
        left[left_key].alias("__k"),
        left[left_ts].alias("__ts"),
        # left sorts BEFORE right at equal ts when strict (so it cannot
        # see an equal-ts right row), AFTER when inclusive.
        F.lit(0 if strict else 1).alias("__side"),
        *[left[c] for c in left.columns],
        F.lit(None).cast(r_struct).alias("__rrow"),
    )
    r_tag = right.select(
        right[right_key].alias("__k"),
        right[right_ts].alias("__ts"),
        F.lit(1 if strict else 0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.struct(*[right[c] for c in right.columns]).alias("__rrow"),
    )
    unioned = l_tag.unionByName(r_tag)

    order = [F.col("__ts").asc(), F.col("__side").asc()] + [
        F.col("__rrow").getField(c).asc_nulls_first() for c in (tie_breakers or [])
    ]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        F.last(F.col("__rrow"), ignorenulls=True).over(w).alias("__rrow"),
    )
    is_left = F.col("__side") == (0 if strict else 1)
    matched = filled.filter(is_left & F.col("__rrow").isNotNull())
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__rrow").getField(c).alias(c) for c in right.columns],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    cell: int,
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Interval-overlap join with coarse-cell blocking -- the primitive
    behind time-range correlation (shipments active during an outage,
    sessions overlapping a deploy window).

    ``range_join`` expresses overlap as a theta join, which Spark
    executes as [broadcast-]nested-loop when there is no equi key -- the
    correct plan only while one side is small.  This version makes the
    join EQUI at any scale: every interval explodes to the coarse cells
    it spans (``start//cell .. end//cell``, integer units), candidates
    join on cell (+ optional equi keys), pairs dedupe, and the exact
    predicate ``l_start <= r_end AND r_start <= l_end`` verifies.
    Overlapping intervals always share the cell containing their overlap
    -- candidates are COMPLETE -- so blocking changes cost, never the
    answer (the LSH/spatial candidates-then-verify motif on the time
    axis).

    Bounds/columns are INTEGER units (epoch days/seconds); rows per
    interval = span/cell + 1, so pick ``cell`` near the typical span.
    Left/right column names must be disjoint.  Output: all left + right
    columns for each overlapping pair, deduplicated.

    Hot-cell caveat: per-cell cost is left_count x right_count, the same
    Σ bucket² shape as every blocking join here -- but overlap is EXACT
    semantics, so (unlike LSH/fuzzy) a silent drop guard would be wrong.
    A degenerate cell (millions of intervals crossing one boundary)
    needs a different plan: composite equi keys to split the domain, or
    a sort-merge interval join.  AQE's skew-join split handles moderate
    cases automatically since the candidate join IS an equi join.
    """
    cells = lambda s, e: F.explode(  # noqa: E731
        F.sequence((F.col(s) / cell).cast("long"), (F.col(e) / cell).cast("long"))
    )
    lkeys = equi_keys or []
    lc = left.withColumn("__cell", cells(l_start, l_end))
    rc = right.withColumn("__cell", cells(r_start, r_end))
    cands = lc.join(rc, on=["__cell", *lkeys]).drop("__cell")
    verified = cands.filter(
        (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    )
    return verified.distinct()
