"""2D skyline (Pareto frontier): the maximal points no other point
dominates -- "best price for the size", "largest order seen by that
date".  A classic operator relational engines lack as a primitive; the
naive formulation is the quadratic NOT EXISTS anti-join.

2D structure gives an O(n log n) plan: sort by (maximize DESC,
minimize ASC); a point is on the frontier iff its minimize-value is
STRICTLY below every earlier point's (a running-min test).  Distinct
value pairs make the tie cases exact: equal-max points order by min, so
the strictness of domination falls out of the running-min comparison.

Distributed shape (the repo's two-phase global-ordering scheme):

1. bucket points by ``range_partition_ids`` on the maximize column
   (pure function of the value, stable across jobs);
2. per-bucket local skyline via the windowed running-min test -- the
   global frontier is a SUBSET of the union of local frontiers
   (domination within a bucket already disqualifies globally);
3. the survivors (skyline-sized: ~O(log n) for independent dims) take
   one final windowed pass in a single partition -- bounded by the
   frontier size, not the input; a pathological fully-anticorrelated
   input where the frontier IS the input degrades to the sort, which is
   the information-theoretic floor for that shape.

All comparisons are on raw column values -- no floats introduced -- so
a DuckDB NOT EXISTS oracle replays the frontier exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import range_partition_ids


def _frontier_filter(df: DataFrame, part_cols: list[str], max_col: str, min_col: str) -> DataFrame:
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.desc(max_col), F.asc(min_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_min = F.min(min_col).over(w)
    return df.withColumn("__pm", prev_min).filter(
        F.col("__pm").isNull() | (F.col(min_col) < F.col("__pm"))
    ).drop("__pm")


def skyline_2d(
    df: DataFrame, max_col: str, min_col: str, num_partitions: int = 32
) -> DataFrame:
    """Distinct (max_col, min_col) pairs on the Pareto frontier
    (maximize ``max_col``, minimize ``min_col``)."""
    pts = df.select(max_col, min_col).distinct()
    ranged = range_partition_ids(pts, max_col, num_partitions, desc=True)
    local = _frontier_filter(ranged, ["__pid"], max_col, min_col).drop("__pid")
    # survivors are frontier-sized; the single-partition pass is bounded
    # by |local skylines|, never the input
    return _frontier_filter(local.withColumn("__g", F.lit(1)), ["__g"], max_col, min_col).drop(
        "__g"
    )
