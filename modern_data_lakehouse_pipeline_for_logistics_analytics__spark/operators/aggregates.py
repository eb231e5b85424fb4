"""Aggregation operators (SURVEY.md section 2.4, A1-A10).

The reference's one real aggregate is the courier-metrics shape at
`Gold_layer/starschema.py:137-145`: groupBy one key, countDistinct +
conditional count + avg, then a derived percentage column.  That shape is
generalized here, plus the scale variants the reference lacks
(approx_count_distinct, rollup/cube/grouping sets).

Physical notes (verified via .explain("formatted")):
  - ``group_metrics`` plans as partial HashAggregate -> Exchange -> final
    HashAggregate; the countDistinct forces Spark's two-phase distinct
    expansion.  Map-side partial aggregation means the shuffle carries
    pre-combined state, not raw rows -- this is what survives a 100x
    scale-up.
  - ``group_metrics_approx`` swaps countDistinct for HLL++
    (approx_count_distinct), collapsing the distinct expansion into a single
    aggregation pass -- the 100 TB default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_metrics(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    cond: Column,
    avg_col: str,
) -> DataFrame:
    """Reference courier-metrics shape (`starschema.py:137-145`):

    per group: exact distinct count, conditional count, 2dp average, and a
    derived success percentage.  Output columns: ``<group_col>, total_cnt,
    matched_cnt, avg_val, matched_pct``.
    """
    out = df.groupBy(group_col).agg(
        F.countDistinct(distinct_col).alias("total_cnt"),
        F.count(F.when(cond, True)).alias("matched_cnt"),
        F.round(F.avg(avg_col), 2).alias("avg_val"),
    )
    return out.withColumn(
        "matched_pct", F.round(F.col("matched_cnt") / F.col("total_cnt") * 100, 2)
    )


def group_metrics_approx(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    cond: Column,
    avg_col: str,
    rsd: float = 0.01,
) -> DataFrame:
    """A2 scale variant: HLL++ approximate distinct count (single-pass,
    no distinct expansion, fixed-size sketch per group)."""
    out = df.groupBy(group_col).agg(
        F.approx_count_distinct(distinct_col, rsd).alias("total_cnt"),
        F.count(F.when(cond, True)).alias("matched_cnt"),
        F.round(F.avg(avg_col), 2).alias("avg_val"),
    )
    return out.withColumn(
        "matched_pct", F.round(F.col("matched_cnt") / F.col("total_cnt") * 100, 2)
    )


def conditional_count(df: DataFrame, group_col: str, cond: Column, alias: str) -> DataFrame:
    """A3: COUNT(*) FILTER (WHERE cond) per group."""
    return df.groupBy(group_col).agg(F.count(F.when(cond, True)).alias(alias))


def rollup_metrics(df: DataFrame, keys: list[str], agg_col: str) -> DataFrame:
    """A10: hierarchical subtotals (GROUP BY ROLLUP).  Spark plans one
    Expand + single shuffle -- cheaper than N separate groupBys."""
    return df.rollup(*keys).agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.round(F.sum(agg_col), 2).alias("sum_val"),
        F.grouping_id(*keys).alias("grp_id"),
    )


def cube_metrics(df: DataFrame, keys: list[str], agg_col: str) -> DataFrame:
    """A10: full cross-tab subtotals (GROUP BY CUBE)."""
    return df.cube(*keys).agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.round(F.sum(agg_col), 2).alias("sum_val"),
        F.grouping_id(*keys).alias("grp_id"),
    )


def heavy_hitters(
    df: DataFrame, col: str, min_share: float
) -> DataFrame:
    """EXACT heavy hitters (items with frequency > ``min_share`` of rows)
    at approximate-pass cost -- the candidates-then-verify motif the LSH
    family uses, applied to frequency:

    1. ``stat.freqItems`` (one-pass Karp/Misra-Gries, JVM-side) returns a
       SUPERSET of every item above the support -- it can only
       over-report, never miss;
    2. exact counts run ONLY for those candidates (a filtered aggregate
       -- the second scan reads one column and keeps candidate rows);
    3. the true threshold prunes the false positives.

    So the output is deterministic and exactly equal to the full
    ``GROUP BY ... HAVING`` answer, but the unfiltered aggregate over the
    (possibly enormous) item domain never runs.  Output:
    ``item, n, share`` (share = 4dp half-up, cross-engine exact).
    """
    cands = df.stat.freqItems([col], support=min_share).first()[0]
    n_total = df.count()
    floor_n = int(n_total * min_share)
    from .textstats import round_half_up

    exact = (
        df.filter(F.col(col).isin(list(cands)))
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") > floor_n)
    )
    return exact.select(
        "item", "n", round_half_up(F.col("n") / F.lit(float(n_total)), 4).alias("share")
    )


def quantile_bucketize(
    df: DataFrame, col: str, probs: list[float]
) -> DataFrame:
    """Discretize ``col`` into quantile bins (QuantileDiscretizer shape,
    but EXACT and SQL-replayable).

    Edges are ``percentile_disc`` values -- actual data points, so edge
    comparisons are exact double equality on both engines (no
    interpolation ulps; same reasoning as ``percentile_disc_prices``).
    The edge row is a broadcast 1-row cross join (the scalar-subquery
    idiom TPC-H q11/q14 use); bin assignment is a codegen CASE chain
    ``1 + Σ (col > edge_i)``.  Two passes total: one aggregate for the
    edges, one scan for the assignment -- no per-row sort, no driver
    loop.  Output adds an integer ``bin`` column (1..len(probs)+1).

    The edges come from ONE array-argument percentile_disc: N scalar
    percentile_disc calls each run their own ObjectAggregate over a full
    copy of the column (measured 4.3x slower at sf0.1 for deciles); the
    array form collects the column once and answers every quantile from
    the same buffer.

    NULL ``col`` -> NULL ``bin``: NULLs never participated in the edge
    computation (percentile_disc skips them), so assigning them a bin
    would be a lie -- before r8 every NULL comparison fell through to
    ``otherwise(0)`` and NULLs silently landed in bin 1.  Oracles over
    nullable columns must carry the same ``CASE WHEN x IS NULL THEN NULL``
    guard.
    """
    plist = ", ".join(repr(float(p)) for p in probs)
    edges = df.agg(
        F.expr(f"percentile_disc(array({plist})) WITHIN GROUP (ORDER BY {col})").alias(
            "__edges"
        )
    ).select(*[F.col("__edges")[i].alias(f"__e{i}") for i in range(len(probs))])
    binned = df.crossJoin(F.broadcast(edges))
    bin_expr = F.lit(1)
    for i in range(len(probs)):
        bin_expr = bin_expr + F.when(F.col(col) > F.col(f"__e{i}"), 1).otherwise(0)
    bin_expr = F.when(F.col(col).isNull(), F.lit(None)).otherwise(bin_expr)
    return binned.withColumn("bin", bin_expr.cast("long")).drop(
        *[f"__e{i}" for i in range(len(probs))]
    )


def quantile_edges_distributed(
    df: DataFrame, col: str, probs: list[float], num_partitions: int = 32
) -> list[float]:
    """Exact percentile_disc edges WITHOUT the single-buffer collect.

    ``percentile_disc`` is exact but plans as an ObjectAggregate whose
    final merge holds every value of the column in ONE buffer -- fine at
    bench scale, a memory wall on a 100 TB fact column.  This computes
    the identical edges with bounded memory everywhere:

      1. collapse to (value, count) -- duplicates vanish, the heavy
         shuffle carries distinct values only;
      2. range-bucket values with ``range_partition_ids`` (pure function
         of the value -- stable across the two jobs, unlike
         ``repartitionByRange``'s per-job sampling);
      3. per-bucket totals -> driver (``num_partitions`` ints, metadata)
         -> prefix offsets;
      4. per-bucket cumulative counts (window partitioned by bucket) +
         broadcast offsets = each value's GLOBAL rank; the edge for
         probability p is the min value whose rank reaches
         ``ceil(p * n)`` -- one final aggregate row.

    Ranks use Fraction arithmetic (``ceil(0.3 * 1000)`` in floats is
    301); equality with ``percentile_disc`` is pinned by
    ``tests/test_coverage3.py``.
    """
    import math
    from fractions import Fraction

    from .windows import range_partition_ids
    from pyspark.sql import Window

    spark = df.sparkSession
    vals = (
        df.select(F.col(col).alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    ranged = range_partition_ids(vals, "__v", num_partitions, desc=False)
    totals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid").agg(F.sum("__cnt").alias("t")).collect()
    }
    n = sum(totals.values())
    if n == 0:
        return [None] * len(probs)
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    w = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.sum("__cnt").over(w) + F.col("__off")).alias("__cum")
    ranked = ranged.join(F.broadcast(off_df), "__pid").select("__v", cum)
    ranks = [max(1, math.ceil(Fraction(str(p)) * n)) for p in probs]
    row = ranked.agg(
        *[F.min(F.when(F.col("__cum") >= r, F.col("__v"))).alias(f"e{i}") for i, r in enumerate(ranks)]
    ).first()
    return [row[f"e{i}"] for i in range(len(probs))]
