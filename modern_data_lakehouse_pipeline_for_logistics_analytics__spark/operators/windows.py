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


def range_partition_ids(
    df: DataFrame, range_col: str, num_partitions: int, desc: bool = False
) -> DataFrame:
    """``df`` plus an ``__pid`` column assigning each row a range
    partition as a PURE FUNCTION of its ``range_col`` value.

    Approximate percentiles become literal split points in a when-chain
    -- crucially NOT ``repartitionByRange``, whose sampled boundaries
    differ between separate jobs over the same frame (fresh RDD ids
    re-sample; observed off-by-one buckets at sf0.01).  Split accuracy
    affects only load balance, never results.  Shared scaffolding of
    every two-phase global-ordering scheme (``global_ntile``,
    ``trainprep.pack_sequences``)."""
    P = num_partitions
    qs = [j / P for j in range(1, P)]
    splits_row = df.agg(F.percentile_approx(range_col, qs, 10000).alias("s")).first()
    splits = sorted(set(splits_row["s"] or []), reverse=desc)
    v = F.col(range_col)
    pid_expr = F.lit(len(splits))
    if splits:
        chain = F.when(v >= F.lit(splits[0]) if desc else v <= F.lit(splits[0]), 0)
        for i, s in enumerate(splits[1:], start=1):
            chain = chain.when(v >= F.lit(s) if desc else v <= F.lit(s), i)
        pid_expr = chain.otherwise(len(splits))
    return df.withColumn("__pid", pid_expr.cast("int"))


def _pid_offsets(ranged: DataFrame, value_col: str | None = None):
    """Per-range-partition prefix offsets -- the shared second phase of
    every two-phase global-ordering scheme (``global_ntile`` counts rows,
    ``global_cumsum`` sums ``value_col``).  One bounded collect (a row
    per partition, never per data row) folds into a tiny broadcastable
    ``(__pid, __off)`` frame; returns ``(off_df, grand_total)``."""
    spark = ranged.sparkSession
    measure = (
        F.count(F.lit(1)) if value_col is None else F.sum(value_col)
    ).cast("long")
    per_pid = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(measure.alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(per_pid):
        offsets.append((pid, acc))
        acc += per_pid[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    return off_df, acc


def global_ntile(
    df: DataFrame,
    order_by: list[Column],
    k: int,
    range_col: str,
    alias: str = "ntile",
    range_desc: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """NTILE(k) over a GLOBAL ordering without a single-task sort.

    A bare ``Window.orderBy`` funnels the whole table through one task --
    fine for dim-sized input, a serialization wall on a fact table.  This
    computes the identical result distributed:

      1. approximate percentiles of ``range_col`` (one tiny agg job at
         plan-build time) become literal split points;
      2. each row's range partition is a PURE FUNCTION of its value
         (a when-chain over the splits) -- crucially NOT
         ``repartitionByRange``, whose sampled boundaries differ between
         the offsets job and the main job (separate jobs re-shuffle with
         fresh RDD ids; observed off-by-one buckets at sf0.01);
      3. per-partition ``row_number`` + broadcast per-partition offsets
         -> exact global rank;
      4. NTILE's exact bucket arithmetic (first ``n % k`` buckets get one
         extra row) applied to the global rank.

    ``order_by`` must be a TOTAL order whose leading key is ``range_col``
    (ties on ``range_col`` land in one partition, so skew follows value
    ties -- acceptable for measure-like columns).  ``range_col`` must be
    non-null.  Split accuracy only affects load balance, never results.
    """
    spark = df.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    ranged = range_partition_ids(df, range_col, P, desc=range_desc)
    off_df, n_total = _pid_offsets(ranged)
    w = Window.partitionBy("__pid").orderBy(*order_by)
    rn = (F.row_number().over(w) + F.col("__off")).alias("__rn")
    ranked = ranged.join(F.broadcast(off_df), "__pid").withColumn("__rn", rn)
    q, r = divmod(n_total, k)
    if q == 0:
        bucket = F.col("__rn")
    else:
        head = r * (q + 1)
        bucket = F.when(
            F.col("__rn") <= head, F.ceil(F.col("__rn") / (q + 1))
        ).otherwise(r + F.ceil((F.col("__rn") - head) / q))
    return ranked.withColumn(alias, bucket.cast("int")).drop("__pid", "__off", "__rn")


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


def global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    range_col: str,
    value_col: str,
    alias: str = "cum",
    range_desc: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Running SUM of ``value_col`` over a GLOBAL total order without a
    single-task sort -- the prefix-sum sibling of ``global_ntile``.

    Same two-phase scheme: value-derived range partitions
    (``range_partition_ids`` -- a pure function of the row, so separate
    jobs agree), a per-partition window cumsum, and a broadcast join of
    per-partition sum offsets.  The only driver-side data is one row
    per partition (bounded by the partition count, never by rows).

    ``order_by`` must be a TOTAL order whose leading key is
    ``range_col`` (ties on ``range_col`` stay in one partition);
    ``range_col`` must be non-null; ``value_col`` must be integral
    (exact prefix sums -- float cumsums are order-fragile).
    """
    spark = df.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    ranged = range_partition_ids(df, range_col, P, desc=range_desc)
    off_df, _ = _pid_offsets(ranged, value_col)
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(
            alias,
            (F.sum(value_col).over(w) + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    count_col: str = "n_rows",
    unique_starts: bool = False,
) -> DataFrame:
    """Merge overlapping-or-touching half-open intervals ``[start, end)``
    per key into maximal spans -- the gaps-and-islands primitive
    (activity sessions from validity windows, coverage spans from
    bookings, downtime from incident intervals).  Two intervals merge
    iff the later one starts on or before the running maximum end
    (half-open adjacency: ``start == prev_end`` touches, so it merges).

    One per-key window pass: running ``max(end)`` over rows strictly
    before the current one flags island starts, a running sum numbers
    the islands, one aggregate collapses them.  Per-key partitions keep
    it scale-safe (the window never crosses keys); input rows with
    identical (key, start) pre-aggregate first so the ordering inside
    each window is total and the plan deterministic.  Callers whose
    input is unique per (key, start) BY CONSTRUCTION (e.g. posexplode
    positions) pass ``unique_starts=True`` to skip that pre-aggregate
    -- it would be a data no-op costing one extra full shuffle of the
    interval frame (r11 review finding).  The contract is ENFORCED,
    not trusted (r11 advice): a ``lag(start)`` probe over the same
    window spec (collapses into the existing Window node -- no extra
    shuffle or pass) raises on the first duplicate (key, start) rather
    than silently producing nondeterministic island numbering.

    Output: ``key_col, span_start, span_end, count_col`` (input rows
    merged into the span).
    """
    w = Window.partitionBy(key_col).orderBy(start_col)
    if unique_starts:
        prev_start = F.lag(start_col).over(w)
        per_start = df.select(
            key_col,
            start_col,
            F.lit(1).cast("long").alias("__n"),
            F.col(end_col).alias("__e"),
        ).withColumn(
            "__uniq",
            F.when(
                prev_start.isNotNull() & (prev_start == F.col(start_col)),
                F.raise_error(
                    F.lit(
                        "coalesce_intervals(unique_starts=True): duplicate "
                        "(key, start) in input -- the caller asserted "
                        "uniqueness by construction; pre-aggregate instead "
                        "(unique_starts=False)"
                    )
                ).cast("int"),
            ).otherwise(F.lit(0)),
        )
    else:
        per_start = df.groupBy(key_col, start_col).agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.max(end_col).alias("__e"),
        ).withColumn("__uniq", F.lit(0))
    prev_max = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = per_start.withColumn(
        "__new",
        F.when(prev_max.isNull() | (F.col(start_col) > prev_max), 1).otherwise(0),
    ).withColumn(
        # "+ __uniq" (always 0, raises on contract violation) rides in
        # the summand so the guard is evaluated for EVERY row -- an AND
        # clause would short-circuit under codegen and skip it on
        # non-island rows (exactly where duplicates sit).
        "__island",
        F.sum(F.col("__new") + F.col("__uniq")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy(key_col, "__island")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max("__e").alias("span_end"),
            F.sum("__n").cast("long").alias(count_col),
        )
        .drop("__island")
    )
