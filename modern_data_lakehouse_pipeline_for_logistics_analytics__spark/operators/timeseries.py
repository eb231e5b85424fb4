"""Time-series regularization: per-key date spines, gap fill, linear
interpolation.

Logistics analytics live on daily series with holes (no orders for a
courier on a quiet day; a sensor that missed a ping).  Downstream
models want a REGULAR grid.  This module builds the grid and fills it
without ever leaving the JVM:

- the spine is ``sequence(min_date, max_date)`` exploded PER KEY -- a
  distributed generator, never a driver-side date loop;
- fill uses ignore-nulls ``last``/``first`` window frames (the
  gaps-and-islands idiom), all whole-stage codegen;
- linear interpolation is plain column arithmetic between the bracketing
  observations.

Scale posture: everything is partitioned by the series key; per-key
work is O(days in range).  A single pathological key spanning decades
at second granularity would concentrate in one task -- the same
degenerate-key caveat as any per-key window; for that shape, coarsen
``step`` or split the range (the two-phase range-partition scheme used
by ``trainprep.pack_sequences``).

Reference parity: the reference has no time-series surface at all; this
is engine-generalization (SURVEY §2 gaps), not a port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def date_spine(df: DataFrame, key_col: str, date_col: str) -> DataFrame:
    """One row per key per day between that key's min and max observed
    date.  ``sequence`` runs distributed; the spine never touches the
    driver."""
    bounds = df.groupBy(key_col).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    return bounds.select(
        key_col,
        F.explode(F.sequence("__d0", "__d1", F.expr("interval 1 day"))).alias(date_col),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    date_col: str,
    val_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Regularize a sparse per-key daily series onto a dense spine.

    Missing days get the linear interpolation between the bracketing
    observations; days before the first / after the last observation
    get nearest-edge fill (bfill/ffill).  Output columns:
    ``key, date, <val>_filled, was_gap``.

    The arithmetic ``prev + (next - prev) * (Δprev / Δspan)`` is written
    identically in the DuckDB oracle so float results match bit-for-bit
    (same IEEE ops, same order).  Rounding is the repo's half-up-floor
    (``textstats.round_half_up``), NOT engine-native ROUND: 2dp inputs
    interpolated at frac 1/2 land EXACTLY on 4th-decimal halves (e.g.
    x.98125), where Spark's decimal HALF_UP and DuckDB's binary rounding
    split -- observed as ±1e-4 parity failures at sf0.001.
    """
    # The observed series feeds BOTH the spine bounds and the join probe
    # -- cache it or the upstream aggregate (often a full fact scan)
    # replays once per consumer (r11 materialized-action finding class).
    from .dedup import _cache_aged

    df = _cache_aged("resample_input", df)
    spine = date_spine(df, key_col, date_col)
    joined = spine.join(df, on=[key_col, date_col], how="left")

    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(val_col)
    obs_day = F.when(v.isNotNull(), F.col(date_col))
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_d = F.last(obs_day, ignorenulls=True).over(w_prev)
    next_v = F.first(v, ignorenulls=True).over(w_next)
    next_d = F.first(obs_day, ignorenulls=True).over(w_next)

    span = F.datediff(next_d, prev_d).cast("double")
    frac = F.datediff(F.col(date_col), prev_d).cast("double") / span
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    from .textstats import round_half_up

    return joined.select(
        key_col,
        date_col,
        round_half_up(filled, round_to).alias(f"{val_col}_filled"),
        v.isNull().cast("int").alias("was_gap"),
    )


def cusum_positive(
    df: DataFrame,
    key_col: str,
    order_col: str,
    dev_col: str,
) -> DataFrame:
    """One-sided CUSUM (statistical process control) without iteration:

        S_i = max(0, S_{i-1} + d_i)   ==   P_i - min_{j<=i}(P_j, 0)

    where P is the running prefix sum of the deviations -- the recursive
    reset collapses into prefix-sum minus running-minimum, two ordinary
    per-key window frames, no loop, no UDF.  Callers pass INTEGER
    deviations (cents, counts) and the whole statistic stays exact
    BIGINT -- drift detection where a float replay could disagree about
    the alert day is worthless.

    Adds ``cusum`` to the frame.  Scale: both windows share one hash
    partitioning on the key.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum(dev_col).over(w)
    floor_p = F.least(F.min(F.sum(dev_col).over(w)).over(w), F.lit(0))
    return df.withColumn("cusum", (p - floor_p).cast("long"))


def counter_repair(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    raw_col: str,
) -> DataFrame:
    """Monotonic-counter reset repair (Prometheus ``increase()``
    semantics as a batch operator): a cumulative gauge that drops below
    its predecessor has reset, and the true cumulative is the running
    sum of non-negative deltas with each reset contributing its
    post-reset reading.  One lag + one running sum per key; adds
    ``true_cumulative`` and ``was_reset`` columns.  Exact on integer
    readings."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    seq = df.withColumn("__prev", F.lag(raw_col).over(w))
    delta = (
        F.when(F.col("__prev").isNull(), F.col(raw_col))
        .when(F.col(raw_col) >= F.col("__prev"), F.col(raw_col) - F.col("__prev"))
        .otherwise(F.col(raw_col))
    )
    was_reset = (
        F.col("__prev").isNotNull() & (F.col(raw_col) < F.col("__prev"))
    ).cast("int")
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        seq.withColumn("true_cumulative", F.sum(delta).over(ws).cast("long"))
        .withColumn("was_reset", was_reset)
        .drop("__prev")
    )


def conversion_paths(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    conversion: str = "purchase",
    value_col: str | None = None,
) -> DataFrame:
    """Assign every event its conversion-path id: ``__grp`` counts the
    user's conversions at-or-after the event (one descending cumulative
    sum -- never a stream self-join), so path ``k`` is conversion ``k``
    plus the events since conversion ``k+1``; events after the user's
    last conversion (``__grp`` 0) are dropped.  With ``value_col``, the
    path's conversion value rides every row as ``__cents`` (rounded
    half-up to cents ONCE).  Ties break on (ts, id) -- id must be
    unique.  Shared path construction for ``position_attribution``,
    Shapley attribution, and journey mining: one definition, one place
    to fix path semantics."""
    is_conv = F.col(type_col) == conversion
    w_desc = (
        Window.partitionBy(user_col)
        .orderBy(F.desc(ts_col), F.desc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = df.withColumn(
        "__grp", F.sum(F.when(is_conv, 1).otherwise(0)).over(w_desc)
    ).filter(F.col("__grp") > 0)
    if value_col is not None:
        w_grp = Window.partitionBy(user_col, "__grp")
        g = g.withColumn(
            "__cents",
            F.floor(
                F.max(F.when(is_conv, F.col(value_col))).over(w_grp) * 100.0
                + F.lit(0.5)
            ).cast("long"),
        )
    return g


def position_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    conversion: str = "purchase",
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    conversion's value splits across the user's touches since the
    previous conversion -- 40% to the first touch, 40% to the last,
    20% spread over the middles (100% / 50-50 for 1- and 2-touch
    paths).  Conversions with no prior touch and events after a user's
    last conversion attribute nothing.

    Exact arithmetic end-to-end: the conversion value rounds half-up
    to cents ONCE; weights are integer micro-shares whose per-path sum
    is exactly 1,000,000 (the middle remainder goes one micro each to
    the earliest middles); attribution is BIGINT cents x micro.  No
    float splits, so per-type totals replay exactly on any engine.

    Scale shape: conversion paths form with ONE descending cumulative
    sum per user (no stream self-join -- the naive per-conversion join
    is O(events^2) on hot users); the path's value and touch count ride
    the same rows as (user, path) window aggregates.  All four windows
    cluster on ``user_col``, so the whole plan is a single Exchange
    (verified: one data Exchange + the few-row rollup Exchange);
    per-user work is O(events of that user) -- the usual hot-key window
    caveat applies, nothing else scales with total rows.

    Output: ``event_type, n_touches, attributed_microcents``.
    """
    is_conv = F.col(type_col) == conversion
    w_grp = Window.partitionBy(user_col, "__grp")
    gg = conversion_paths(
        df, user_col, ts_col, id_col, type_col, conversion, value_col
    ).withColumn(
        "__n_t",
        F.sum(F.when(~is_conv, 1).otherwise(0)).over(w_grp).cast("long"),
    )
    touch = gg.filter(~is_conv).withColumn(
        "__p",
        F.row_number().over(w_grp.orderBy(ts_col, id_col)).cast("long"),
    )
    wt = (
        F.when(F.col("__n_t") == 1, F.lit(1000000))
        .when(F.col("__n_t") == 2, F.lit(500000))
        .when(
            (F.col("__p") == 1) | (F.col("__p") == F.col("__n_t")),
            F.lit(400000),
        )
        .otherwise(
            F.expr(
                "200000 div greatest(__n_t - 2, 1L)"
                " + (CASE WHEN __p - 1 <= 200000 % greatest(__n_t - 2, 1L)"
                "    THEN 1 ELSE 0 END)"
            )
        )
    ).cast("long")
    return (
        touch.withColumn("__wt", wt)
        .groupBy(type_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum(F.col("__cents") * F.col("__wt"))
            .cast("long")
            .alias("attributed_microcents"),
        )
    )


# A Monday safely before every fixture date; the closed form below
# counts business days from it.
_BD_EPOCH_MONDAY = "1992-01-06"


def business_days_expr(date_col: str) -> F.Column:
    """Business days (Mon-Fri) from the epoch Monday through
    ``date_col`` inclusive, as a CLOSED FORM -- no per-row calendar
    array, O(1) arithmetic per row:

        n  = days since the epoch Monday        (n >= 0)
        bd = 5 * (n div 7) + least(n % 7 + 1, 5)

    (full weeks contribute 5 each; the partial week's first ``n%7 + 1``
    days are Mon.. so ``min(.., 5)`` of them are weekdays).  The
    business-day distance between two dates is the difference of two of
    these -- exact BIGINT, replayed verbatim by the SQL twin
    (``sql_business_days``).  Dates before the epoch are a caller
    error (the fixture starts 1995)."""
    return F.expr(sql_business_days(date_col, engine="spark"))


def sql_business_days(date_col: str, engine: str) -> str:
    """Engine-portable SQL text of :func:`business_days_expr` -- one
    builder, two dialect tokens (the fs_em single-source pattern):
    Spark spells days-between ``datediff(end, start)`` and integer
    division ``div``; DuckDB spells them ``date_diff('day', start,
    end)`` and ``//``."""
    if engine == "spark":
        n = f"datediff(CAST({date_col} AS DATE), DATE'{_BD_EPOCH_MONDAY}')"
        div = "div"
    elif engine == "duckdb":
        n = (
            f"date_diff('day', DATE '{_BD_EPOCH_MONDAY}',"
            f" CAST({date_col} AS DATE))"
        )
        div = "//"
    else:
        raise ValueError(f"unknown engine {engine!r}")
    return f"CAST(5 * (({n}) {div} 7) + least(({n}) % 7 + 1, 5) AS BIGINT)"
