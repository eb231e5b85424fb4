"""Experimentation & causal-attribution analytics over event streams:
exact Shapley channel attribution and a two-proportion z-test with a
deterministic hash split.

Both are "collapse the stream to a handful of exact counts, then a
closed-form score" shapes: every scan-scale stage is a map-side-
combinable aggregate, everything after the first shuffle is
constant-size (2^n coalition cells / one 2x2 contingency row), and the
score arithmetic is engine-portable (pure BIGINT for Shapley; one
terminal half-up micro rounding over IEEE-exact ops for z, whose only
non-rational step -- sqrt -- is correctly rounded by IEEE-754 on every
engine).

Reference parity: the reference has no experimentation surface; this is
engine-generalization for the analytics a consumption layer runs on the
same event stream it already ingests (SURVEY §2.11).
"""

from __future__ import annotations

from math import factorial

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _popcount_sql(col: str, n_bits: int) -> str:
    """Explicit popcount over the low ``n_bits`` of ``col`` -- spelled
    out as bit tests so ONE string runs verbatim on Spark and DuckDB
    (`bit_count` exists in both engines but disagrees on accepted types;
    `%`/`div-free` arithmetic is identical)."""
    return " + ".join(f"(({col} % {1 << (i + 1)}) - ({col} % {1 << i})) / {1 << i}"
                      for i in range(n_bits))


def shapley_channel_attribution(
    df: DataFrame,
    channels: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    conversion: str = "purchase",
) -> DataFrame:
    """Exact Shapley-value channel attribution: each conversion path's
    CHANNEL SET (the distinct touch types since the user's previous
    conversion) defines a coalition; the characteristic function
    ``v(T) = #conversions whose channel set is a subset of T`` (the
    coalitions that fully explain the path); each channel's credit is
    its Shapley value over that game -- the order-independent
    counterpart to ``position_attribution`` (which credits by position
    in time).

    Exactness: v is a BIGINT count, and the Shapley weights
    ``|T|! (n-1-|T|)! / n!`` are cleared of the denominator by
    reporting ``phi_xnfact = n! * phi`` -- every term is then an exact
    BIGINT product, no float ever appears, and
    ``sum(phi_xnfact) == n! * v(all channels)`` holds exactly (the
    efficiency axiom, asserted in the hand-case test).

    Scale shape: the stream collapses to one bitmask per conversion
    path (single user-clustered Exchange, same as the attribution
    plan), then to at most 2^n coalition-count cells; the subset-sum
    lattice, the channel frame, and both v-lookups are broadcast joins
    over <= 2^n rows.  Nothing after the first aggregate scales with
    row count.  n is capped at 8 (2^8 lattice rows; weights <= 7!).

    Output: ``channel, phi_xnfact`` -- one row per channel, credits in
    units of conversions / n!.
    """
    n = len(channels)
    if not 1 <= n <= 8:
        raise ValueError(f"shapley needs 1..8 channels, got {n}")
    if len(set(channels)) != n:
        raise ValueError("duplicate channel names")
    if conversion in channels:
        raise ValueError("the conversion type cannot be a channel")
    ordered = sorted(channels)
    bits = {c: 1 << i for i, c in enumerate(ordered)}
    spark = df.sparkSession

    from .timeseries import conversion_paths

    is_conv = F.col(type_col) == conversion
    g = conversion_paths(df, user_col, ts_col, id_col, type_col, conversion)
    bit_expr = F.create_map(
        *[x for c in ordered for x in (F.lit(c), F.lit(bits[c]))]
    )[F.col(type_col)]
    masks = (
        g.filter(~is_conv & F.col(type_col).isin(list(channels)))
        .groupBy(user_col, "__grp")
        .agg(F.bit_or(bit_expr).cast("long").alias("m"))
    )
    cm = masks.groupBy("m").agg(F.count(F.lit(1)).cast("long").alias("c_m"))

    lattice = spark.range(1 << n).select(F.col("id").cast("long").alias("t"))
    vt = (
        lattice.join(F.broadcast(cm), F.expr("(m & t) = m"), "left")
        .groupBy("t")
        .agg(F.coalesce(F.sum("c_m"), F.lit(0)).cast("long").alias("v"))
    )
    chan = spark.createDataFrame(
        [(c, bits[c]) for c in ordered], "channel string, b long"
    )
    wt_cases = " ".join(
        f"WHEN {k} THEN {factorial(k) * factorial(n - 1 - k)}"
        for k in range(n)
    )
    popcnt = _popcount_sql("t", n)
    pairs = (
        chan.join(F.broadcast(vt), F.expr("(t & b) = 0"))
        .withColumnRenamed("v", "v_t")
        .join(
            F.broadcast(vt.withColumnRenamed("t", "tb").withColumnRenamed("v", "v_tb")),
            F.expr("tb = t + b"),
        )
        .withColumn(
            "__w", F.expr(f"CASE CAST(({popcnt}) AS INT) {wt_cases} END").cast("long")
        )
    )
    return pairs.groupBy("channel").agg(
        F.sum(F.col("__w") * (F.col("v_tb") - F.col("v_t")))
        .cast("long")
        .alias("phi_xnfact")
    )


def two_proportion_ztest(
    df: DataFrame, variant_col: str, converted_col: str
) -> DataFrame:
    """Two-proportion pooled z-test over per-unit (variant, converted)
    rows -- the A/B readout.  Variants must be exactly 0 (control) and
    1 (treatment); ``converted_col`` is 0/1 per unit.

    Determinism: counts are exact BIGINTs; the z statistic and the
    absolute lift are computed in IEEE doubles whose every step
    (ratios of exact ints, one multiply chain, one sqrt -- correctly
    rounded per IEEE-754 on both engines) is bit-reproducible, then
    rounded half-up ONCE to micro units.  Degenerate inputs return
    NULL rather than a division artifact: an empty variant NULLs both
    lift and z (the session runs ANSI mode, where an unguarded 0/0
    THROWS on Spark while DuckDB returns NULL -- r10 review finding);
    a pooled rate of exactly 0 or 1 NULLs z.

    Scale shape: one map-side-combinable global aggregate -> a single
    row; nothing else.

    Output one row: ``n_ctl, conv_ctl, n_trt, conv_trt, lift_micro,
    z_micro``.
    """
    agg = df.agg(
        F.sum(F.when(F.col(variant_col) == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_ctl"),
        F.sum(F.when(F.col(variant_col) == 0, F.col(converted_col)).otherwise(0))
        .cast("long")
        .alias("conv_ctl"),
        F.sum(F.when(F.col(variant_col) == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_trt"),
        F.sum(F.when(F.col(variant_col) == 1, F.col(converted_col)).otherwise(0))
        .cast("long")
        .alias("conv_trt"),
    )
    # Spelled once; the oracle mirrors this text with 1.0D -> CAST(1 AS
    # DOUBLE) (DuckDB decimal-literal trap) and identical op order.
    return agg.select(
        "n_ctl",
        "conv_ctl",
        "n_trt",
        "conv_trt",
        F.expr(
            "CASE WHEN n_ctl > 0 AND n_trt > 0 THEN"
            " CAST(FLOOR((CAST(conv_trt AS DOUBLE) / CAST(n_trt AS DOUBLE)"
            " - CAST(conv_ctl AS DOUBLE) / CAST(n_ctl AS DOUBLE))"
            " * 1000000.0D + 0.5D) AS BIGINT)"
            " ELSE NULL END"
        ).alias("lift_micro"),
        F.expr(
            "CASE WHEN n_ctl > 0 AND n_trt > 0"
            " AND conv_ctl + conv_trt > 0"
            " AND conv_ctl + conv_trt < n_ctl + n_trt THEN"
            " CAST(FLOOR("
            "  (CAST(conv_trt AS DOUBLE) / CAST(n_trt AS DOUBLE)"
            "   - CAST(conv_ctl AS DOUBLE) / CAST(n_ctl AS DOUBLE))"
            "  / sqrt("
            "    (CAST(conv_ctl + conv_trt AS DOUBLE)"
            "     / CAST(n_ctl + n_trt AS DOUBLE))"
            "    * (1.0D - CAST(conv_ctl + conv_trt AS DOUBLE)"
            "       / CAST(n_ctl + n_trt AS DOUBLE))"
            "    * (1.0D / CAST(n_ctl AS DOUBLE)"
            "       + 1.0D / CAST(n_trt AS DOUBLE)))"
            "  * 1000000.0D + 0.5D) AS BIGINT)"
            " ELSE NULL END"
        ).alias("z_micro"),
    )
