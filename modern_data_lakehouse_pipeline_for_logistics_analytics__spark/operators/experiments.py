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


def micro_ratio_sql(num: str, den: str, div: str, signed: bool = False) -> str:
    """Half-up micro-unit ratio ``round(num * 1e6 / den)`` as ONE integer
    expression emitted for either engine (``div`` = 'div' Spark / '//'
    DuckDB) with the x1e6 multiply SPLIT as x1000 quotient/remainder
    steps -- the playbook's divide-before-multiply rule -- so the bound
    is max(|num|, den) <= ~4.6e15 instead of <= ~9.2e12 (a single x1e6
    multiply overflows int64 ~500x earlier; r12 review finding).
    ``den`` must be > 0.  ``signed=True`` routes |num| through the
    unsigned path and re-applies the sign, so no negative ever meets an
    integer division (trunc-toward-zero vs floor is then moot).

    Derivation (num, den >= 0): with q1 = (num*1000) div den and
    r1 = (num*1000) % den,  num*1e6/den = q1*1000 + r1*1000/den, and
    half-up of the fractional part is (2*r1*1000 + den) div (2*den) --
    exact because q1*1000 is an integer.
    """
    if signed:
        mag = micro_ratio_sql(f"abs({num})", den, div)
        return (
            f"(CASE WHEN ({num}) >= 0 THEN 1 ELSE -1 END) * ({mag})"
        )
    q1 = f"((({num}) * 1000) {div} ({den}))"
    r1 = f"((({num}) * 1000) % ({den}))"
    return f"({q1} * 1000 + (2 * {r1} * 1000 + ({den})) {div} (2 * ({den})))"


def mann_whitney_auc(
    df: DataFrame, score_col: str, class_col: str
) -> DataFrame:
    """Exact one-vs-rest AUC per class via the Mann-Whitney rank sum --
    the ranking-quality metric every scoring model (quality classifier,
    relevance score, fraud signal) is judged by, computed EXACTLY:
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with
    tie-AVERAGED ranks, and every intermediate an integer (twice the
    average rank of a tied value group is 2*cum - cnt + 1, an odd
    integer), so the terminal micro-unit rounding is the only division
    and both engines replay it bit-for-bit.

    Fully distributed -- no global sort: per-value histogram (one
    groupBy), ``global_cumsum`` for the cumulative rank position
    (range-partitioned prefix sum), join the per-(class, value) counts
    back, one aggregate per class.  NULL scores are excluded up front
    (they have no rank).

    Overflow bound (corrected r12 review): the governing products are
    2U * 1000 and 2 * n_pos * n_neg * 2000 inside the split micro ratio
    (``micro_ratio_sql``), so the statistic stays inside int64 while
    n_pos * n_neg <= ~2.3e15 -- ~96M rows per side balanced.  Beyond
    that, evaluate per stratum (the metric decomposes over disjoint
    strata as a weighted mean) or widen to the decimal path.

    Output: ``<class_col>, n_pos, n_neg, auc_micro`` (half-up micro
    units; -1 when the class is degenerate, i.e. n_neg = 0).
    """
    from .dedup import _cache_aged
    from .windows import global_cumsum

    scored = df.filter(F.col(score_col).isNotNull()).select(
        F.col(score_col).alias("s"), F.col(class_col).alias("cls")
    )
    # The histogram feeds the cumsum's two internal actions, the final
    # plan, and the grand total -- cache it (fan-out replay class).
    hist = _cache_aged(
        "auc_hist",
        scored.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("cnt")),
    )
    cum = global_cumsum(hist, [F.asc("s")], "s", "cnt", alias="cum")
    r2 = cum.select(
        "s", (F.lit(2) * F.col("cum") - F.col("cnt") + F.lit(1)).alias("r2")
    )
    per_class = scored.groupBy("cls", "s").agg(
        F.count(F.lit(1)).cast("long").alias("cnt_c")
    )
    agg = (
        per_class.join(r2, "s")
        .groupBy("cls")
        .agg(
            F.sum(F.col("cnt_c") * F.col("r2")).cast("long").alias("s2"),
            F.sum("cnt_c").cast("long").alias("n_pos"),
        )
    )
    tot = hist.agg(F.sum("cnt").cast("long").alias("n"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            F.col("cls").alias(class_col),
            F.col("n_pos"),
            (F.col("n") - F.col("n_pos")).alias("n_neg"),
            F.when(
                F.col("n") > F.col("n_pos"),
                F.expr(
                    micro_ratio_sql(
                        "s2 - n_pos * (n_pos + 1)",
                        "2 * n_pos * (n - n_pos)",
                        "div",
                    )
                ),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("auc_micro"),
        )
    )


def kappa_micro_sql(div: str) -> str:
    """Cohen's kappa in half-up micro units as ONE integer expression
    over columns ``d`` (diagonal agreement), ``q`` (sum of row*col
    marginal products), ``n`` (total pairs) -- emitted for either engine
    (``div`` = 'div' Spark / '//' DuckDB), the single-source rule, so
    the two engines can never drift.  kappa = (d*n - q) / (n^2 - q),
    routed through the overflow-split signed ``micro_ratio_sql`` (the
    sign is extracted first, so no negative meets an integer division)."""
    return (
        "CASE WHEN (n * n - q) > 0 THEN "
        + micro_ratio_sql("d * n - q", "n * n - q", div, signed=True)
        + " ELSE -1 END"
    )


def cohen_kappa(df: DataFrame, rater_a: str, rater_b: str) -> DataFrame:
    """Cohen's kappa: agreement between two categorical columns beyond
    chance -- the audit metric for "does my heuristic classifier agree
    with the labels" (language-ID vs labeled lang, rule-based vs model
    segments).  EXACT: the contingency table is integer counts, observed
    agreement d/n and expected agreement q/n^2 are integer ratios, and
    kappa = (d*n - q)/(n^2 - q) rounds once at micro units through the
    shared ``kappa_micro_sql`` expression text.

    Scale shape: one groupBy over the pair stream (map-side combinable;
    the contingency is k x k, bounded by the label vocabularies), then
    everything operates on that bounded table -- marginals, diagonal,
    and the q fold are k-sized.  Rows with a NULL on either side are
    excluded (no rating, no agreement claim).

    Overflow bound (r12 review): q <= n^2 and the split micro ratio
    multiplies by 1000 twice, so the governing product n^2 * 2000 keeps
    the statistic inside int64 while n <= ~4.8e7 pairs -- beyond that,
    evaluate per stratum (kappa does not decompose exactly, but the
    per-stratum contingency tables SUM exactly: aggregate the k x k
    tables first, then run this on the merged counts).

    Output: one row -- ``n, n_agree, agree_micro, expected_micro,
    kappa_micro`` (kappa_micro = -1 when degenerate: both raters
    constant and identical leaves no chance-corrected signal).
    """
    from .dedup import _cache_aged

    pairs = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(F.col(rater_a).alias("a"), F.col(rater_b).alias("b"))
    # The contingency feeds four consumers (marginals x2, diagonal,
    # total) -- cache it or the upstream pair stream (often a full
    # feature computation) replays per consumer.
    ct = _cache_aged(
        "kappa_ct",
        pairs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("n_ab")),
    )
    row_m = ct.groupBy("a").agg(F.sum("n_ab").cast("long").alias("n_a"))
    col_m = ct.groupBy("b").agg(F.sum("n_ab").cast("long").alias("n_b"))
    diag = ct.filter(F.col("a") == F.col("b")).agg(
        F.coalesce(F.sum("n_ab"), F.lit(0)).cast("long").alias("d")
    )
    q = (
        row_m.join(col_m, row_m["a"] == col_m["b"])
        .agg(
            F.coalesce(F.sum(F.col("n_a") * F.col("n_b")), F.lit(0))
            .cast("long")
            .alias("q")
        )
    )
    n = ct.agg(F.sum("n_ab").cast("long").alias("n"))
    return (
        n.crossJoin(F.broadcast(diag))
        .crossJoin(F.broadcast(q))
        .select(
            "n",
            F.col("d").alias("n_agree"),
            F.expr(micro_ratio_sql("d", "n", "div")).alias("agree_micro"),
            F.expr(micro_ratio_sql("q", "n * n", "div")).alias(
                "expected_micro"
            ),
            F.expr(kappa_micro_sql("div")).alias("kappa_micro"),
        )
    )


def ks_two_sample(df: DataFrame, value_col: str, flag_col: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the rows
    where ``flag_col`` is true (sample A) and where it is false (sample
    B) -- the distribution-shift audit a data pipeline runs between two
    ingest windows / sources before concluding "same distribution".
    EXACT and order-free: D = max_v |F_A(v) - F_B(v)| is evaluated as
    the integer max of |cum_a * n_b - cum_b * n_a| over the distinct
    values, so no float CDF ever exists; the single terminal division
    rounds half-up at micro units through ``micro_ratio_sql``.

    Fully distributed -- no global sort: one per-value histogram
    carrying both samples' counts (one groupBy, map-side combinable),
    then ONE ``global_cumsum`` pass over the value order (the scaled
    CDF gap telescopes: cum_a*n_b - cum_b*n_a = prefix-sum of the
    per-value signed term cnt_a*n_b - cnt_b*n_a, so a single
    range-partitioned prefix sum of that integer replaces two), then a
    TakeOrdered of the argmax row (ties on the statistic break to the
    smallest value, so the reported location is deterministic).  The
    histogram is cached -- it feeds the totals, the cumsum's internal
    actions, and the final plan.

    Overflow bound: the governing product is cum * n_other * 1000
    inside the split micro ratio, so the statistic stays inside int64
    while n_a * n_b <= ~4.6e15 -- ~68M rows per side balanced.  Beyond
    that, pre-bucket the value axis (KS over a quantized grid bounds
    the exact D within one grid cell's mass) or widen to decimals.

    Output: one row -- ``n_a, n_b, ks_at, ks_micro`` (``ks_at`` = the
    smallest value attaining the supremum; NULL rows in ``value_col``
    are excluded up front -- they have no place on the value axis).
    """
    from .dedup import _cache_aged
    from .windows import global_cumsum

    scored = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("s"),
        F.col(flag_col).cast("boolean").alias("in_a"),
    )
    hist = _cache_aged(
        "ks_hist",
        scored.groupBy("s").agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0))
            .cast("long")
            .alias("cnt_a"),
            F.sum(F.when(F.col("in_a"), 0).otherwise(1))
            .cast("long")
            .alias("cnt_b"),
        ),
    )
    tot = hist.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
    )
    signed = hist.crossJoin(F.broadcast(tot)).select(
        "s",
        "n_a",
        "n_b",
        (F.col("cnt_a") * F.col("n_b") - F.col("cnt_b") * F.col("n_a"))
        .cast("long")
        .alias("g"),
    )
    cum = global_cumsum(signed, [F.asc("s")], "s", "g", alias="gap_cum")
    gap = (
        cum.select(
            "s", "n_a", "n_b", F.abs(F.col("gap_cum")).cast("long").alias("d")
        )
        .orderBy(F.desc("d"), F.asc("s"))
        .limit(1)
    )
    return gap.select(
        "n_a",
        "n_b",
        F.col("s").alias("ks_at"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.expr(micro_ratio_sql("d", "n_a * n_b", "div")),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("ks_micro"),
    )


def chisq_cell_sql() -> str:
    """Per-cell term of the chi-square identity ``chi2 = sum O^2/E - n``
    in half-up MICRO units, as ONE expression over integer columns
    ``n_ab`` (cell count), ``n_a``/``n_b`` (marginals), ``n`` (total) --
    emitted verbatim for both engines (every function in it --
    CAST/FLOOR/arithmetic -- is spelled identically in Spark SQL and
    DuckDB), the single-source rule.

    The identity matters: a groupBy materializes only OBSERVED cells,
    yet an empty cell contributes (0-E)^2/E = E to the direct form.
    sum (O-E)^2/E = sum O^2/E - n moves every empty cell's contribution
    into the constant ``- n`` (its O^2/E term is 0), so the statistic is
    exact over the full observed-vocabulary cross without ever
    materializing empty cells.  O^2/E = n*O^2/(n_a*n_b); the numerator
    overflows int64 at trivial sizes, so the cell is computed in DOUBLE
    (counts are exact doubles below 2^53 and both engines replay the
    identical IEEE expression) and quantized half-up to micro units
    BEFORE the sum, so float addition order can never change the
    statistic.  The caller subtracts n * 1e6 from the summed cells."""
    return (
        "CAST(FLOOR("
        " (CAST(n AS DOUBLE) * CAST(n_ab AS DOUBLE) * CAST(n_ab AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )


def chisq_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns -- the drift/QA companion to ``mutual_information``: is the
    event mix independent of the weekday, the label independent of the
    source?  Computed through the ``sum O^2/E - n`` identity (see
    ``chisq_cell_sql``: empty cells contribute exactly via the constant,
    so only observed cells ever materialize), per-cell terms quantized
    to micro units through the shared expression text before the sum
    (the KL/nDCG fixed-point discipline), so both engines report the
    identical statistic; the degrees of freedom come out as exact
    integer counts of the observed category vocabularies.

    Scale shape: one groupBy over the pair stream (map-side combinable;
    the contingency is k_a x k_b, bounded by the vocabularies), then
    marginals as window sums over that bounded table and one scalar
    fold.  NULL on either side is excluded (no category, no cell).

    Output: one row -- ``n, n_cells, dof, chi2_micro`` where dof =
    (k_a - 1) * (k_b - 1) over the OBSERVED vocabularies.
    """
    from pyspark.sql import Window as W

    from .dedup import _cache_aged

    pairs = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
    ct = _cache_aged(
        "chisq_ct",
        pairs.groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("long").alias("n_ab")
        ),
    )
    wide = (
        ct.withColumn(
            "n_a", F.sum("n_ab").over(W.partitionBy("a")).cast("long")
        )
        .withColumn(
            "n_b", F.sum("n_ab").over(W.partitionBy("b")).cast("long")
        )
        .crossJoin(
            F.broadcast(ct.agg(F.sum("n_ab").cast("long").alias("n")))
        )
    )
    cells = wide.select(
        "n",
        "a",
        "b",
        F.expr(chisq_cell_sql()).alias("cell_fp"),
    )
    return cells.groupBy().agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            (F.countDistinct("a") - F.lit(1))
            * (F.countDistinct("b") - F.lit(1))
        )
        .cast("long")
        .alias("dof"),
        (F.sum("cell_fp") - F.max("n") * F.lit(1_000_000))
        .cast("long")
        .alias("chi2_micro"),
    )


def runs_var_micro_sql() -> str:
    """Wald-Wolfowitz runs variance 2ab(2ab - n) / (n^2 (n - 1)) in
    half-up MICRO units as ONE expression over integer columns ``a``,
    ``b``, ``n`` -- emitted verbatim for both engines (the
    ``chisq_cell_sql`` pattern).  Computed in DOUBLE: the exact-integer
    split ratio overflows int64 at n ~ 1.4e4 balanced (2ab(2ab-n)*1000
    exceeds 2^63 -- r12 review finding, empirically a crash under ANSI
    mode at n = 20,000, squarely inside the hourly-series range the
    operator invites).  Counts below 2^53 are exact doubles, products
    beyond that round deterministically per IEEE-754 identically on
    both engines, and the statistic is micro-rounded anyway -- so the
    double path trades ~1e-16 relative error for no ceiling at all.
    The numerator is 0 when a or b is 0 and positive otherwise (for
    a, b >= 1: 2ab >= a + b), so floor(x + 0.5) is plain half-up."""
    ab2 = "(2.0 * CAST(a AS DOUBLE) * CAST(b AS DOUBLE))"
    return (
        f"CAST(FLOOR({ab2} * ({ab2} - CAST(n AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        "    * (CAST(n AS DOUBLE) - 1.0))"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )


def runs_test(df: DataFrame, order_col: str, value_col: str) -> DataFrame:
    """Wald-Wolfowitz runs test over an ordered integer series: is the
    sequence of above/below-median signs random, or does it trend /
    oscillate?  The nonparametric randomness check a pipeline runs on a
    daily KPI before trusting "no drift".  EXACT: the split point is
    the LOWER MEDIAN (the least value whose cumulative count reaches
    ceil(n/2)) selected distributed -- per-value histogram +
    ``global_cumsum``, no global sort -- and a row is positive iff
    value > median (ties side with "below", deterministically).  The
    expected-runs formula is an exact integer ratio rounded half-up
    once at micro units; the variance goes through the shared DOUBLE
    expression ``runs_var_micro_sql`` (no sqrt -- callers needing the
    z-score divide the micro numbers themselves).

    Scale shape: the median selection is fully distributed; the runs
    count itself is ONE window pass over the ordered series, which is
    acceptable because the series this operator targets is
    calendar-bounded (daily/hourly aggregates: thousands of rows
    regardless of raw data scale), never raw-row-scale -- documented
    contract, matching ``coalesce_intervals``'s bounded-series posture.

    Overflow bound: expected_runs' numerator 2ab * 1000 governs the
    remaining integer path -- inside int64 to n ~ 1.3e8 balanced; the
    variance has NO integer ceiling (double path, see
    ``runs_var_micro_sql`` -- the first integer cut crashed at n=2e4).

    Output: one row -- ``n, n_pos, n_neg, median_val, n_runs,
    expected_runs_micro, var_runs_micro`` (-1 variance when n < 2).
    """
    from pyspark.sql import Window as W

    from .dedup import _cache_aged
    from .windows import global_cumsum

    series = df.select(
        F.col(order_col).alias("t"), F.col(value_col).cast("long").alias("x")
    # NULL x rows are dropped (r13 advisor note): a NULL violates
    # global_cumsum's non-null range_col contract, and Spark (NULLS
    # FIRST asc) vs DuckDB (NULLS LAST) would order them differently,
    # skewing the median and the sign sequence.  Matches the NULL
    # posture of ks_two_sample / psi_two_sample / reliability_bins;
    # any oracle replaying this operator must carry the same
    # `WHERE value IS NOT NULL`.
    ).filter(F.col("x").isNotNull())
    series = _cache_aged("runs_series", series)
    hist = series.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    hist = _cache_aged("runs_hist", hist)
    cum = global_cumsum(hist, [F.asc("x")], "x", "cnt", alias="crank")
    tot = hist.agg(F.sum("cnt").cast("long").alias("n"))
    med = cum.crossJoin(F.broadcast(tot)).agg(
        F.min(
            F.when(F.col("crank") >= F.expr("(n + 1) div 2"), F.col("x"))
        )
        .cast("long")
        .alias("med")
    )
    signed = series.crossJoin(F.broadcast(med)).select(
        "t", "x", (F.col("x") > F.col("med")).alias("pos"), "med"
    )
    w = W.orderBy("t")
    runs = signed.select(
        "pos",
        "med",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.lag("pos").over(w) != F.col("pos")),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("new_run"),
    )
    agg = runs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("long").alias("b"),
        F.max("med").cast("long").alias("median_val"),
        F.sum("new_run").cast("long").alias("n_runs"),
    )
    return agg.select(
        "n",
        F.col("a").alias("n_pos"),
        F.col("b").alias("n_neg"),
        "median_val",
        "n_runs",
        (
            F.lit(1_000_000)
            + F.expr(micro_ratio_sql("2 * a * b", "n", "div"))
        )
        .cast("long")
        .alias("expected_runs_micro"),
        F.when(F.col("n") > 1, F.expr(runs_var_micro_sql()))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("var_runs_micro"),
    )


def psi_two_sample(
    df: DataFrame, value_col: str, flag_col: str, n_bins: int = 10
) -> DataFrame:
    """Population Stability Index between the rows where ``flag_col``
    is true (sample A, the "expected" population whose quantiles define
    the bins) and false (sample B, the "actual") -- the drift index
    model-risk teams alarm on (<0.1 stable / 0.1-0.25 shifting / >0.25
    shifted), complementing KS (sup-norm) and JSD (distribution-level)
    with a binned, contribution-per-bin view.

    Bin edges are sample A's exact lower quantiles (the least value
    whose cumulative A-count reaches ceil(k*n_a/n_bins)), selected
    DISTRIBUTED -- per-value histogram + one ``global_cumsum`` + one
    conditional-min aggregate for all edges at once (the theilsen
    order-statistic pattern; no global sort).  All ``n_bins`` bins are
    enumerated explicitly (a bin empty in both samples still exists),
    and shares are add-half smoothed -- p = (2a+1)/(2n_a + n_bins) in
    half-units -- so the log is always defined with zero counts; the
    per-bin contribution (p-q)*ln(p/q) is quantized half-up to NANO
    units (the KL discipline) so both engines report identical values.

    Scale shape: the histogram is the only data-scale aggregate
    (map-side combinable, cached -- it feeds the cumsum's actions, the
    totals, and the bin fold); edges ride one broadcast row; the bin
    assignment is a projection over distinct values; the final groupBy
    is ``n_bins``-sized.

    Output one row per bin 1..n_bins: ``bin, n_a_bin, n_b_bin,
    psi_nano`` (sum psi_nano over bins for the index).
    """
    from .dedup import _cache_aged
    from .windows import global_cumsum

    if n_bins < 2:
        raise ValueError("psi_two_sample needs n_bins >= 2")
    scored = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("s"),
        F.col(flag_col).cast("boolean").alias("in_a"),
    )
    hist = _cache_aged(
        "psi_hist",
        scored.groupBy("s").agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0))
            .cast("long")
            .alias("cnt_a"),
            F.sum(F.when(F.col("in_a"), 0).otherwise(1))
            .cast("long")
            .alias("cnt_b"),
        ),
    )
    cum = global_cumsum(hist, [F.asc("s")], "s", "cnt_a", alias="cum_a")
    tot = hist.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
    )
    # One aggregate selects every edge: e_k = min s with
    # cum_a >= ceil(k*n_a/n_bins) -- k*n_a stays in int64 to n_a ~ 1e18/k.
    edge_aggs = [
        F.min(
            F.when(
                F.col("cum_a")
                >= F.expr(f"({k} * n_a + {n_bins - 1}) div {n_bins}"),
                F.col("s"),
            )
        ).alias(f"e{k}")
        for k in range(1, n_bins)
    ]
    edges = cum.crossJoin(F.broadcast(tot)).agg(*edge_aggs)
    bin_expr = " + ".join(
        f"(CASE WHEN s > e{k} THEN 1 ELSE 0 END)" for k in range(1, n_bins)
    )
    binned = (
        hist.crossJoin(F.broadcast(edges))
        .select(
            F.expr(f"CAST(1 + {bin_expr} AS BIGINT)").alias("bin"),
            "cnt_a",
            "cnt_b",
        )
        .groupBy("bin")
        .agg(
            F.sum("cnt_a").cast("long").alias("n_a_bin"),
            F.sum("cnt_b").cast("long").alias("n_b_bin"),
        )
    )
    spark = df.sparkSession
    all_bins = spark.range(1, n_bins + 1).select(
        F.col("id").cast("long").alias("bin")
    )
    full = (
        all_bins.join(binned, "bin", "left")
        .na.fill({"n_a_bin": 0, "n_b_bin": 0})
        .crossJoin(F.broadcast(tot))
    )
    # D-suffixed literals: bare `2.0` parses as DECIMAL(2,1) on Spark;
    # every constant here is exactly double-representable, so the
    # oracle's plain literals promote to the identical values.
    psi = (
        "CAST(FLOOR(("
        " ((2.0D * CAST(n_a_bin AS DOUBLE) + 1.0D)"
        f"  / (2.0D * CAST(n_a AS DOUBLE) + {float(n_bins)}D))"
        " - ((2.0D * CAST(n_b_bin AS DOUBLE) + 1.0D)"
        f"  / (2.0D * CAST(n_b AS DOUBLE) + {float(n_bins)}D))"
        ") * ln("
        " ((2.0D * CAST(n_a_bin AS DOUBLE) + 1.0D)"
        f"  / (2.0D * CAST(n_a AS DOUBLE) + {float(n_bins)}D))"
        " / ((2.0D * CAST(n_b_bin AS DOUBLE) + 1.0D)"
        f"  / (2.0D * CAST(n_b AS DOUBLE) + {float(n_bins)}D))"
        ") * 1000000000.0D + 0.5D) AS BIGINT)"
    )
    return full.select(
        "bin",
        "n_a_bin",
        "n_b_bin",
        F.expr(psi).alias("psi_nano"),
    ).orderBy("bin")


def reliability_bins(
    df: DataFrame,
    score_col: str,
    order_col: str,
    event_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table for a rank-based score: rows are split
    into ``n_bins`` equal-population score bins (global NTILE over the
    total order (score, order_col) -- distributed, no single-task sort),
    each bin's PREDICTED probability is its rank midpoint (2d-1)/(2k),
    and the table reports observed event rate and the exact Brier
    contribution per bin -- the "is my score calibrated" audit run
    before a score is used as a probability.

    EXACT: the midpoint is a rational constant per bin, the event rate
    a single half-up micro division, and the Brier sum over a bin
    telescopes to integers -- sum (p - y)^2 = n*p^2 - 2*p*ev + ev with
    p in micro units gives e12 fixed-point BIGINTs.  Ceiling: the CROSS
    term 2*p*ev*1e6 governs (r12 review -- the first doc bound counted
    only the square terms), so events per bin <= ~4.8e6 at the top-bin
    midpoint; beyond that widen to decimal or split strata.

    Output one row per bin 1..n_bins: ``bin, n, n_events, pred_micro,
    event_rate_micro, brier_e12``.
    """
    from .windows import global_ntile

    if n_bins < 2:
        raise ValueError("reliability_bins needs n_bins >= 2")
    scored = df.filter(F.col(score_col).isNotNull()).select(
        F.col(score_col).alias("s"),
        F.col(order_col).alias("o"),
        F.when(F.col(event_col), 1).otherwise(0).cast("long").alias("y"),
    )
    tiled = global_ntile(
        scored,
        [F.asc("s"), F.asc("o")],
        n_bins,
        "s",
        alias="bin",
        range_desc=False,
    )
    agg = tiled.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_events"),
    )
    pred = f"CAST((2 * bin - 1) * 1000000 div (2 * {n_bins}) AS BIGINT)"
    return agg.select(
        F.col("bin").cast("long").alias("bin"),
        "n",
        "n_events",
        F.expr(pred).alias("pred_micro"),
        F.expr(micro_ratio_sql("n_events", "n", "div"))
        .cast("long")
        .alias("event_rate_micro"),
        F.expr(
            f"CAST(n * ({pred}) * ({pred})"
            f" - 2 * ({pred}) * n_events * 1000000"
            " + n_events * CAST(1000000000000 AS BIGINT) AS BIGINT)"
        ).alias("brier_e12"),
    ).orderBy("bin")
