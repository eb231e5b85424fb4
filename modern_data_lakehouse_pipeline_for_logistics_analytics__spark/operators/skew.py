"""Skew mitigation (SURVEY.md section 4 scale posture).

AQE's skew-join splitting handles sort-merge joins automatically; these
helpers cover what it does not: hot-key *aggregations* and broadcast-
ineligible joins where one key dominates a shuffle partition.

  salted_join      -- left rows get a deterministic salt in [0, buckets);
                      the (small) right side is replicated once per salt,
                      so one hot key spreads over ``buckets`` tasks.
  salted_aggregate -- two-phase re-aggregatable aggregation: partial
                      groupBy(key, salt) then final groupBy(key).  Valid
                      for sums/counts/min/max (anything associative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], buckets: int) -> Column:
    """Deterministic per-row salt: hash of the row's columns -- stable
    across retries (a random salt breaks task-retry idempotency)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left[on]`` is skewed: salt the left, replicate the
    right per salt value, join on (key, salt).  Right side grows x buckets
    -- use only when right is small relative to the hot partition."""
    l_salted = left.withColumn("__salt", _salt(left.columns, buckets))
    r_rep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = l_salted.join(r_rep, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    sum_cols: list[str],
    buckets: int = 8,
) -> DataFrame:
    """Hot-key-safe count+sums: partial aggregate on (key, salt), final on
    key.  Each hot key's rows split across ``buckets`` partial tasks, and
    the final stage sees at most ``buckets`` rows per key.
    Output: ``<key>, n_rows, sum_<c>...``."""
    salted = df.withColumn("__salt", _salt(df.columns, buckets))
    partial = salted.groupBy(key, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
    )
    return partial.groupBy(key).agg(
        F.sum("__n").alias("n_rows"),
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join/agg-key skew audit: the histogram a planner (or an engineer
    choosing between plain, broadcast, and salted joins) actually needs.
    Groups keys into power-of-two frequency buckets and reports, per
    bucket: how many distinct keys, how many rows they carry, and the
    bucket's share of all rows in exact fixed-point (6dp half-up).  A
    heavy-tail visible as high-bucket rows = salt or AQE-skew-join
    territory; ``salted_join``'s docstring points here.

    All integer arithmetic: ``bucket = bit_length(n) - 1`` (== floor
    log2 without transcendental log -- length(bin(n)) - 1 in both
    engines' SQL), shares are ratios of BIGINTs rounded with the repo
    floor formula.  Two aggregates, ONE scan of ``df``: per-key counts
    (one shuffle on the key -- the thing being audited; map-side combine
    keeps it partial), then a <=64-group rollup.  The row total is the
    SUM over the bucket rollup (a broadcast 1-row cross join), never a
    second scan of the fact table -- the audit target is by definition
    the biggest table in the job (r8 review finding).  Output:
    ``bucket, n_keys, n_rows, rows_share`` ordered by bucket.
    """
    from .dedup import _cache_aged
    from .textstats import round_half_up

    per_key = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bucket = (F.length(F.expr("bin(n)")) - 1).cast("long")
    # Cached: the <=64-row rollup feeds both the total and the output.
    by_bucket = _cache_aged(
        "skew_buckets",
        per_key.groupBy(bucket.alias("bucket")).agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("n").cast("long").alias("n_rows"),
        ),
    )
    total = by_bucket.agg(F.sum("n_rows").cast("double").alias("__total"))
    return by_bucket.crossJoin(F.broadcast(total)).select(
        "bucket",
        "n_keys",
        "n_rows",
        round_half_up(F.col("n_rows") / F.col("__total"), 6).alias("rows_share"),
    )


_CARD_CALLS = 0


def join_cardinality_estimate(
    a: "DataFrame",
    b: "DataFrame",
    key: str,
    topn: int = 100,
) -> "DataFrame":
    """Optimizer-statistics audit: estimate |A JOIN B| from END-BIASED
    histograms (the System-R family every cost-based optimizer ships)
    and compare against the exact cardinality --

      est =   sum_{k in TA ∩ TB} fa*fb                (exact head x head)
            + sum_{k in TA \\ TB} fa * avg_rest(B)     (containment)
            + sum_{k in TB \\ TA} fb * avg_rest(A)
            + rows_rest(A) * rows_rest(B) / max(ndv_rest)   (uniform tail)

    with avg_rest = rest rows div rest ndv, everything truncating
    BIGINT arithmetic so the DuckDB oracle replays the estimate AND
    the exact count bit-for-bit.  The audit row a platform team reads
    to decide whether its histogram budget (topn) is big enough for a
    workload's skew: err_bp is the estimate's error in basis points.

    Scale shape: two per-side frequency aggregates (map-side
    combinable), TakeOrdered top-n heads (never a global sort), anti-
    join rest stats reduced to ONE scalar row per side, and the head
    x head term joins two topn-row frames -- nothing row-scale moves
    after the first aggregates.  Output one row:
    ``est_rows, actual_rows, err_bp``."""
    from .dedup import _cache_aged

    # The frequency aggregates feed THREE branches each (head build,
    # rest anti-join, exact actual) -- cache them through the registry
    # so release_caches() can reclaim them; per-call key suffix because
    # one audit query runs the operator several times and the frames
    # must coexist until the union executes (r10 review findings: bare
    # .cache() leaked, and caching only the heads recomputed the
    # row-scale aggregates per branch).
    global _CARD_CALLS
    _CARD_CALLS += 1
    fa = _cache_aged(
        f"cardest_fa#{_CARD_CALLS}",
        a.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("fa")
        ),
    )
    fb = _cache_aged(
        f"cardest_fb#{_CARD_CALLS}",
        b.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("fb")
        ),
    )
    ta = fa.orderBy(F.desc("fa"), F.asc("k")).limit(topn)
    tb = fb.orderBy(F.desc("fb"), F.asc("k")).limit(topn)
    ra = (
        fa.join(ta.select("k"), "k", "anti")
        .agg(
            F.coalesce(F.sum("fa"), F.lit(0)).cast("long").alias("ra_rows"),
            F.count(F.lit(1)).cast("long").alias("ra_keys"),
        )
    )
    rb = (
        fb.join(tb.select("k"), "k", "anti")
        .agg(
            F.coalesce(F.sum("fb"), F.lit(0)).cast("long").alias("rb_rows"),
            F.count(F.lit(1)).cast("long").alias("rb_keys"),
        )
    )
    t1 = ta.join(tb, "k").agg(
        F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0))
        .cast("long")
        .alias("t1")
    )
    t2 = (
        ta.join(tb.select("k"), "k", "anti")
        .crossJoin(F.broadcast(rb))
        .agg(
            F.coalesce(
                F.sum(F.expr("fa * (rb_rows div greatest(rb_keys, 1L))")),
                F.lit(0),
            )
            .cast("long")
            .alias("t2")
        )
    )
    t3 = (
        tb.join(ta.select("k"), "k", "anti")
        .crossJoin(F.broadcast(ra))
        .agg(
            F.coalesce(
                F.sum(F.expr("fb * (ra_rows div greatest(ra_keys, 1L))")),
                F.lit(0),
            )
            .cast("long")
            .alias("t3")
        )
    )
    t4 = ra.crossJoin(rb).select(
        F.expr(
            "(ra_rows * rb_rows) div greatest(ra_keys, rb_keys, 1L)"
        ).cast("long").alias("t4")
    )
    actual = fa.join(fb, "k").agg(
        F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0))
        .cast("long")
        .alias("actual_rows")
    )
    est = (
        t1.crossJoin(t2).crossJoin(t3).crossJoin(t4)
        .select((F.col("t1") + F.col("t2") + F.col("t3") + F.col("t4")).alias("est_rows"))
    )
    return est.crossJoin(actual).select(
        "est_rows",
        "actual_rows",
        F.expr("(abs(est_rows - actual_rows) * 10000L) div greatest(actual_rows, 1L)")
        .cast("long")
        .alias("err_bp"),
    )


def fd_violations(
    df: "DataFrame", determinant: list[str], dependent: str
) -> "DataFrame":
    """Functional-dependency profiling: does ``determinant -> dependent``
    hold?  Counts determinant values mapping to MORE than one distinct
    dependent value -- the data-profiling primitive behind key
    discovery, denormalization checks and dimension-integrity audits
    (a violated FD in a would-be dimension means the grain is wrong).

    One exact two-level aggregate: distinct (X, Y) pairs, then images
    per X -- both map-side-combinable; nothing else moves.  Output one
    row: ``n_determinants, n_violating, max_images, violation_bp``
    (violating share of determinant values, basis points, truncating
    BIGINT arithmetic)."""
    pairs = df.select(*determinant, dependent).distinct()
    images = pairs.groupBy(*determinant).agg(
        F.count(F.lit(1)).cast("long").alias("__imgs")
    )
    return images.agg(
        F.count(F.lit(1)).cast("long").alias("n_determinants"),
        # Coalesced: SUM/MAX over zero rows are NULL, but the contract
        # (and the oracle) says an empty input has 0 violations -- the
        # same empty-aggregate guard join_cardinality_estimate uses
        # (r10 review finding).
        F.coalesce(
            F.sum(F.when(F.col("__imgs") > 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_violating"),
        F.coalesce(F.max("__imgs"), F.lit(0)).cast("long").alias("max_images"),
    ).select(
        "n_determinants",
        "n_violating",
        "max_images",
        F.expr("(n_violating * 10000L) div greatest(n_determinants, 1L)")
        .cast("long")
        .alias("violation_bp"),
    )


def hrw_assignments(
    df: DataFrame, key_col: str, n_shards: int, salt: str = "hrw"
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each key
    goes to the shard with the largest portable hash of (salt, shard,
    key) -- the consistent-routing scheme where resizing from N to N+1
    shards moves only ~1/(N+1) of the keys (vs ~all for mod-N), with
    NO ring state to store.

    Determinism: the argmax packs (weight, shard) into ONE BIGINT --
    ``w * 8 + shard`` (w is 60-bit, shards <= 8, so the pack stays
    under 2^63) -- and takes a plain MAX, so ties (impossible in
    practice, deterministic anyway) break toward the higher shard
    identically on every engine; no max_by/arbitrary-tie semantics.

    Scale shape: the shard candidates explode a literal N-element
    array (N rows per key, map-side), and ONE map-side-combinable max
    per key assigns it.  Adds ``shard`` (long).
    """
    if not 1 <= n_shards <= 8:
        raise ValueError(f"hrw_assignments supports 1..8 shards, got {n_shards}")
    from .dedup import portable_base_hash

    cand = df.select(
        key_col,
        F.explode(
            F.array(*[F.lit(i) for i in range(n_shards)])
        ).alias("__s"),
    )
    w = portable_base_hash(
        F.concat_ws(
            ":", F.lit(salt), F.col("__s").cast("string"),
            F.col(key_col).cast("string"),
        )
    )
    packed = cand.select(
        key_col, (w * 8 + F.col("__s")).alias("__p")
    ).groupBy(key_col).agg(F.max("__p").alias("__m"))
    return packed.select(
        key_col, (F.col("__m") % 8).cast("long").alias("shard")
    )
