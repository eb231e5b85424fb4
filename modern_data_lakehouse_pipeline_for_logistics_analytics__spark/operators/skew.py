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
