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
