"""Dimension extraction + surrogate keys (SURVEY.md sections 2.4 A7/A9, 2.5 W0).

The reference builds dims with ``select(...).distinct().withColumn(
monotonically_increasing_id())`` (`Gold_layer/starschema.py:75-96`).
``monotonically_increasing_id`` is partition-dependent: re-runs renumber
every dim, breaking cross-date key stability (SURVEY.md section 4).  We pin
deterministic semantics instead -- the one deliberate behavioral divergence:

  - ``dim_with_ordered_key``: contiguous 1..N ids via row_number over the
    natural key.  Global sort of the *distinct* key set only -- fine for
    dims (cardinality << fact rows), wrong for facts.
  - ``dim_with_hashed_key``: xxhash64(natural key) -- no global ordering,
    no shuffle beyond the distinct; the 100 TB default. Stable across runs
    AND across dates (a key seen tomorrow hashes identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dim_with_ordered_key(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Distinct natural keys + contiguous deterministic surrogate ids."""
    w = Window.orderBy(*cols)
    return df.select(*cols).distinct().withColumn(id_col, F.row_number().over(w))


def dim_with_hashed_key(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Distinct natural keys + order-free 64-bit hash ids (collision odds at
    dim cardinalities ~ n^2 / 2^65 -- negligible below ~10^8 keys)."""
    return df.select(*cols).distinct().withColumn(id_col, F.xxhash64(*cols))


def dedup_by_key(
    df: DataFrame, keys: list[str], order_by: list, keep: str = "first"
) -> DataFrame:
    """A9 with a deterministic survivor.

    The reference uses pandas ``drop_duplicates(subset=["tracking_number"])``
    (`MLOPS/prediction.py:99`) whose survivor is row-order dependent; Spark's
    ``dropDuplicates`` is likewise nondeterministic.  This variant pins the
    survivor with row_number over an explicit ordering.
    """
    ordering = [c if keep == "first" else F.desc(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def enrich_or_park(
    facts: DataFrame, dim: DataFrame, key: str, dim_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Late-arriving dimension handling: split a fact batch into
    ``(enriched, parked)`` -- facts whose dim row exists join and move
    on; facts arriving BEFORE their dim row (the late-arriving-dimension
    problem every CDC-fed star schema hits) park untouched for the next
    run, instead of either blocking the batch or publishing rows with
    permanently-null attributes.

    The parked frame keeps the ORIGINAL fact schema, so re-submitting
    ``parked`` with a fresher dim is the whole retry loop:
    ``enrich_or_park(parked, dim, ...)``.  One shuffle pair over the
    same key (broadcast when the dim is small); no row is ever dropped:
    count(facts) == count(enriched) + count(parked), asserted in tests.
    """
    d = dim.select(key, *dim_cols)
    enriched = facts.join(d, key, "inner")
    parked = facts.join(d.select(key), key, "left_anti")
    return enriched, parked
