"""Serving-layer operators (SURVEY.md section 3.3: P5, P6, A8, F12, M7).

The reference's API collects ALL gold data into one pandas frame at
startup (`API/pastapi.py:114-129`) and filters in Python.  These operators
keep the same request semantics as Spark plans over the gold table --
served from a cached DataFrame; at scale, partition/Z-order on the lookup
key turns P5 into a file-skipping point read.

M7 fix (documented divergence): the reference's per-request prediction log
overwrites the whole day's file because the object key is constant
(`pastapi.py:150,160`); ours appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_lookup(gold_fact: DataFrame, tracking_number: str) -> DataFrame:
    """P5: `df_gold[df_gold.tracking_number == id]` (`pastapi.py:173`)."""
    return gold_fact.filter(F.col("tracking_number") == F.lit(tracking_number))


def country_eta(gold_fact: DataFrame, country: str) -> DataFrame:
    """P6+A8+F12: case-insensitive country filter, coerced mean delivery
    days, ETA = today + ceil(mean) (`pastapi.py:204-210`).

    ``try_cast`` mirrors pandas ``to_numeric(errors="coerce")`` --
    unparseable values null out instead of failing (`pastapi.py:208`).
    """
    hits = gold_fact.filter(F.upper(F.col("destination_country")) == country.upper())
    mean_days = F.avg(F.col("delivery_days").try_cast("double"))
    return hits.agg(
        F.count(F.lit(1)).alias("n_shipments"),
        F.round(mean_days, 2).alias("avg_delivery_days"),
        # int(mean) truncation, matching `pastapi.py:209` exactly
        F.date_add(
            F.current_date(),
            F.coalesce(mean_days, F.lit(0.0)).cast("int"),
        ).alias("estimated_delivery_date"),
    )


def log_prediction(spark_df: DataFrame, log_root: str) -> None:
    """M7: append-mode audit log (one row per request), never overwrite."""
    spark_df.write.mode("append").parquet(log_root)
