"""Skew helpers: salted results must equal their unsalted equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.skew import (
    salted_aggregate,
    salted_join,
)


def _skewed(spark):
    """90% of rows share one hot key."""
    return spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("HOT", "hot-dim"), ("k5", "k5-dim")], ["k", "label"]
    )
    plain = left.join(right, "k").groupBy("k", "label").count()
    salted = salted_join(left, right, on="k", buckets=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n_rows, r.sum_v)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }
    salted = {
        (r.k): (r.n_rows, r.sum_v)
        for r in salted_aggregate(df, "k", ["v"], buckets=8).collect()
    }
    assert plain == salted
