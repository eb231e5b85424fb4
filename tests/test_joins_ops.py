"""Unit tests for the composed join operators (SURVEY.md section 2.3 J0).

The asof NULL-payload case is the r1 advisor repro: the matched (latest)
right row carries a NULL column, and a per-column fill would resurrect the
value from an older right row -- the whole-row struct fill must not.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.joins import (
    asof_join,
    range_join,
)


def test_asof_null_payload_not_backfilled(spark):
    """A NULL cell in the matched right row stays NULL -- values from older
    right rows must never mix into the matched row."""
    left = spark.createDataFrame([(1, 10)], "lk long, lt long")
    right = spark.createDataFrame(
        [(1, 1, 5.0, 7.0), (1, 2, 6.0, None)],
        "rk long, rt long, a double, b double",
    )
    rows = asof_join(
        left, right, left_key="lk", right_key="rk", left_ts="lt", right_ts="rt"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.rt == 2 and r.a == 6.0
    assert r.b is None, "NULL payload was back-filled from an older right row"


def test_asof_picks_latest_leq(spark):
    left = spark.createDataFrame([(1, 10), (1, 2), (2, 5)], "lk long, lt long")
    right = spark.createDataFrame(
        [(1, 1, 100.0), (1, 3, 300.0), (1, 9, 900.0), (2, 99, 1.0)],
        "rk long, rt long, val double",
    )
    out = {
        (r.lk, r.lt): (r.rt, r.val)
        for r in asof_join(
            left, right, left_key="lk", right_key="rk", left_ts="lt", right_ts="rt"
        ).collect()
    }
    assert out == {(1, 10): (9, 900.0), (1, 2): (1, 100.0)}  # (2,5): no rt<=5 -> dropped


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame([(1, 3)], "lk long, lt long")
    right = spark.createDataFrame([(1, 3, 30.0), (1, 2, 20.0)], "rk long, rt long, val double")
    inclusive = asof_join(
        left, right, left_key="lk", right_key="rk", left_ts="lt", right_ts="rt"
    ).collect()
    strict = asof_join(
        left, right, left_key="lk", right_key="rk", left_ts="lt", right_ts="rt", strict=True
    ).collect()
    assert inclusive[0].rt == 3 and strict[0].rt == 2


def test_asof_tie_breaker_greatest_wins(spark):
    left = spark.createDataFrame([(1, 10)], "lk long, lt long")
    right = spark.createDataFrame(
        [(1, 5, 1, 10.0), (1, 5, 9, 90.0)], "rk long, rt long, seq long, val double"
    )
    rows = asof_join(
        left,
        right,
        left_key="lk",
        right_key="rk",
        left_ts="lt",
        right_ts="rt",
        tie_breakers=["seq"],
    ).collect()
    assert rows[0].seq == 9 and rows[0].val == 90.0


def test_range_join_interval(spark):
    left = spark.createDataFrame([(1, 5), (1, 50)], "k long, t long")
    right = spark.createDataFrame([(1, 0, 10, "in"), (1, 20, 30, "out")], "k long, lo long, hi long, tag string")
    out = range_join(
        left,
        right,
        equi=F.col("t") >= F.lit(-(10**18)),  # no equi key in this tiny case
        lower=F.col("t") >= F.col("lo"),
        upper=F.col("t") <= F.col("hi"),
    )
    got = {(r.t, r.tag) for r in out.collect()}
    assert got == {(5, "in")}
