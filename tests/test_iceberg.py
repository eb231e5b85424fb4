"""Iceberg import-gated paths (twin of the Delta half of
test_delta_warehouse.py).

The sandbox has no iceberg-spark-runtime jar, so: the Iceberg branch is
covered by skip-gated tests (they run wherever the jar is installed),
and the parquet fallback -- identifier-to-warehouse-path mapping, write/
read round-trip, staged MERGE rewrite -- executes HERE.
"""

from __future__ import annotations

import os

import pytest

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources.iceberg import (
    _fallback_path,
    iceberg_available,
    merge_into,
    read_table,
    write_table,
)


def test_write_read_fallback_roundtrip(spark, tmp_path):
    """Without the Iceberg jar: write_table lands partitioned parquet at
    the hadoop-catalog-compatible warehouse path, read_table finds it by
    the same identifier."""
    wh = str(tmp_path / "warehouse")
    # Partition values chosen to dodge parquet partition-column type
    # inference (date-shaped strings round-trip as DATE, by design).
    base = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "k long, v string, d string"
    )
    fmt = write_table(base, wh, "db.tbl", partition_by=["d"])
    assert fmt == ("iceberg" if iceberg_available(spark) else "parquet")
    if fmt == "parquet":
        # identifier maps onto warehouse/db/tbl like a hadoop catalog would
        assert os.path.isdir(os.path.join(wh, "db", "tbl"))
        assert _fallback_path(wh, "db.tbl") == os.path.join(wh, "db", "tbl")
    got = {(r.k, r.v, r.d) for r in read_table(spark, wh, "db.tbl").collect()}
    assert got == {(1, "a", "p1"), (2, "b", "p2")}


def test_merge_fallback_rewrite(spark, tmp_path):
    """Without the jar merge_into runs the staged full-outer rewrite
    shared with the Delta fallback -- same MERGE row semantics, swapped
    in place; the target stays readable by identifier afterwards."""
    wh = str(tmp_path / "warehouse")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_table(base, wh, "db.m")
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    how = merge_into(spark, wh, "db.m", updates, key="k")
    assert how == ("iceberg-merge" if iceberg_available(spark) else "parquet-rewrite")
    got = {(r.k, r.v) for r in read_table(spark, wh, "db.m").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_append_mode_fallback(spark, tmp_path):
    """mode='append' accumulates rows in both branches."""
    wh = str(tmp_path / "warehouse")
    a = spark.createDataFrame([(1, "a")], "k long, v string")
    b = spark.createDataFrame([(2, "b")], "k long, v string")
    write_table(a, wh, "db.app")
    write_table(b, wh, "db.app", mode="append")
    got = {(r.k, r.v) for r in read_table(spark, wh, "db.app").collect()}
    assert got == {(1, "a"), (2, "b")}


@pytest.mark.skipif(
    not iceberg_available(), reason="iceberg-spark-runtime jar not installed"
)
def test_iceberg_native_merge(spark, tmp_path):
    """Native snapshot-atomic MERGE INTO (runs only with the jar): the
    metadata tree must exist and the merge must not rewrite the whole
    table path the way the fallback does."""
    wh = str(tmp_path / "warehouse")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert write_table(base, wh, "db.n") == "iceberg"
    assert os.path.isdir(os.path.join(wh, "db", "n", "metadata"))
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    assert merge_into(spark, wh, "db.n", updates, key="k") == "iceberg-merge"
    got = {(r.k, r.v) for r in read_table(spark, wh, "db.n").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
