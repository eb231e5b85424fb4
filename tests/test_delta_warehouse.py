"""S9 warehouse egress (executed round-trip) + Delta import-gated paths.

The sandbox has no delta-spark and no JDBC driver jar, so: the Delta
branch is covered by skip-gated tests (they run wherever delta-spark is
installed), the parquet fallback and the DB-API warehouse load run HERE.
"""

from __future__ import annotations

import sqlite3

import pytest

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources.delta import (
    delta_available,
    merge_into,
    read_table,
    write_table,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources.warehouse import (
    jdbc_plan,
    warehouse_ddl,
    write_warehouse_dbapi,
)


def test_warehouse_dbapi_roundtrip(spark, sf_dir, tmp_path):
    """Gold-style aggregate loaded into a real local warehouse (sqlite)
    and read back: row count, types, and load_date stamping."""
    from pyspark.sql import functions as F

    gold = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )
    con = sqlite3.connect(str(tmp_path / "wh.db"))
    try:
        n = write_warehouse_dbapi(gold, con, "gold_priority", "2024-06-01", batch_size=2)
        assert n == gold.count() == 5
        rows = con.execute(
            'SELECT o_orderpriority, n_orders, avg_price, load_date FROM "gold_priority" ORDER BY 1'
        ).fetchall()
        assert len(rows) == 5
        assert all(r[3] == "2024-06-01" for r in rows)
        assert all(isinstance(r[1], int) and isinstance(r[2], float) for r in rows)
    finally:
        con.close()


def test_warehouse_ddl_preserves_types(spark):
    df = spark.createDataFrame([(1, "x", 2.5, True)], "k long, s string, v double, f boolean")
    ddl = warehouse_ddl(df, "t")
    assert '"k" BIGINT' in ddl and '"s" VARCHAR' in ddl
    assert '"v" DOUBLE PRECISION' in ddl and '"f" BOOLEAN' in ddl


def test_jdbc_plan_resolution():
    plan = jdbc_plan(
        "jdbc:postgresql://wh/db", "gold.courier", "2024-06-01",
        options={"numPartitions": "8"}, mode="overwrite",
    )
    assert plan["format"] == "jdbc" and plan["mode"] == "overwrite"
    assert plan["dbtable"] == "gold.courier" and plan["numPartitions"] == "8"


def test_write_table_fallback_and_merge(spark, tmp_path):
    """Without delta-spark: write_table lands parquet, merge_into does the
    staged full-outer rewrite -- same MERGE row semantics, swapped in
    place."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    fmt = write_table(base, path)
    expected_fmt = "delta" if delta_available() else "parquet"
    assert fmt == expected_fmt

    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    how = merge_into(spark, path, updates, key="k")
    assert how == ("delta-merge" if delta_available() else "parquet-rewrite")
    got = {(r.k, r.v) for r in read_table(spark, path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_replace_where(spark, tmp_path):
    """Transactional partition-scoped overwrite (runs only with delta)."""
    path = str(tmp_path / "dtbl")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "k long, load_date string"
    )
    write_table(df, path, partition_by=["load_date"])
    repl = spark.createDataFrame([(9, "2024-01-02")], "k long, load_date string")
    write_table(
        repl, path, partition_by=["load_date"], replace_where="load_date = '2024-01-02'"
    )
    got = {(r.k, r.load_date) for r in read_table(spark, path).collect()}
    assert got == {(1, "2024-01-01"), (9, "2024-01-02")}


def test_jdbc_plan_rejects_reserved_keys():
    """Caller options must not silently clobber the writer's positional
    url/dbtable/mode (a typo'd options dict would otherwise redirect the
    whole load)."""
    import pytest

    with pytest.raises(ValueError, match="reserved"):
        jdbc_plan("jdbc:postgresql://wh/db", "gold.t", "2024-06-01",
                  options={"url": "jdbc:postgresql://evil/db"})
    with pytest.raises(ValueError, match="reserved"):
        jdbc_plan("jdbc:postgresql://wh/db", "gold.t", "2024-06-01",
                  options={"mode": "overwrite", "numPartitions": "8"})
