"""End-to-end medallion pipeline tests (SURVEY.md section 5, items 4-5):
reference semantics (flatten/clean/conform, star schema, metrics formula),
idempotent partition overwrite, multiline-JSON parity, and
batch == streaming equivalence.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.bronze import (
    generate_bronze_day,
    write_bronze_json,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.gold import (
    build_gold_tables,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.silver import (
    read_bronze,
    silver_transform,
    write_silver,
)

DATE1, DATE2 = "2024-03-01", "2024-03-02"
N = 400


@pytest.fixture(scope="module")
def bronze_df(spark):
    return generate_bronze_day(spark, DATE1, N).cache()


def test_bronze_deterministic_with_edges(spark, bronze_df):
    again = generate_bronze_day(spark, DATE1, N)
    assert bronze_df.exceptAll(again).isEmpty() and again.exceptAll(bronze_df).isEmpty()
    rows = bronze_df.collect()
    assert len(rows) == N
    assert any(r.tag is None for r in rows), "planted null tags"
    assert any(r.updated_at == "not-a-timestamp" for r in rows), "planted bad timestamps"
    tns = [r.tracking_number for r in rows]
    assert len(set(tns)) < len(tns), "planted duplicate tracking numbers"
    assert all(2 <= len(r.checkpoints) <= 6 for r in rows)


def test_silver_semantics(bronze_df):
    silver = silver_transform(bronze_df, DATE1)
    rows = silver.collect()
    # fan-out: one row per (shipment, checkpoint)
    expected = sum(len(r.checkpoints) for r in bronze_df.collect())
    assert len(rows) == expected
    # fillna semantics (Silver_tranformation.py:102-106)
    assert any(r.status == "UNKNOWN" for r in rows)
    assert any(r.checkpoint_city == "UNKNOWN" for r in rows)
    assert all(r.status is not None and r.checkpoint_city is not None for r in rows)
    # to_timestamp coercion: bad strings -> null (not job failure)
    assert any(r.updated_at is None for r in rows)
    # delivery_status rule (Silver_tranformation.py:107-111)
    for r in rows:
        want = "SUCCESS" if r.status in ("DELIVERED", "OUTFORDELIVERY") else "PENDING"
        assert r.delivery_status == want
    # normalization (F1): courier/status upper-cased
    assert all(r.courier == r.courier.upper() for r in rows)


def test_gold_star_schema_golden(spark, bronze_df, tmp_path_factory):
    """Gold metrics cross-checked by DuckDB over the written silver parquet
    (independent recomputation of `starschema.py:137-145`)."""
    root = str(tmp_path_factory.mktemp("lake"))
    silver = silver_transform(bronze_df, DATE1)
    write_silver(silver, f"{root}/silver")
    silver_back = spark.read.parquet(f"{root}/silver")
    gold = build_gold_tables(silver_back)

    got = {
        r.courier: (r.total_shipments, r.delivered_shipments, r.avg_delivery_days, r.delivery_success_pct)
        for r in gold["fact_courier_metrics"].collect()
    }
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT courier,
               COUNT(DISTINCT tracking_number) AS total,
               COUNT(*) FILTER (WHERE status = 'DELIVERED') AS delivered,
               ROUND(AVG(delivery_days), 2) AS avg_days,
               ROUND(COUNT(*) FILTER (WHERE status = 'DELIVERED')
                     / COUNT(DISTINCT tracking_number) * 100, 2) AS pct
        FROM read_parquet('{root}/silver/*/*.parquet')
        GROUP BY courier
        """
    ).fetchall()
    assert got == {w[0]: (w[1], w[2], w[3], w[4]) for w in want}

    # dims: distinct natural keys, injective deterministic surrogate ids
    dim = gold["dim_courier"].collect()
    assert len({r.courier for r in dim}) == len(dim)
    assert len({r.courier_id for r in dim}) == len(dim)
    again = {(r.courier, r.courier_id) for r in build_gold_tables(silver_back)["dim_courier"].collect()}
    assert again == {(r.courier, r.courier_id) for r in dim}, "ids stable across runs"

    # fact_shipment grain: one row per shipment
    fs = gold["fact_shipment"]
    assert fs.count() == fs.select("tracking_number", "courier", "created_at").distinct().count()


def test_partition_overwrite_idempotent(spark, tmp_path_factory):
    """T4: re-running one date rewrites only that partition (dynamic
    partition overwrite), leaving siblings intact."""
    root = str(tmp_path_factory.mktemp("lake2"))
    for d in (DATE1, DATE2):
        write_silver(silver_transform(generate_bronze_day(spark, d, 100), d), f"{root}/silver")
    before = spark.read.parquet(f"{root}/silver").groupBy("load_date").count().collect()
    # re-run DATE1 only
    write_silver(silver_transform(generate_bronze_day(spark, DATE1, 100), DATE1), f"{root}/silver")
    after = spark.read.parquet(f"{root}/silver").groupBy("load_date").count().collect()
    assert sorted((r.load_date, r["count"]) for r in before) == sorted(
        (r.load_date, r["count"]) for r in after
    )


def test_multiline_json_array_parity(spark, bronze_df, tmp_path_factory):
    """S1: the reference's one-JSON-array-per-file layout
    (`extraction.py:128`) reads identically to JSON-lines."""
    root = str(tmp_path_factory.mktemp("bronze"))
    jl_path = write_bronze_json(bronze_df, root, DATE1)
    rows = [json.loads(line) for f in os.listdir(jl_path) if f.endswith(".json")
            for line in open(os.path.join(jl_path, f))]
    array_dir = os.path.join(root, "array", DATE1)
    os.makedirs(array_dir)
    with open(os.path.join(array_dir, "data.json"), "w") as fh:
        json.dump(rows, fh)

    df_lines = read_bronze(spark, jl_path)
    df_array = read_bronze(spark, array_dir, multiline=True)
    s1 = silver_transform(df_lines, DATE1).drop("load_timestamp")
    s2 = silver_transform(df_array, DATE1).drop("load_timestamp")
    assert s1.exceptAll(s2).isEmpty() and s2.exceptAll(s1).isEmpty()


def test_streaming_matches_batch(spark, tmp_path_factory):
    """T1: AvailableNow incremental ingest over a growing bronze dir equals
    the batch transform on the same input, across two increments."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.ingest import (
        stream_bronze_to_silver,
    )

    root = str(tmp_path_factory.mktemp("stream"))
    bronze_root, silver_root, ckpt = f"{root}/bronze", f"{root}/silver", f"{root}/ckpt"

    d1 = generate_bronze_day(spark, DATE1, 150)
    write_bronze_json(d1, bronze_root, DATE1)
    stream_bronze_to_silver(spark, bronze_root, silver_root, ckpt)

    d2 = generate_bronze_day(spark, DATE2, 150)
    write_bronze_json(d2, bronze_root, DATE2)
    stream_bronze_to_silver(spark, bronze_root, silver_root, ckpt)  # only new files

    streamed = spark.read.parquet(silver_root).drop("load_timestamp", "load_date")
    batch = (
        silver_transform(read_bronze(spark, f"{bronze_root}/{DATE1}"), DATE1)
        .unionByName(silver_transform(read_bronze(spark, f"{bronze_root}/{DATE2}"), DATE2))
        .drop("load_timestamp", "load_date")
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).isEmpty() and batch.exceptAll(streamed).isEmpty()


def test_silver_quality_observation_free_metrics(spark, tmp_path_factory):
    """Observation metrics ride the write job (no second scan) and agree
    with independent recomputation over the written output."""
    from pyspark.sql import functions as F

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.bronze import (
        generate_bronze_day,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.silver import (
        silver_transform,
        write_silver_observed,
    )

    root = str(tmp_path_factory.mktemp("obs"))
    silver = silver_transform(generate_bronze_day(spark, DATE1, 80), DATE1)
    metrics = write_silver_observed(silver, f"{root}/silver")

    written = spark.read.parquet(f"{root}/silver")
    check = written.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("created_at").isNull().cast("long")).alias("null_created_at"),
        F.sum((F.col("status") == "UNKNOWN").cast("long")).alias("unknown_status"),
        F.sum((F.col("delivery_status") == "SUCCESS").cast("long")).alias("n_success"),
    ).first()
    assert metrics["n_rows"] == check.n_rows > 0
    assert metrics["null_created_at"] == (check.null_created_at or 0)
    assert metrics["unknown_status"] == (check.unknown_status or 0)
    assert metrics["n_success"] == (check.n_success or 0)


def test_enrich_or_park_late_dimension_retry(spark):
    """Facts arriving before their dim row park losslessly and enrich on
    the retry once the dim catches up; nothing is dropped or published
    half-null."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dims import (
        enrich_or_park,
    )

    facts = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "ck long, amount double"
    )
    dim_v1 = spark.createDataFrame([(1, "gold"), (2, "silver")], "ck long, tier string")
    enriched, parked = enrich_or_park(facts, dim_v1, "ck", ["tier"])
    assert {(r.ck, r.tier) for r in enriched.collect()} == {(1, "gold"), (2, "silver")}
    assert [tuple(r) for r in parked.collect()] == [(3, 30.0)]  # original schema
    assert enriched.count() + parked.count() == facts.count()

    # dim catches up -> the parked frame IS the retry input
    dim_v2 = dim_v1.union(spark.createDataFrame([(3, "bronze")], "ck long, tier string"))
    retried, still_parked = enrich_or_park(parked, dim_v2, "ck", ["tier"])
    assert {(r.ck, r.tier) for r in retried.collect()} == {(3, "bronze")}
    assert still_parked.isEmpty()
