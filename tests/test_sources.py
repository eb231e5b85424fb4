"""Source/sink round-trip tests (SURVEY.md S3-S5): typed CSV, partitioned
parquet overwrite, and CSV egress of gold tables."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources import (
    read_csv,
    write_csv,
)


def test_csv_roundtrip_typed(spark, tmp_path_factory, sf_dir):
    """S3+S5: header CSV write then schema-typed read preserves values;
    the explicit schema avoids both the inference pass and the reference's
    all-string columns (`snowflake_connection.py:79-82`)."""
    root = str(tmp_path_factory.mktemp("csv")) + "/orders"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_csv(orders, root)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
        ]
    )
    back = read_csv(spark, root, schema=schema)
    assert back.schema == schema
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_totalprice")).collect()[0][0]
    b = back.agg(F.sum("o_totalprice")).collect()[0][0]
    assert abs(a - b) < 1e-6


def test_csv_untyped_matches_reference_behavior(spark, tmp_path_factory, sf_dir):
    """Reference behavior check: CSV read without schema/inference yields
    all-string columns (the type-erasure we document and avoid)."""
    root = str(tmp_path_factory.mktemp("csv2")) + "/orders"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_totalprice")
    write_csv(orders, root)
    back = read_csv(spark, root)
    assert all(f.dataType == StringType() for f in back.schema.fields)


def test_jsonl_quarantine_split(spark, tmp_path):
    """Malformed JSON lines land in the quarantine frame with their raw
    text; good rows parse typed; nothing is dropped or fails the job."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources.readers import (
        read_jsonl_with_quarantine,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2, "name": "also ok"}\n'
        '{"id": 3, "name": BROKEN}\n'
        'not json at all\n'
    )
    schema = StructType([StructField("id", LongType()), StructField("name", StringType())])
    good, bad = read_jsonl_with_quarantine(spark, str(p), schema)
    assert {(r.id, r.name) for r in good.collect()} == {(1, "ok"), (2, "also ok")}
    quarantined = [r[0] for r in bad.collect()]
    assert len(quarantined) == 2
    assert any("BROKEN" in q for q in quarantined)
    assert any("not json at all" in q for q in quarantined)
