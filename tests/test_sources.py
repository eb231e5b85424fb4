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


def test_orc_round_trip_typed_partitioned(spark, tmp_path_factory, sf_dir):
    """ORC round-trip preserves types exactly and partition pruning
    reaches the scan: a partition filter must leave only the matching
    partition directories in the read."""
    from pyspark.sql import functions as F

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources.readers import (
        read_orc,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources.writers import (
        write_orc_partitioned,
    )

    root = str(tmp_path_factory.mktemp("orc")) + "/orders"
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_orc_partitioned(orders, root, partition_by="o_orderstatus")
    back = read_orc(spark, root)
    # Partition column moves to the end on read; compare as sets of fields.
    assert {(f.name, f.dataType) for f in back.schema.fields} == {
        (f.name, f.dataType) for f in orders.schema.fields
    }
    assert back.count() == orders.count()
    one_status = back.filter(F.col("o_orderstatus") == "F")
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert one_status.count() == expected
    # Pruning evidence: the partition predicate reaches the ORC scan as a
    # PartitionFilter (inputFiles() lists the pre-pruning file index, so
    # the plan, not the listing, is the witness).
    plan = one_status._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1].split("]")[0], plan


def test_text_line_and_wholefile_modes(spark, tmp_path):
    """Raw-text ingestion: line mode yields one row per line (splittable,
    the 100 TB-safe default); whole-file mode one row per file.  The text
    sink writes a single string column and round-trips line content."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources.readers import (
        read_text,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources.writers import (
        write_text,
    )

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("alpha\nbeta\n")
    (d / "b.txt").write_text("gamma\n")

    lines = read_text(spark, str(d))
    assert sorted(r.value for r in lines.collect()) == ["alpha", "beta", "gamma"]

    whole = read_text(spark, str(d), whole_file=True)
    assert whole.count() == 2
    assert sorted(r.value for r in whole.collect()) == ["alpha\nbeta\n", "gamma\n"]

    out = str(tmp_path / "out")
    write_text(lines, out, column="value")
    back = read_text(spark, out)
    assert sorted(r.value for r in back.collect()) == ["alpha", "beta", "gamma"]


def test_evolve_to_schema_ingestion_edge(spark):
    """Missing columns -> typed nulls; re-typed columns try_cast (bad
    cells degrade to NULL, batch survives); case-insensitive matching;
    extras drop by default and raise in strict mode."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.cleaning import (
        evolve_to_schema,
    )

    batch = spark.createDataFrame(
        [("1", "9.5", "x", "surprise"), ("2", "oops", "y", "s2")],
        "K string, price string, keep string, extra string",
    )
    target = "k bigint, price double, keep string, added date"
    out = evolve_to_schema(batch, target)
    assert [f.name for f in out.schema.fields] == ["k", "price", "keep", "added"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double", "string", "date",
    ]
    rows = {r.k: r for r in out.collect()}
    assert rows[1].price == 9.5 and rows[1].added is None
    assert rows[2].price is None  # 'oops' try_casts to NULL, row survives

    with pytest.raises(ValueError, match="unexpected columns"):
        evolve_to_schema(batch, target, on_extra="error")
