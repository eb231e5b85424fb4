"""Spark 4 Python Data Source: executor-side generation with real
partition planning -- content is invariant to the partitioning, reads
are deterministic, and the planned task count matches the option."""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.sources.pydatasource import (
    register_synthetic_docs,
)


def _read(spark, rows, partitions):
    register_synthetic_docs(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", str(rows))
        .option("partitions", str(partitions))
        .load()
    )


def test_rows_schema_and_partition_planning(spark):
    df = _read(spark, 200, 8)
    assert [f.name for f in df.schema.fields] == ["doc_id", "text", "shard"]
    assert df.count() == 200
    # one InputPartition per shard -> 8 scan partitions / distinct shards
    assert df.select("shard").distinct().count() == 8
    assert df.rdd.getNumPartitions() == 8
    # ids are a complete 0..n-1 range, no dupes across shards
    got = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("d"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).first()
    assert (got.n, got.d, got.lo, got.hi) == (200, 200, 0, 199)


def test_content_invariant_to_partitioning(spark):
    """Partitioning is layout, not content: the same (doc_id -> text)
    table comes back under any partition count, and repeated reads are
    byte-identical (pure function of doc_id, no RNG state)."""
    a = {(r.doc_id, r.text) for r in _read(spark, 120, 3).drop("shard").collect()}
    b = {(r.doc_id, r.text) for r in _read(spark, 120, 7).drop("shard").collect()}
    c = {(r.doc_id, r.text) for r in _read(spark, 120, 3).drop("shard").collect()}
    assert a == b == c
    assert len(a) == 120


def test_composes_with_engine_operators(spark):
    """The source is a real DataFrame source: engine operators run on it
    directly (here: exact dedup over the generated corpus)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        exact_dedup_groups,
    )

    df = _read(spark, 150, 4)
    groups = exact_dedup_groups(df, "doc_id", "text")
    assert groups.agg(F.sum("n_copies")).first()[0] == 150
