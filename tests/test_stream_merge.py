"""Streaming foreachBatch MERGE upsert (T4 exactly-once shape): growing
source directory -> keyed upsert into a target table; re-runs with no new
files are no-ops.  Within a batch the LATEST row per key (by ``ts_col``)
wins -- NOT the max-by-payload-value row."""

from __future__ import annotations

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.ingest import (
    stream_merge_upsert,
)

SCHEMA = "k BIGINT, v STRING, ver BIGINT"


def _rows(spark, path):
    return {(r.k, r.v, r.ver) for r in spark.read.parquet(path).collect()}


def test_stream_merge_upsert(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], SCHEMA
    ).write.parquet(tgt)

    # Increment 1: update k=2,3 and insert k=4 (k=3 twice in one batch ->
    # the later `ver` wins).  k=6 is the latest-vs-max-value regression:
    # its max-by-value row ("z", 1) is NOT the latest row ("a", 2); a
    # payload-struct max would resurrect the stale "z".
    spark.createDataFrame(
        [(2, "B", 2), (3, "C", 2), (3, "C", 3), (4, "d", 1), (6, "z", 1), (6, "a", 2)],
        SCHEMA,
    ).write.parquet(f"{src}/inc1")
    stream_merge_upsert(spark, f"{src}/*", SCHEMA, tgt, "k", ckpt, ts_col="ver")
    expected = {(1, "a", 1), (2, "B", 2), (3, "C", 3), (4, "d", 1), (6, "a", 2)}
    assert _rows(spark, tgt) == expected

    # Re-run with no new files: checkpoint makes it a no-op.
    stream_merge_upsert(spark, f"{src}/*", SCHEMA, tgt, "k", ckpt, ts_col="ver")
    assert _rows(spark, tgt) == expected

    # Increment 2 in a later run: only the new file is processed.
    spark.createDataFrame([(1, "A", 9), (5, "e", 1)], SCHEMA).write.parquet(f"{src}/inc2")
    stream_merge_upsert(spark, f"{src}/*", SCHEMA, tgt, "k", ckpt, ts_col="ver")
    assert _rows(spark, tgt) == (expected - {(1, "a", 1)}) | {(1, "A", 9), (5, "e", 1)}
