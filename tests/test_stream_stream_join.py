"""Watermarked stream-stream join: in-range pairs match (including
across micro-batches through the checkpointed join state), out-of-range
pairs never do, and the batch plan is a vanilla inner join with the
identical predicate (stream/batch parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.ingest import (
    run_stream_stream_join,
    stream_stream_join,
)

L_SCHEMA = "k string, lts timestamp, page string"
R_SCHEMA = "k string, rts timestamp, amount double"


def _mk(spark, schema, rows, ts_col):
    cols = [f.split()[0] for f in schema.split(", ")]
    return spark.createDataFrame(rows, ", ".join(c + " string" if c == ts_col else f for c, f in zip(cols, schema.split(", ")))).withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )


def test_stream_stream_join_within_horizon(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ssj"))
    l_dir, r_dir = f"{root}/l", f"{root}/r"
    out_dir, ckpt = f"{root}/out", f"{root}/ckpt"

    # batch 1: left clicks; one right purchase in range, one beyond 1h
    _mk(spark, L_SCHEMA, [("u1", "2024-01-01 10:00:00", "home"),
                          ("u2", "2024-01-01 10:00:00", "search")], "lts").write.parquet(f"{l_dir}/b1")
    _mk(spark, R_SCHEMA, [("u1", "2024-01-01 10:30:00", 5.0),
                          ("u2", "2024-01-01 12:30:00", 9.0)], "rts").write.parquet(f"{r_dir}/b1")
    run_stream_stream_join(
        spark, f"{l_dir}/*", f"{r_dir}/*", out_dir, ckpt,
        L_SCHEMA, R_SCHEMA, "k", "lts", "rts", within="1 hour",
    )
    got = {(r.k, r.lag_seconds) for r in spark.read.parquet(out_dir).collect()}
    assert got == {("u1", 1800)}  # u2's purchase is 2.5h later: no match

    # batch 2: a NEW right-side row matching batch 1's buffered left row
    # (cross-batch match through the checkpointed join state).
    _mk(spark, R_SCHEMA, [("u2", "2024-01-01 10:45:00", 3.0)], "rts").write.parquet(
        f"{r_dir}/b2"
    )
    run_stream_stream_join(
        spark, f"{l_dir}/*", f"{r_dir}/*", out_dir, ckpt,
        L_SCHEMA, R_SCHEMA, "k", "lts", "rts", within="1 hour",
    )
    got = {(r.k, r.lag_seconds) for r in spark.read.parquet(out_dir).collect()}
    assert got == {("u1", 1800), ("u2", 2700)}


def test_stream_stream_join_batch_parity(spark):
    """The operator applied to BATCH frames gives the same rows as the
    streaming run's semantics (inner join + range bound), so the join
    condition has one definition for both execution modes."""
    l = _mk(spark, L_SCHEMA, [("a", "2024-01-01 10:00:00", "p"),
                              ("b", "2024-01-01 10:00:00", "q")], "lts")
    r = _mk(spark, R_SCHEMA, [("a", "2024-01-01 10:59:00", 1.0),
                              ("a", "2024-01-01 11:01:00", 2.0),
                              ("b", "2024-01-01 09:59:00", 3.0)], "rts")
    out = stream_stream_join(l, r, "k", "lts", "rts", within="1 hour").collect()
    assert {(x.k, x.amount) for x in out} == {("a", 1.0)}  # after-left only, <= 1h


def test_stream_stream_join_colliding_payload_names(spark):
    """Shared payload column names (both streams carrying 'status') get
    an r_ prefix on the right side instead of producing ambiguous
    duplicate output columns."""
    l = _mk(spark, "k string, lts timestamp, status string",
            [("a", "2024-01-01 10:00:00", "clicked")], "lts")
    r = _mk(spark, "k string, rts timestamp, status string",
            [("a", "2024-01-01 10:30:00", "paid")], "rts")
    out = stream_stream_join(l, r, "k", "lts", "rts", within="1 hour")
    assert out.columns.count("status") == 1 and "r_status" in out.columns
    row = out.collect()[0]
    assert (row.status, row.r_status) == ("clicked", "paid")
