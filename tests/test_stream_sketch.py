"""Streaming sketch maintenance: per-batch register MAX-merge into a
bounded state table; final estimates equal the one-shot batch sketch
over all data (merge losslessness, streaming twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
    distinct_sketch,
    hll_estimate,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.ingest import (
    stream_sketch_registers,
)

SCHEMA = "day STRING, user_id BIGINT"


def test_stream_sketch_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    b1 = [("d1", i) for i in range(0, 300)] + [("d2", i) for i in range(0, 50)]
    b2 = [("d1", i) for i in range(200, 500)] + [("d2", i) for i in range(25, 80)]
    spark.createDataFrame(b1, SCHEMA).write.parquet(f"{src}/inc1")
    stream_sketch_registers(
        spark, f"{src}/*", SCHEMA, state, ckpt, group_col="day", val_col="user_id"
    )
    spark.createDataFrame(b2, SCHEMA).write.parquet(f"{src}/inc2")
    stream_sketch_registers(
        spark, f"{src}/*", SCHEMA, state, ckpt, group_col="day", val_col="user_id"
    )

    # state is bounded: <= groups x m rows
    st = spark.read.parquet(state)
    assert st.count() <= 2 * 64

    got = {
        r["day"]: r["est"]
        for r in hll_estimate(st, ["day"]).collect()
    }
    full = spark.createDataFrame(b1 + b2, SCHEMA)
    want = {r["day"]: r["est"] for r in distinct_sketch(full, ["day"], "user_id").collect()}
    assert got == want  # streaming merge == one-shot batch sketch, exactly

    # replayed/no-new-files run is a no-op (checkpoint + idempotent merge)
    stream_sketch_registers(
        spark, f"{src}/*", SCHEMA, state, ckpt, group_col="day", val_col="user_id"
    )
    got2 = {r["day"]: r["est"] for r in hll_estimate(spark.read.parquet(state), ["day"]).collect()}
    assert got2 == want
