"""applyInPandasWithState: cross-batch streaming dedup emits each key
exactly once, even when duplicates arrive in LATER micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.stateful import (
    run_streaming_dedup,
)

SCHEMA = "tn string, ts timestamp, courier string"


def test_streaming_dedup_across_batches(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sdedup"))
    in_dir, out_dir, ckpt = f"{root}/in", f"{root}/out", f"{root}/ckpt"

    def mk(rows):
        return spark.createDataFrame(rows, ["tn", "ts_s", "courier"]).select(
            "tn", F.col("ts_s").cast("timestamp").alias("ts"), "courier"
        )

    # batch 1: two keys, one in-batch duplicate (later ts must lose)
    mk(
        [
            ("A", "2024-01-01 10:00:00", "DHL"),
            ("A", "2024-01-01 12:00:00", "UPS"),
            ("B", "2024-01-01 11:00:00", "FEDEX"),
        ]
    ).write.parquet(f"{in_dir}/b1")
    run_streaming_dedup(spark, f"{in_dir}/*", out_dir, ckpt, "tn", "ts", ["courier"], SCHEMA)

    # batch 2: cross-batch duplicate of A (must NOT re-emit) + new key C
    mk(
        [
            ("A", "2024-01-02 09:00:00", "USPS"),
            ("C", "2024-01-02 10:00:00", "DPD"),
        ]
    ).write.parquet(f"{in_dir}/b2")
    run_streaming_dedup(spark, f"{in_dir}/*", out_dir, ckpt, "tn", "ts", ["courier"], SCHEMA)

    out = {r.tn: (str(r.ts), r.courier) for r in spark.read.parquet(out_dir).collect()}
    assert out == {
        "A": ("2024-01-01 10:00:00", "DHL"),   # first-seen wins, in-batch dup dropped
        "B": ("2024-01-01 11:00:00", "FEDEX"),
        "C": ("2024-01-02 10:00:00", "DPD"),   # new key in batch 2 emitted
    }


def test_transform_with_state_running_totals(spark, tmp_path_factory):
    """Spark 4 transformWithStateInPandas: per-key running totals
    accumulate across micro-batches through the checkpointed ValueState
    (batch 2 continues batch 1's counts, not a fresh zero).

    Skip-gated on google.protobuf: the new API's state protocol speaks
    protobuf between the JVM state server and the Python driver worker,
    and this sandbox has no protobuf wheel (real clusters ship it with
    pyspark[connect]).  The applyInPandasWithState test above covers the
    stateful semantics unconditionally."""
    import pytest

    try:
        import google.protobuf.descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not installed (transformWithState state protocol)")
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.stateful import (
        run_streaming_totals,
    )

    root = str(tmp_path_factory.mktemp("stotals"))
    in_dir, out_dir, ckpt = f"{root}/in", f"{root}/out", f"{root}/ckpt"
    schema = "k string, v double"

    spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 10.0)], schema
    ).write.parquet(f"{in_dir}/b1")
    run_streaming_totals(spark, f"{in_dir}/*", out_dir, ckpt, "k", "v", schema)

    spark.createDataFrame([("A", 4.0), ("C", 7.0)], schema).write.parquet(
        f"{in_dir}/b2"
    )
    run_streaming_totals(spark, f"{in_dir}/*", out_dir, ckpt, "k", "v", schema)

    # append sink: keep the LATEST (cnt, total) per key = max cnt row
    rows = spark.read.parquet(out_dir).collect()
    latest = {}
    for r in rows:
        if r.k not in latest or r.cnt > latest[r.k].cnt:
            latest[r.k] = r
    assert (latest["A"].cnt, latest["A"].total) == (3, 7.0)
    assert (latest["B"].cnt, latest["B"].total) == (1, 10.0)
    assert (latest["C"].cnt, latest["C"].total) == (1, 7.0)
