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
