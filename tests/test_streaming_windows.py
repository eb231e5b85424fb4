"""T5 streaming: watermarked tumbling-window aggregation over a growing
parquet directory equals the batch plan on the same rows (closed windows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.registry import (
    read_events,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.ingest import (
    stream_windowed_counts,
)


def test_streaming_windowed_agg_matches_batch(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("swin"))
    events_dir, out_dir, ckpt = f"{root}/events", f"{root}/out", f"{root}/ckpt"

    ev = read_events(spark, sf_dir)
    # two increments, split on event time
    cutoff = "2024-01-15 00:00:00"
    ev.filter(F.col("ts") < cutoff).write.parquet(f"{events_dir}/batch1")
    stream_windowed_counts(spark, f"{events_dir}/*", out_dir, ckpt)
    ev.filter(F.col("ts") >= cutoff).write.parquet(f"{events_dir}/batch2")
    stream_windowed_counts(spark, f"{events_dir}/*", out_dir, ckpt)

    streamed = spark.read.parquet(out_dir)
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.round(F.col("value") * 100)).cast("long")).alias("sum_value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value_cents")
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    # Streaming append mode only emits windows closed by the watermark; the
    # final in-flight windows may be absent. Everything emitted must match
    # batch exactly, and coverage must be essentially complete.
    assert s, "streaming emitted no windows"
    assert s <= b, f"streamed rows disagree with batch: {sorted(s - b)[:3]}"
    missing = b - s
    assert len(missing) <= 10, f"too many unemitted windows: {len(missing)}"
