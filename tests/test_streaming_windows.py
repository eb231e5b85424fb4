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
    # Streaming append mode only emits windows closed by the watermark:
    # a window [start, start+1h) is guaranteed emitted once the final
    # watermark (max event time - 2h delay) strictly passes its end, so
    # the only legitimately-missing windows are those with
    # start >= max(ts) - (window + delay).  No magic row-count bound.
    from datetime import timedelta

    max_ts = ev.agg(F.max("ts")).first()[0]
    closed_before = max_ts - timedelta(hours=3)  # 1h window + 2h watermark delay
    assert s, "streaming emitted no windows"
    assert s <= b, f"streamed rows disagree with batch: {sorted(s - b)[:3]}"
    stale = {r for r in (b - s) if r[0] < closed_before}
    assert not stale, f"windows closed by the watermark were not emitted: {sorted(stale)[:3]}"
