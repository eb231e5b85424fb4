"""Streaming dedup-within-watermark: duplicates across micro-batches
inside the watermark horizon collapse to one surviving row."""

from __future__ import annotations

from datetime import datetime

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.ingest import (
    stream_dedup_within_watermark,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP, v STRING"


def _t(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_stream_dedup_within_watermark(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    spark.createDataFrame(
        [(1, _t("2024-01-01 10:00:00"), "a"), (2, _t("2024-01-01 10:05:00"), "b"),
         (1, _t("2024-01-01 10:10:00"), "a-dup")],
        SCHEMA,
    ).write.parquet(f"{src}/b1")
    stream_dedup_within_watermark(spark, f"{src}/*", SCHEMA, out, ckpt)

    # second increment: another duplicate of 1 and 2 (within watermark)
    # plus a genuinely new key
    spark.createDataFrame(
        [(2, _t("2024-01-01 10:20:00"), "b-dup"), (3, _t("2024-01-01 10:30:00"), "c")],
        SCHEMA,
    ).write.parquet(f"{src}/b2")
    stream_dedup_within_watermark(spark, f"{src}/*", SCHEMA, out, ckpt)

    rows = spark.read.parquet(out).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.event_id, []).append(r.v)
    assert sorted(by_key) == [1, 2, 3]
    assert all(len(v) == 1 for v in by_key.values()), f"duplicates survived: {by_key}"
