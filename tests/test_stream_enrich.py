"""Stream-static join freshness: the dim re-resolves per micro-batch, so
an overwrite between batches is visible WITHOUT restarting the query's
checkpoint; unmatched stream rows survive with nulls."""

from __future__ import annotations

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.streaming.ingest import (
    stream_enrich_with_dim,
)

SCHEMA = "k long, v double"


def _run(spark, in_glob, dim_path, out_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(in_glob)
    enriched = stream_enrich_with_dim(stream, spark, dim_path, "k", ["label"])
    (
        enriched.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .outputMode("append")
        .start(out_dir)
        .awaitTermination()
    )


def test_dim_updates_visible_across_batches(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("enrich"))
    in_dir, dim, out_dir, ckpt = f"{root}/in", f"{root}/dim", f"{root}/out", f"{root}/ck"

    spark.createDataFrame([(1, "old"), (2, "two")], "k long, label string").write.parquet(dim)
    spark.createDataFrame([(1, 1.0), (9, 9.0)], SCHEMA).write.parquet(f"{in_dir}/b1")
    _run(spark, f"{in_dir}/*", dim, out_dir, ckpt)

    # Overwrite the dim BETWEEN batches; same checkpoint continues.
    spark.createDataFrame([(1, "NEW"), (2, "two")], "k long, label string").write.mode(
        "overwrite"
    ).parquet(dim)
    spark.createDataFrame([(1, 2.0)], SCHEMA).write.parquet(f"{in_dir}/b2")
    _run(spark, f"{in_dir}/*", dim, out_dir, ckpt)

    rows = {(r.k, r.v): r.label for r in spark.read.parquet(out_dir).collect()}
    assert rows[(1, 1.0)] == "old"    # batch 1 saw the old dim
    assert rows[(1, 2.0)] == "NEW"    # batch 2 sees the overwrite
    assert rows[(9, 9.0)] is None     # unmatched row survives with null
