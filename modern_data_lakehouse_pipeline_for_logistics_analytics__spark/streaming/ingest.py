"""Structured Streaming incremental ingestion (SURVEY.md section 2.9).

The reference's incrementality is an Airflow daily re-run over a 7-day
lookback window (`scheduling/orchestration.py:90-91`,
`Silver_tranformation.py:47`) -- every run re-reads and re-writes 7 days.
The streaming file source replaces that: new bronze files are discovered
from the checkpoint log and processed exactly once;
``Trigger.AvailableNow`` gives the same run-to-completion batch cadence
with none of the re-processing.

The transform is the SAME pure function batch uses
(`pipelines.silver.silver_transform``) -- batch/streaming parity is by
construction and proven in tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipelines.silver import BRONZE_SCHEMA, silver_transform


def stream_bronze_to_silver(
    spark: SparkSession,
    bronze_root: str,
    silver_root: str,
    checkpoint_dir: str,
) -> None:
    """Incrementally flatten bronze JSON into partitioned silver parquet.

    File-source semantics at scale: ``maxFilesPerTrigger`` bounds batch
    size; the checkpoint log (not a directory diff) tracks processed
    files, so re-runs only touch new data -- the T2 late-data contract
    without the reference's 7-day rewrite.
    """
    stream = (
        spark.readStream.schema(BRONZE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .option("pathGlobFilter", "*.json")
        .json(f"{bronze_root}/*")
    )
    # load_date comes from the record itself (created_at), not a driver-side
    # loop variable: a stream has no per-date invocation.
    silver = silver_transform(stream, load_date="unset").withColumn(
        "load_date", F.date_format(F.to_date("created_at"), "yyyy-MM-dd")
    )
    (
        silver.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("load_date")
        .format("parquet")
        .outputMode("append")
        .start(silver_root)
        .awaitTermination()
    )


def stream_dedup_within_watermark(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    out_dir: str,
    checkpoint_dir: str,
    key: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> None:
    """Built-in streaming dedup: ``dropDuplicatesWithinWatermark`` keeps
    one row per key while only holding state for the watermark horizon --
    the bounded-state answer to at-least-once upstream delivery (the
    unbounded-state ``dropDuplicates`` would OOM on an infinite stream;
    the custom ``applyInPandasWithState`` variant in ``stateful.py`` is
    the escape hatch when survivor choice must be deterministic)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark([key])
    (
        deduped.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .outputMode("append")
        .start(out_dir)
        .awaitTermination()
    )


def stream_merge_upsert(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    target_path: str,
    key: str,
    checkpoint_dir: str,
    *,
    ts_col: str,
) -> None:
    """Streaming row-level upsert: each micro-batch MERGEs into the
    target table via ``sources.delta.merge_into`` (native ``MERGE INTO``
    under Delta -- txn-log exactly-once; staged parquet rewrite
    otherwise).

    This is the ``foreachBatch`` pattern that closes SURVEY T4's
    "streaming exactly-once" claim: the checkpoint makes each source file
    process once, and keyed MERGE makes a replayed batch idempotent
    (same keys -> same final rows), so the sink state is correct under
    either failure mode.  Within a batch, the LATEST row per key wins:
    ``max(struct(ts_col, payload...))`` orders by the event timestamp
    FIRST (a bare payload struct would order by schema position and pick
    max-by-value, not latest); equal-``ts_col`` ties break by payload
    values, keeping the survivor deterministic under replay.

    API note (r4): ``ts_col`` is a required keyword-only parameter.  It
    replaced the old implicit payload-struct max, which silently picked
    max-by-VALUE, not latest -- callers must name the event-time column
    explicitly; keyword-only prevents positional misbinding against
    ``checkpoint_dir``.
    """
    from ..sources.delta import merge_into

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        payload = [c for c in batch_df.columns if c != key]
        latest = F.max(
            F.struct(F.col(ts_col).alias("__ts"), *[F.col(c) for c in payload])
        ).alias("__p")
        deduped = (
            batch_df.groupBy(key)
            .agg(latest)
            .select(key, *[F.col(f"__p.{c}").alias(c) for c in payload])
        )
        merge_into(batch_df.sparkSession, target_path, deduped, key)

    (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_merge)
        .outputMode("update")
        .start()
        .awaitTermination()
    )


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Watermarked tumbling-window aggregation over a growing parquet
    directory (T5): counts+sums per (window, event_type), exactly-once via
    checkpoint, late rows beyond the watermark dropped deterministically."""
    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
    ).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.round(F.col("value") * 100)).cast("long")).alias("sum_value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value_cents")
    )
    (
        agg.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .outputMode("append")
        .start(out_dir)
        .awaitTermination()
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join (T5+): match right-stream
    rows to left-stream rows on ``key_col`` arriving within ``within``
    AFTER the left event (click -> purchase attribution, order ->
    shipment matching).

    Both sides carry a watermark and the join condition carries the
    time-range bound -- the two things Spark REQUIRES to bound the join
    state: buffered rows older than watermark + range are evicted, so
    state is O(in-horizon rows per key side), never the full streams.
    Without the range condition the state grows forever; this operator
    makes it impossible to omit.  Output: ``key_col, <left_ts>,
    <right_ts>, lag_seconds`` plus both sides' payload columns.
    """
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    # Right-side payload columns colliding with a left name (order and
    # shipment streams both carrying 'status' is the normal case) get an
    # r_ prefix -- duplicate output names are an AMBIGUOUS_REFERENCE for
    # any downstream select and a hard error for some sinks.
    left_payload = [c for c in left.columns if c not in (key_col, left_ts)]
    payload = [F.col(f"l.{c}") for c in left_payload] + [
        F.col(f"r.{c}").alias(f"r_{c}" if c in left_payload else c)
        for c in right.columns
        if c not in (key_col, right_ts)
    ]
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key_col}").alias(key_col),
        lt.alias(left_ts),
        rt.alias(right_ts),
        (rt.cast("long") - lt.cast("long")).alias("lag_seconds"),
        *payload,
    )


def run_stream_stream_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    left_schema: str,
    right_schema: str,
    key_col: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
) -> None:
    """AvailableNow harness around :func:`stream_stream_join`."""
    l = spark.readStream.schema(left_schema).parquet(left_dir)
    r = spark.readStream.schema(right_schema).parquet(right_dir)
    joined = stream_stream_join(l, r, key_col, left_ts, right_ts, within)
    (
        joined.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .outputMode("append")
        .start(out_dir)
        .awaitTermination()
    )


def stream_to_warehouse_exactly_once(
    stream: DataFrame,
    con_factory,
    table: str,
    checkpoint_dir: str,
    ledger_table: str = "__committed_batches",
    load_date: str = "1970-01-01",
) -> None:
    """Exactly-once streaming egress to a DB-API warehouse: per
    micro-batch, the data insert and a ledger row recording the batch id
    commit in ONE transaction; replayed batches (checkpoint recovery,
    sink retry) find their id in the ledger and skip.

    This is the standard foreachBatch exactly-once recipe: Spark's
    checkpoint gives at-least-once batch delivery, the transactional
    (data + ledger) write makes the duplicate delivery idempotent.  The
    warehouse must support transactions (sqlite/duckdb/postgres do);
    without them the guarantee degrades to at-least-once, exactly the
    asymmetry `sources/delta.py` documents for formatless storage.
    ``con_factory`` is called per batch (foreachBatch runs on the
    driver; connections must not be captured across batches).
    """
    from ..sources.warehouse import warehouse_ddl

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        con = con_factory()
        try:
            con.execute(
                f'CREATE TABLE IF NOT EXISTS "{ledger_table}" (batch_id BIGINT PRIMARY KEY)'
            )
            seen = con.execute(
                f'SELECT 1 FROM "{ledger_table}" WHERE batch_id = ?', (batch_id,)
            ).fetchone()
            if seen:
                return  # replayed batch: already committed atomically
            staged = batch_df.withColumn("load_date", F.lit(load_date))
            con.execute(warehouse_ddl(staged, table))  # already IF NOT EXISTS
            placeholders = ", ".join(["?"] * len(staged.columns))
            sql = f'INSERT INTO "{table}" VALUES ({placeholders})'
            # Chunked inserts inside ONE open transaction: the driver
            # holds one chunk at a time (toLocalIterator streams), while
            # atomicity still comes from the single commit below.
            chunk: list[tuple] = []
            for row in staged.toLocalIterator():
                chunk.append(tuple(row))
                if len(chunk) >= 10_000:
                    con.executemany(sql, chunk)
                    chunk = []
            if chunk:
                con.executemany(sql, chunk)
            con.execute(f'INSERT INTO "{ledger_table}" VALUES (?)', (batch_id,))
            con.commit()  # data + ledger land atomically or not at all
        except Exception:
            if hasattr(con, "rollback"):
                con.rollback()
            raise
        finally:
            con.close()

    (
        stream.writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
        .awaitTermination()
    )


def stream_enrich_with_dim(
    stream: DataFrame,
    spark: SparkSession,
    dim_path: str,
    key_col: str,
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static enrichment: join a stream against a parquet dim.

    The static side of a stream-static join is RE-RESOLVED every
    micro-batch (Spark plans the batch side fresh per trigger), so a dim
    overwritten between batches enriches subsequent batches with the NEW
    values -- no restart, no broadcast-state plumbing.  That freshness
    contract is exactly what slowly-updated reference data (courier
    registry, fx rates) needs, and it is pinned by
    ``tests/test_stream_enrich.py`` because code that accidentally
    caches the dim frame silently freezes it.  Left join: stream rows
    with no dim match pass through with nulls rather than being dropped
    (an enrichment must never lose fact rows).
    """
    dim = spark.read.parquet(dim_path).select(key_col, *dim_cols)
    return stream.join(dim, key_col, "left")


def stream_sketch_registers(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    state_path: str,
    checkpoint_dir: str,
    *,
    group_col: str,
    val_col: str,
    m: int = 64,
) -> None:
    """Incremental distinct-count maintenance: each micro-batch's
    portable-HLL registers MAX-merge into a tiny persistent state table
    ``(group, bucket, r)`` -- the streaming twin of
    ``sketches.hll_merge``.

    This is what "distinct users per day over an unbounded stream" costs
    when done right: the state is <= groups x m rows REGARDLESS of
    stream volume, each batch contributes one map-side-combinable
    aggregate, and estimates read the state table alone.  max-merge is
    idempotent and commutative, so a replayed batch (foreachBatch's
    at-least-once under failure) cannot corrupt the state -- the same
    property that makes the batch->weekly rollup lossless makes the
    streaming path exactly-once-equivalent WITHOUT a transactional sink.

    ``availableNow`` + checkpoint: catch-up batch runs now, files process
    once across restarts.
    """
    from ..operators.sketches import hll_registers

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        batch_regs = hll_registers(batch_df, [group_col], val_col, m)
        # Existence is checked explicitly: treating ANY read failure as
        # "first batch" would answer a transient FS error or corrupt
        # footer by OVERWRITING months of accumulated registers with one
        # batch's worth -- real read errors must propagate.
        hconf = s.sparkContext._jsc.hadoopConfiguration()
        jpath = s._jvm.org.apache.hadoop.fs.Path(state_path)
        exists = jpath.getFileSystem(hconf).exists(jpath)
        if exists:
            state = s.read.parquet(state_path)
            merged = (
                state.unionByName(batch_regs)
                .groupBy(group_col, "bucket")
                .agg(F.max("r").alias("r"))
            )
        else:  # first batch: no state yet
            merged = batch_regs
        # localCheckpoint materializes the merge BEFORE the overwrite --
        # `merged` reads state_path, so writing it back unstaged would
        # overwrite its own input mid-scan.  The checkpoint is released
        # as soon as the new state lands (it would otherwise pin one RDD
        # per micro-batch for the session).
        from ..operators.dedup import _unpersist_checkpoint

        staged = merged.localCheckpoint(eager=True)
        staged.write.mode("overwrite").parquet(state_path)
        _unpersist_checkpoint(staged)

    (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_merge)
        .outputMode("update")
        .start()
        .awaitTermination()
    )
