"""Round-12 widening: corpus-scaled SemDeDup geometry (the r11 verdict's
fixed-k remedy, registered rather than left in a probe table) and the
streaming state-store audit (r11 verdict item 8: make the streaming
state evidence registry-visible, not pytest-only).

Each query follows the portable-oracle recipe (shared constants, BIGINT
arithmetic, integer-ceiling k both engines compute from COUNT(*)) so the
driver hash-verifies values, not just shapes.  Reference parity: none of
these exist in the reference -- they extend the similarity and streaming
families per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .coverage6 import _SEMDEDUP_SCALE, _SEMDEDUP_THR, semdedup_verdict_sql
from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# --------------------------------------------------------------------------
# SemDeDup at the corpus-scaled geometry: k = max(16, ceil(n / pop))
# --------------------------------------------------------------------------

# Registered demo pop of 25 exercises the ceil branch at the oracle scale
# (sf0.01: 500 vectors -> k = 20, a genuinely different geometry than the
# pinned k=16 of semdedup_portable) and gives the bench scale a bounded
# quadratic stage (sf0.1: 5000 -> k = 200, cluster pop ~ 25).  The
# OPERATOR default (target_cluster_pop=250) is the production setting;
# both run the identical code path.
_SEMDEDUP_POP = 25

# Integer ceiling (n + pop - 1) // pop: the exact arithmetic
# semantic_dedup runs in Python when n_clusters=None -- float CEIL would
# be a second, driftable formula.
_SEMDEDUP_K_EXPR = (
    f"(SELECT GREATEST(16, (COUNT(*) + {_SEMDEDUP_POP - 1}) // {_SEMDEDUP_POP})"
    " FROM embeddings)"
)


@register("semdedup_scaled", oracle=semdedup_verdict_sql(_SEMDEDUP_K_EXPR))
def q_semdedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the corpus-scaled default geometry: ``n_clusters``
    derives from the corpus count (max(16, ceil(n / 25)) here), so the
    within-cluster quadratic stage stays bounded at any scale -- the
    production shape; ``semdedup_portable`` pins k=16 as the validated
    small-scale geometry (`operators/similarity.py::semantic_dedup`)."""
    from ..operators.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        n_clusters=None,
        threshold=_SEMDEDUP_THR,
        scale=_SEMDEDUP_SCALE,
        target_cluster_pop=_SEMDEDUP_POP,
    )


# --------------------------------------------------------------------------
# Streaming state-store audit: what is ACTUALLY in the checkpoint
# --------------------------------------------------------------------------


@register(
    "stream_state_audit",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS uid, MIN(ts) AS first_ts
    FROM events GROUP BY user_id""",
)
def q_stream_state_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming state-store audit, end to end: run the checkpointed
    ``applyInPandasWithState`` first-per-key dedup over the events table
    (one AvailableNow batch), then read the COMMITTED state back through
    Spark 4's state data source (``format("statestore")``) and emit one
    row per state entry.  The oracle is the batch truth the state must
    equal -- ``MIN(ts)`` per user -- so a hash match proves the stream
    ran, the state persisted, and the state reader decodes it correctly
    (`streaming/stateful.py::streaming_first_per_key, read_dedup_state`).
    The single-batch shape is guaranteed: each fixture table is one
    parquet file, far under the file source's per-trigger cap.

    Scale posture: state is O(distinct keys) partitioned by key; the
    audit read is partition-parallel over the store files and never
    replays the stream.  The checkpoint lives in a fixed scratch dir per
    scale, recreated per call (the run IS the query)."""
    import shutil

    from ..streaming.stateful import read_dedup_state, streaming_first_per_key

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = f"/tmp/spark_graft_state_audit_{tag}"
    shutil.rmtree(root, ignore_errors=True)
    sch = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(sch)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    src = stream.select(
        F.col("user_id").cast("string").alias("uid"), F.col("ts")
    )
    deduped = streaming_first_per_key(src, "uid", "ts", [])
    (
        deduped.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", f"{root}/ckpt")
        .format("parquet")
        .outputMode("append")
        .start(f"{root}/out")
        .awaitTermination()
    )
    return read_dedup_state(spark, f"{root}/ckpt", "uid", "first_ts")
