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


# --------------------------------------------------------------------------
# Exact Mann-Whitney AUC: one-vs-rest ranking quality of the value signal
# --------------------------------------------------------------------------


def _auc_oracle() -> str:
    from ..operators.experiments import micro_ratio_sql

    auc = micro_ratio_sql(
        "s2 - n_pos * (n_pos + 1)", "2 * n_pos * (n - n_pos)", "//"
    )
    return f"""
    WITH src AS (
      SELECT value AS s, event_type AS cls FROM events
      WHERE value IS NOT NULL),
    h AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt FROM src GROUP BY 1),
    c AS (SELECT s, cnt,
                 CAST(SUM(cnt) OVER (ORDER BY s) AS BIGINT) AS cum
          FROM h),
    r AS (SELECT s, 2 * cum - cnt + 1 AS r2 FROM c),
    pc AS (SELECT cls, s, CAST(COUNT(*) AS BIGINT) AS cnt_c
           FROM src GROUP BY 1, 2),
    agg AS (SELECT cls, CAST(SUM(cnt_c * r2) AS BIGINT) AS s2,
                   CAST(SUM(cnt_c) AS BIGINT) AS n_pos
            FROM pc JOIN r USING (s) GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM src)
    SELECT cls AS event_type, n_pos, n - n_pos AS n_neg,
           CASE WHEN n > n_pos THEN {auc}
           ELSE -1 END AS auc_micro
    FROM agg CROSS JOIN tot"""


@register("auc_score_by_event_type", oracle=_auc_oracle())
def q_auc_score_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the event ``value`` rank each event type above the rest?
    Exact tie-averaged Mann-Whitney AUC per class, every intermediate an
    integer, selection fully distributed (histogram + range-partitioned
    prefix sum -- no global sort)
    (`operators/experiments.py::mann_whitney_auc`)."""
    from ..operators.experiments import mann_whitney_auc

    return mann_whitney_auc(
        _t(spark, sf_dir, "events"), "value", "event_type"
    )


# --------------------------------------------------------------------------
# Cohen's kappa: does the lang-ID heuristic agree with the labels?
# --------------------------------------------------------------------------


def _kappa_oracle() -> str:
    from ..operators.experiments import kappa_micro_sql, micro_ratio_sql
    from .textstats import LANGID_PRED_EXPR, LANGID_VOTE_CTES

    return f"""
    WITH {LANGID_VOTE_CTES},
    pred AS (SELECT doc_id, {LANGID_PRED_EXPR} AS lang_pred FROM s3),
    pairs AS (
      SELECT d.lang AS a, p.lang_pred AS b
      FROM documents d JOIN pred p USING (doc_id)
      WHERE d.lang IS NOT NULL AND p.lang_pred IS NOT NULL),
    ct AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
           FROM pairs GROUP BY 1, 2),
    ra AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM ct GROUP BY 1),
    cb AS (SELECT b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM ct GROUP BY 1),
    dg AS (SELECT CAST(COALESCE(SUM(n_ab), 0) AS BIGINT) AS d
           FROM ct WHERE a = b),
    qq AS (SELECT CAST(COALESCE(SUM(n_a * n_b), 0) AS BIGINT) AS q
           FROM ra JOIN cb ON ra.a = cb.b),
    nn AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM ct)
    SELECT n, d AS n_agree,
           {micro_ratio_sql('d', 'n', '//')} AS agree_micro,
           {micro_ratio_sql('q', 'n * n', '//')} AS expected_micro,
           {kappa_micro_sql('//')} AS kappa_micro
    FROM nn CROSS JOIN dg CROSS JOIN qq"""


@register("kappa_langid_vs_label", oracle=_kappa_oracle())
def q_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the marker-word lang-ID prediction and the
    labeled ``lang`` column -- chance-corrected classifier agreement,
    exact integer contingency arithmetic, the kappa expression text
    shared verbatim between engines
    (`operators/experiments.py::cohen_kappa`, the predictor is
    `operators/textstats.py::language_votes`)."""
    from ..operators.experiments import cohen_kappa
    from ..operators.textstats import language_votes

    docs = _t(spark, sf_dir, "documents")
    pred = language_votes(docs, "doc_id", "text").select("doc_id", "lang_pred")
    joined = docs.select("doc_id", "lang").join(pred, "doc_id")
    return cohen_kappa(joined, "lang", "lang_pred")
