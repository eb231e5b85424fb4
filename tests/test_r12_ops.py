"""Hand cases for the r12 batch: corpus-scaled SemDeDup geometry, the
hard-negative anchor guard, and the coalesce_intervals uniqueness
enforcement (r11 verdict items 2/4 + advice)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
    hard_negative_topk,
    semantic_dedup,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.windows import (
    coalesce_intervals,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


# --------------------------------------------------------------------------
# semantic_dedup: corpus-scaled n_clusters default
# --------------------------------------------------------------------------


def test_semantic_dedup_scaled_default_floors_at_16(spark):
    # 40 vectors / target pop 250 -> ceil = 1, floored to k=16; with
    # n >= k every centroid seeds a cluster, so exactly 16 distinct
    # cluster ids can appear and every vector gets a verdict row.
    rows = [(i, [float(i), 1.0, 0.0, 0.0], 0) for i in range(40)]
    out = semantic_dedup(_emb(spark, rows), "vec_id", "embedding").collect()
    assert len(out) == 40
    assert len({r["cluster"] for r in out}) <= 16


def test_semantic_dedup_scaled_matches_explicit_k(spark):
    # n=60, pop=10 -> k = max(16, ceil(60/10)) = 16: the scaled default
    # must equal the explicit n_clusters=16 run row for row.
    rows = [
        (i, [float(i % 7), float(i % 3), 1.0, 0.0], 0) for i in range(60)
    ]
    scaled = sorted(
        map(
            tuple,
            semantic_dedup(
                _emb(spark, rows), "vec_id", "embedding",
                target_cluster_pop=10,
            ).collect(),
        )
    )
    pinned = sorted(
        map(
            tuple,
            semantic_dedup(
                _emb(spark, rows), "vec_id", "embedding", n_clusters=16
            ).collect(),
        )
    )
    assert scaled == pinned


def test_semantic_dedup_scaled_ceil_branch(spark):
    # n=60, pop=3 -> k = max(16, 20) = 20 clusters: the integer-ceiling
    # branch must actually widen the geometry (more distinct clusters
    # than the 16-floor would allow is possible; at minimum the run
    # succeeds and covers every vector exactly once).
    rows = [
        (i, [float(i), float(i % 5), 1.0, 0.0], 0) for i in range(60)
    ]
    out = semantic_dedup(
        _emb(spark, rows), "vec_id", "embedding", target_cluster_pop=3
    ).collect()
    assert len(out) == 60
    assert len({r["vec_id"] for r in out}) == 60


# --------------------------------------------------------------------------
# hard_negative_topk: bounded-anchor contract
# --------------------------------------------------------------------------


def test_hard_negative_anchor_guard_raises(spark):
    rows = [(i, [1.0, float(i)], i % 2) for i in range(8)]
    emb = _emb(spark, rows)
    with pytest.raises(ValueError, match="max_anchors"):
        hard_negative_topk(
            emb, emb, "vec_id", "embedding", "label", k=2, max_anchors=4
        )


def test_hard_negative_guard_passes_bounded_set(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 1),
        (2, [0.0, 1.0], 1),
    ]
    emb = _emb(spark, rows)
    anchors = emb.filter(F.col("vec_id") == 0)
    out = hard_negative_topk(
        emb, anchors, "vec_id", "embedding", "label", k=1, max_anchors=4
    ).collect()
    assert [(r["query_id"], r["neighbor_id"]) for r in out] == [(0, 1)]


# --------------------------------------------------------------------------
# coalesce_intervals: unique_starts contract is enforced, not trusted
# --------------------------------------------------------------------------


def test_coalesce_intervals_unique_starts_violation_raises(spark):
    df = spark.createDataFrame(
        [("A", 1, 4), ("A", 1, 6), ("A", 9, 12)], "k string, s long, e long"
    )
    bad = coalesce_intervals(df, "k", "s", "e", unique_starts=True)
    with pytest.raises(Exception, match="duplicate"):
        bad.collect()


# --------------------------------------------------------------------------
# mann_whitney_auc: exact tie-averaged rank-sum AUC
# --------------------------------------------------------------------------


def test_auc_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        mann_whitney_auc,
    )

    # pos scores [3,1] vs neg [2,0]: 3 of 4 pairs rank pos above neg.
    df = spark.createDataFrame(
        [(3.0, "pos"), (1.0, "pos"), (2.0, "neg"), (0.0, "neg")],
        "v double, c string",
    )
    out = {r["c"]: r for r in mann_whitney_auc(df, "v", "c").collect()}
    assert out["pos"]["auc_micro"] == 750_000
    assert out["neg"]["auc_micro"] == 250_000  # complement
    assert out["pos"]["n_pos"] == 2 and out["pos"]["n_neg"] == 2


def test_auc_ties_average(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        mann_whitney_auc,
    )

    # All scores equal: every pair is a tie -> AUC exactly 0.5.
    df = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (1.0, "b"), (1.0, "b"), (1.0, "b")],
        "v double, c string",
    )
    out = {r["c"]: r for r in mann_whitney_auc(df, "v", "c").collect()}
    assert out["a"]["auc_micro"] == 500_000
    assert out["b"]["auc_micro"] == 500_000


def test_auc_perfect_separation_and_nulls(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        mann_whitney_auc,
    )

    df = spark.createDataFrame(
        [(9.0, "hi"), (8.0, "hi"), (1.0, "lo"), (None, "lo"), (2.0, "lo")],
        "v double, c string",
    )
    out = {r["c"]: r for r in mann_whitney_auc(df, "v", "c").collect()}
    # NULL score dropped: hi = {9,8} beats lo = {1,2} on all 4 pairs.
    assert out["hi"]["auc_micro"] == 1_000_000
    assert out["lo"]["auc_micro"] == 0
    assert out["lo"]["n_pos"] == 2  # the NULL row is excluded


# --------------------------------------------------------------------------
# cohen_kappa: chance-corrected agreement, exact integer arithmetic
# --------------------------------------------------------------------------


def _kdf(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def test_kappa_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        cohen_kappa,
    )

    # n=6, diag=4, marginals 3/3 each side -> q=18:
    # kappa = (4*6 - 18) / (36 - 18) = 1/3.
    rows = [("x", "x"), ("x", "x"), ("y", "y"), ("x", "y"), ("y", "x"), ("y", "y")]
    out = cohen_kappa(_kdf(spark, rows), "a", "b").collect()[0]
    assert out["n"] == 6 and out["n_agree"] == 4
    assert out["agree_micro"] == 666_667      # 4/6 half-up
    assert out["expected_micro"] == 500_000   # 18/36
    assert out["kappa_micro"] == 333_333      # 1/3 floor(x+.5)


def test_kappa_negative_and_degenerate(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        cohen_kappa,
    )

    # Perfect DISagreement on a balanced 2x2: kappa = -1 exactly.
    neg = cohen_kappa(
        _kdf(spark, [("x", "y"), ("y", "x")]), "a", "b"
    ).collect()[0]
    assert neg["kappa_micro"] == -1_000_000

    # Both raters constant and identical: n^2 == q, no chance-corrected
    # signal -> sentinel -1 (and observed agreement still reads 1.0).
    dg = cohen_kappa(_kdf(spark, [("x", "x"), ("x", "x")]), "a", "b").collect()[0]
    assert dg["kappa_micro"] == -1 and dg["agree_micro"] == 1_000_000


def test_kappa_null_rows_excluded(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        cohen_kappa,
    )

    rows = [("x", "x"), (None, "x"), ("y", None), ("y", "y")]
    out = cohen_kappa(_kdf(spark, rows), "a", "b").collect()[0]
    assert out["n"] == 2 and out["n_agree"] == 2


def test_micro_ratio_survives_big_inputs(spark):
    """The split x1000/x1000 micro ratio must survive magnitudes where a
    single x1e6 multiply overflows int64 (~9.2e12 numerator), and match
    the exact half-up value."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        micro_ratio_sql,
    )

    num, den = 3_000_000_000_000_000, 4_000_000_000_000_000  # 3e15 / 4e15
    expr = micro_ratio_sql(f"CAST({num} AS BIGINT)", f"CAST({den} AS BIGINT)", "div")
    got = spark.sql(f"SELECT {expr} AS m").collect()[0]["m"]
    assert got == 750_000
    # signed path: -1/3 in micro units, half-away-from-zero
    sexpr = micro_ratio_sql("CAST(-1 AS BIGINT)", "CAST(3 AS BIGINT)", "div", signed=True)
    assert spark.sql(f"SELECT {sexpr} AS m").collect()[0]["m"] == -333_333
    import duckdb
    con = duckdb.connect()
    dexpr = micro_ratio_sql(f"CAST({num} AS BIGINT)", f"CAST({den} AS BIGINT)", "//")
    assert con.execute(f"SELECT {dexpr}").fetchone()[0] == 750_000
