"""Semantics tests for the r15 ANN quality scoreboard family
(``ann_recall_audit``, ``ann_ivf_nprobe_sweep``).  The driver hash-gate
proves cross-engine equality; these prove the VALUES mean what the
docstrings claim (recall bounds, axis monotonicity, the
verify-once/fan-out subset property)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_recall_audit_bounds_and_shape(spark, sf_dir):
    rows = {r.method: r for r in QUERIES["ann_recall_audit"](spark, sf_dir).collect()}
    assert set(rows) == {"portable_lsh", "portable_ivf"}
    for r in rows.values():
        assert r.n_truth_pairs > 0
        assert 0 <= r.n_hit <= min(r.n_retrieved, r.n_truth_pairs)
        assert 0 <= r.recall_bp <= 10_000
        # recall_bp is exactly the half-up integer ratio of the counts.
        assert r.recall_bp == (r.n_hit * 20_000 + r.n_truth_pairs) // (
            2 * r.n_truth_pairs
        )


def test_nprobe_sweep_monotone(spark, sf_dir):
    """Probing more clusters only grows the candidate set, so recall@10
    must be non-decreasing along the nprobe axis, and the full axis is
    present even where counts repeat."""
    rows = sorted(
        QUERIES["ann_ivf_nprobe_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    hits = [r.n_hit for r in rows]
    assert hits == sorted(hits), f"n_hit not monotone over nprobe: {hits}"
    assert all(r.n_truth_pairs == rows[0].n_truth_pairs for r in rows)


def test_nprobe_fanout_matches_direct_topk(spark, sf_dir):
    """The sweep's nprobe=4 top-10 pair set must equal a direct
    ``ivf_portable_topk(nprobe=4)`` run -- the fan-out rank-filter is a
    re-expression, not an approximation of the production plan."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        ivf_portable_scored_candidates,
        ivf_portable_topk,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.registry import (
        table_path,
    )
    from pyspark.sql import Window

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") < 5)
    direct = {
        (r.query_id, r.neighbor_id)
        for r in ivf_portable_topk(
            emb, queries, "vec_id", "embedding", k=10, n_clusters=16, nprobe=4
        ).collect()
    }
    scored = ivf_portable_scored_candidates(
        emb, queries, "vec_id", "embedding", n_clusters=16, max_nprobe=8
    ).filter(F.col("probe_rank") <= 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    fanned = {
        (r.query_id, r.neighbor_id)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .collect()
    }
    assert fanned == direct
