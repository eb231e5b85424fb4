"""Operator-level tests for the round-9 widening batch: fixed-point
k-means, bounded weighted shortest paths, and the rest of the r9
additions.  Each operator gets a HAND-COMPUTABLE case (oracle queries
prove fixture-scale parity; these prove semantics a fixture might
dodge -- empty clusters, tie-breaks, relaxation improving a distance
in a later round)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.clustering import (
    kmeans_lloyd_fixedpoint,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
    shortest_paths_bounded,
)


# --------------------------------------------------------------- k-means
def test_kmeans_hand_case_two_clusters(spark):
    # scale 10: vf = [0,0],[2,0],[10,10],[8,10]; init c0=[0,0], c1=[2,0].
    # iter1: assign {1}->c0, {2,3,4}->c1; c1 -> [20//3, 20//3] = [6,6]
    # iter2: assign {1,2}->c0, {3,4}->c1; c0 -> [1,0], c1 -> [9,10];
    # inertia: c0 = 0+4, c1 = 32+20.
    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [0.2, 0.0]),
            (3, [1.0, 1.0]),
            (4, [0.8, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["cluster"], r["i"]): (r["c_fp"], r["n_pts"], r["inertia_fp"])
        for r in kmeans_lloyd_fixedpoint(
            df, k=2, iterations=2, dim=2, scale=10
        ).collect()
    }
    assert got == {
        (0, 0): (1, 2, 4),
        (0, 1): (0, 2, 4),
        (1, 0): (9, 2, 52),
        (1, 1): (10, 2, 52),
    }


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # Duplicate seed vectors: every point ties to cluster 0 (lowest
    # index wins), cluster 1 goes empty and must KEEP its init centroid
    # with n_pts = 0, inertia = 0.
    df = spark.createDataFrame(
        [(i, [0.5, 0.5]) for i in (1, 2, 3)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["cluster"], r["i"]): (r["c_fp"], r["n_pts"], r["inertia_fp"])
        for r in kmeans_lloyd_fixedpoint(
            df, k=2, iterations=1, dim=2, scale=10
        ).collect()
    }
    assert got == {
        (0, 0): (5, 3, 0),
        (0, 1): (5, 3, 0),
        (1, 0): (5, 0, 0),
        (1, 1): (5, 0, 0),
    }


def test_kmeans_rejects_ragged_and_tiny_inputs(spark):
    ragged = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="kmeans_lloyd_fixedpoint"):
        kmeans_lloyd_fixedpoint(ragged, k=2, iterations=1, dim=2).collect()
    tiny = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_lloyd_fixedpoint(tiny, k=2, iterations=1, dim=2)


# --------------------------------------------- weighted shortest paths
def test_sssp_hand_case_relaxation_improves_later(spark):
    # 1 -2-> 2 -2-> 3 -2-> 4 plus direct 1 -9-> 4: round 1 sees 9,
    # round 3 improves to 6.  Node 99 unreachable.
    edges = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 2), (3, 4, 2), (1, 4, 9), (98, 99, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    one = {
        r["node"]: r["dist"]
        for r in shortest_paths_bounded(edges, seeds, rounds=1).collect()
    }
    assert one == {1: 0, 2: 2, 4: 9}
    three = {
        r["node"]: r["dist"]
        for r in shortest_paths_bounded(edges, seeds, rounds=3).collect()
    }
    assert three == {1: 0, 2: 2, 3: 4, 4: 6}


def test_sssp_early_exit_at_fixpoint(spark):
    # Chain exhausts after 2 rounds; rounds=50 must early-exit with the
    # same exact answer (monotone min-plus fixpoint).
    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 4)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths_bounded(edges, seeds, rounds=50).collect()
    }
    assert got == {1: 0, 2: 3, 3: 7}
