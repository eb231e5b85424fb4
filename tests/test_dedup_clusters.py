"""Connected-components r13 hardening: the measured-size broadcast knob
must (a) produce byte-identical clusters to the default shuffle path and
(b) actually plan broadcast-hash joins when enabled -- otherwise it's a
dead parameter.  The shuffle path stays the local-mode default (A/B in
the operator docstring: broadcast loses in single-JVM mode)."""

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
    connected_components,
)


def _pairs(spark):
    # Two chains (diameter > 1, forces pointer jumping) + one triangle
    # + an isolated pair; mixed component shapes.
    edges = (
        [(f"a{i}", f"a{i+1}") for i in range(6)]
        + [(f"b{i}", f"b{i+1}") for i in range(3)]
        + [("t0", "t1"), ("t1", "t2"), ("t0", "t2"), ("x", "y")]
    )
    return spark.createDataFrame(edges, "doc_a string, doc_b string")


def test_broadcast_path_matches_shuffle_path(spark):
    shuffle = {
        (r.doc, r.canonical)
        for r in connected_components(_pairs(spark)).collect()
    }
    bcast = {
        (r.doc, r.canonical)
        for r in connected_components(
            _pairs(spark), broadcast_threshold=1_000_000
        ).collect()
    }
    assert shuffle == bcast
    assert {c for _, c in shuffle} == {"a0", "b0", "t0", "x"}


def test_broadcast_threshold_respected(spark):
    """Below-threshold corpus -> broadcast joins planned inside the round;
    threshold 0 (default) -> no BroadcastHashJoin anywhere.  Asserted on
    the round body's own plan, rebuilt exactly as the operator builds it,
    since the loop's intermediate frames aren't exposed."""
    pairs = _pairs(spark)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
                    F.struct(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("canonical", F.col("doc"))
        .localCheckpoint()
    )
    hinted = edges.join(F.broadcast(labels), edges["dst"] == labels["doc"])
    unhinted = edges.join(labels, edges["dst"] == labels["doc"])
    assert "BroadcastHashJoin" in hinted._jdf.queryExecution().executedPlan().toString()
    # The label frame is a stat-less LogicalRDD leaf: without the hint the
    # planner must NOT broadcast it (this is the premise the knob exists for).
    assert (
        "BroadcastHashJoin"
        not in unhinted._jdf.queryExecution().executedPlan().toString()
    )
