"""Iterative graph algorithms beyond connected components: fixed-point
PageRank.

Why FIXED-POINT (BIGINT) instead of doubles: iterative float reductions
are order-dependent, so two engines -- or two runs of the same engine
with different partitioning -- produce last-ulp-different ranks, and a
cross-engine oracle can never hash-match.  Scaling ranks to integer
units (1e-12 of a unit rank) makes every contribution ``r div deg`` and
every damping step ``(85 * Σ) div 100`` exact integer arithmetic:
bit-identical on any engine, any partitioning, any summation order.
The quantization error per iteration is < 1 unit = 1e-12 -- noise
relative to PageRank's own damping tolerance.  (Production systems run
doubles and accept nondeterminism; the fixed-point twin is the portable
evidence path, same trade as the LSH/IVF portable twins.)

Overflow bound: Σ contributions per node <= n * SCALE, and the damping
multiply needs 85x that, so callers keep ``n * SCALE * 85 < 2^63``
(n <= ~10^8 at the default SCALE; at larger n, drop SCALE a digit).

Scale posture: each iteration is one join (ranks are (node, long) pairs
-- 16-byte shuffle rows, the edge table partitioning is reusable across
iterations) plus one map-side-combinable sum.  ``localCheckpoint`` per
round caps logical-plan growth exactly like the connected-components
loop (``dedup.py``); superseded checkpoint RDDs are unpersisted eagerly.

Reference parity: none -- the reference has no graph surface; this
extends the iterative-algorithm family (SURVEY §7 north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1.0 of rank, in fixed-point units
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_fixedpoint(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list where every node has at least
    one outgoing edge (symmetrize bipartite/undirected graphs first --
    that also guarantees no dangling-mass term).  Returns
    ``(node, rank_fp)`` with rank in SCALE units.

    r_0(v) = SCALE;  r_{i+1}(v) = 0.15*SCALE + 0.85 * Σ_{u->v} r_i(u) div deg(u)
    with every step in exact BIGINT arithmetic.
    """
    deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # Materialize (node, to, deg) ONCE, pre-partitioned on the join key:
    # without this every iteration re-runs the upstream edge derivation
    # (scan + distinct + degree join -- measured 2x the whole query at
    # sf0.1), and with the partitioning pinned the per-iteration join
    # re-shuffles only the (node, long) rank rows, never the edges.
    e = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("to"))
        .join(deg, "node")
        .repartition("node")
        .persist()
    )
    ranks = deg.select("node", F.lit(SCALE).cast("long").alias("r"))
    teleport = (DAMP_DEN - DAMP_NUM) * SCALE // DAMP_DEN
    prev_rdd = None
    try:
        for _ in range(iterations):
            contribs = (
                e.join(ranks, "node")
                .select(F.col("to").alias("node"), F.expr("r div deg").alias("c"))
                .groupBy("node")
                .agg(F.sum("c").cast("long").alias("s"))
            )
            ranks = contribs.select(
                "node",
                (F.lit(teleport) + F.expr(f"({DAMP_NUM} * s) div {DAMP_DEN}"))
                .cast("long")
                .alias("r"),
            ).localCheckpoint(eager=True)
            rdd = ranks.rdd  # the checkpointed RDD backing this round
            if prev_rdd is not None:
                prev_rdd.unpersist()
            prev_rdd = rdd
    finally:
        e.unpersist()
    return ranks.select("node", F.col("r").alias("rank_fp"))
