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

from .dedup import _unpersist_checkpoint, hold_pinned

SCALE = 1_000_000_000_000  # 1.0 of rank, in fixed-point units
DAMP_NUM, DAMP_DEN = 85, 100

# Final-iteration localCheckpoint frames must stay pinned while the
# returned result is live (the checkpoint IS its lineage); each operator
# holds its final under its own key in dedup._pinned_finals -- a new run
# supersedes only its OWN previous final (a shared slot let
# hierarchy_flatten kill a still-live pagerank result), and
# dedup.release_caches() drops them all.


def pagerank_fixedpoint(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    broadcast_rank_rows: int = 2_000_000,
) -> DataFrame:
    """PageRank over a directed edge list where every node has at least
    one outgoing edge (symmetrize bipartite/undirected graphs first --
    that also guarantees no dangling-mass term).  Returns
    ``(node, rank_fp)`` with rank in SCALE units.

    r_0(v) = SCALE;  r_{i+1}(v) = 0.15*SCALE + 0.85 * Σ_{u->v} r_i(u) div deg(u)
    with every step in exact BIGINT arithmetic.  Every node of the edge
    list keeps a rank row every round: nodes nobody links to (in-degree
    0) hold the bare teleport rank yet still PUSH their mass out -- a
    dst-only rebuild of the rank table silently dropped them after round
    one and leaked their outgoing mass.

    When the node count is under ``broadcast_rank_rows`` the per-
    iteration join BROADCASTS the rank table (two longs per node --
    ~32 MB at the default cap), eliminating the edge-side shuffle
    entirely; larger graphs fall back to the shuffle join against the
    pre-partitioned persisted edges.  This is the size-adaptive choice
    AQE would make if checkpointed frames carried size stats.
    """
    deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # Enforce the documented precondition LOUDLY: a dst-only (dangling)
    # node has no degree row, so its rank semantics are undefined -- the
    # two historical behaviors (excluded vs teleport-only row) differed
    # silently depending on implementation details.  One cheap anti-join
    # probe at call time beats either silent answer.
    dangling = (
        edges.select(F.col(dst).alias("node"))
        .distinct()
        .join(deg.select("node"), "node", "left_anti")
        .limit(1)
        .count()
    )
    if dangling:
        raise ValueError(
            "pagerank_fixedpoint: edge list has dangling destination nodes "
            "(no outgoing edges); symmetrize the graph or add self-loops first"
        )
    # Materialize (node, to, deg) ONCE, pre-partitioned on the join key:
    # without this every iteration re-runs the upstream edge derivation
    # (scan + distinct + degree join -- measured 2x the whole query at
    # sf0.1), and with the partitioning pinned the per-iteration join
    # re-shuffles only the (node, long) rank rows, never the edges.
    # Size the edge partitioning to the data, not the session default:
    # every iteration re-reads e, so 32 near-empty partitions x 5 rounds
    # is pure scheduler overhead at bench scale, while a huge graph still
    # fans out (~500k edge rows per partition, capped at 4x parallelism).
    # One tiny agg over the degree table yields both the node count (join
    # strategy) and the edge count (Σ deg = partition sizing).
    stats = deg.agg(F.count(F.lit(1)).alias("n"), F.sum("deg").alias("ec")).first()
    n_nodes, e_cnt = stats["n"], stats["ec"] or 0
    sc_default = edges.sparkSession.sparkContext.defaultParallelism
    e_parts = int(max(4, min(sc_default * 4, e_cnt // 500_000 + 1)))
    e = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("to"))
        .join(deg, "node")
        .repartition(e_parts, "node")
        .persist()
    )
    ranks = deg.select("node", F.lit(SCALE).cast("long").alias("r"))
    teleport = (DAMP_DEN - DAMP_NUM) * SCALE // DAMP_DEN
    maybe_bcast = F.broadcast if n_nodes <= broadcast_rank_rows else (lambda df: df)
    # Zero-contribution self rows keep EVERY node in the rank table each
    # round (in-degree-0 nodes hold the bare teleport rank yet still
    # push mass out); folding them into the aggregate input costs one
    # map-side-combined union row per node -- an extra LEFT JOIN against
    # the node set measured ~2x the whole query.  Materialized ONCE
    # (deriving from deg would re-run the edge derivation per round);
    # the final ranks checkpoint cuts lineage, so this releases on exit.
    zero_rows = deg.select("node", F.lit(0).cast("long").alias("c")).localCheckpoint(
        eager=True
    )
    prev = None
    try:
        for _ in range(iterations):
            full = (
                e.join(maybe_bcast(ranks), "node")
                .select(F.col("to").alias("node"), F.expr("r div deg").alias("c"))
                .unionByName(zero_rows)
                .groupBy("node")
                .agg(F.sum("c").cast("long").alias("s"))
            )
            ranks = full.select(
                "node",
                (F.lit(teleport) + F.expr(f"({DAMP_NUM} * s) div {DAMP_DEN}"))
                .cast("long")
                .alias("r"),
            ).localCheckpoint(eager=True)
            if prev is not None:
                _unpersist_checkpoint(prev)  # successor materialized; safe
            prev = ranks
    finally:
        e.unpersist()
        _unpersist_checkpoint(zero_rows)
    if prev is not None:
        hold_pinned("graph.pagerank", prev)
    return ranks.select("node", F.col("r").alias("rank_fp"))


def hierarchy_flatten(
    nodes: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_iter: int = 20,
) -> DataFrame:
    """Flatten a parent-pointer hierarchy (org chart, BOM, category tree)
    to ``(node, root, depth)`` by POINTER DOUBLING: each round a node's
    known-ancestor pointer jumps to that ancestor's own pointer and the
    distances add, so an H-deep hierarchy converges in O(log H) joins --
    the recursive-CTE walk every warehouse writes, without H sequential
    passes.  ``parent_col`` NULL marks roots.

    Same per-round ``localCheckpoint`` + supersede-unpersist discipline
    as the CC/PageRank loops; converged rows stop changing (root
    pointers are fixed points), and the loop exits early once no pointer
    moved.  All-integer state -- the oracle replays it with a recursive
    CTE bit-for-bit.

    A DANGLING parent pointer (parent id absent from ``nodes``) becomes
    that subtree's root label: the walk stops there with the depth
    counted up to it, rather than silently dropping the node (an inner
    hop join lost referentially-broken org-chart rows with no error).
    A CYCLE in the pointers can never converge; the loop raises after
    ``max_iter`` rounds instead of returning wrong roots (2^max_iter
    depth coverage means 20 rounds handle any acyclic hierarchy ever
    seen in practice).
    """
    state = nodes.select(
        F.col(node_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(node_col)).alias("anc"),
        F.when(F.col(parent_col).isNull(), 0).otherwise(1).cast("long").alias("depth"),
    ).localCheckpoint(eager=True)
    prev = state
    converged = False
    # max_iter + 1 rounds: depth <= 2^max_iter resolves within max_iter
    # doubling rounds, and convergence DETECTION (moved == 0) needs one
    # further observation round -- without it, depths in
    # (2^(max_iter-1), 2^max_iter] spuriously raised.
    for _ in range(max_iter + 1):
        hop = state.select(
            F.col("node").alias("h_node"),
            F.col("anc").alias("h_anc"),
            F.col("depth").alias("h_depth"),
        )
        stepped = (
            state.join(hop, state["anc"] == hop["h_node"], "left")
            .select(
                "node",
                F.coalesce(F.col("h_anc"), F.col("anc")).alias("anc"),
                (F.col("depth") + F.coalesce(F.col("h_depth"), F.lit(0))).alias("depth"),
                (F.coalesce(F.col("h_anc"), F.col("anc")) != F.col("anc"))
                .cast("long")
                .alias("__moved"),
            )
            # Lazy (r13, CC precedent): the convergence agg below is the
            # round's ONLY job and materializes the checkpoint itself.
            .localCheckpoint(eager=False)
        )
        moved = stepped.agg(F.sum("__moved")).first()[0] or 0
        _unpersist_checkpoint(prev)
        state = stepped.drop("__moved")
        prev = stepped
        if not moved:
            converged = True
            break
    if not converged:
        # Pointers still moving after the detection round: either the
        # hierarchy is deeper than 2^max_iter (raise max_iter) or it
        # contains a cycle whose length is not a power of two, where
        # pointer chasing never stabilizes.  Returning the partial state
        # would silently hand out wrong roots/depths.
        hold_pinned("graph.hierarchy", prev)
        raise RuntimeError(
            f"hierarchy_flatten did not converge in {max_iter} rounds: "
            "cycle in the parent pointers, or depth > 2^max_iter"
        )
    hold_pinned("graph.hierarchy", prev)
    # POWER-OF-TWO-length cycles evade the moved-guard: jumps of 2^k land
    # every cycle node back on ITSELF (2^k mod L == 0 only when L divides
    # 2^k), a "converged" self-pointer with nonzero distance; all other
    # cycle lengths keep moving and trip the guard above.  A true root
    # has depth 0 by construction and a dangling root is absent from the
    # node set, so anc == node with depth > 0 proves a cycle.
    n_cycle = state.filter((F.col("anc") == F.col("node")) & (F.col("depth") > 0)).count()
    if n_cycle:
        raise RuntimeError(
            f"hierarchy contains a cycle ({n_cycle} self-converged nodes "
            "with nonzero depth); roots/depths are undefined"
        )
    return state.select("node", F.col("anc").alias("root"), "depth")


def triangle_count(edges: DataFrame, lo: str = "lo", hi: str = "hi") -> DataFrame:
    """Global triangle count over an undirected edge list given in
    canonical form (``lo < hi``, deduplicated).

    The canonical MapReduce graph kernel: enumerate wedges a<b<c by
    joining ordered edges on the middle node, then close each wedge
    against the edge set -- every triangle is counted exactly once (its
    vertices appear in sorted order).  The node ordering bounds wedge
    fan-out by each node's HIGHER-numbered degree, the classic
    degeneracy trick that keeps hub nodes from exploding the wedge join.
    Two equi joins, all integer -- SQL-replayable.  Output: one row
    ``(n_edges, n_wedges, n_triangles)``.
    """
    e = edges.select(F.col(lo).alias("a"), F.col(hi).alias("b"))
    ey = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e.join(ey, "b").select("a", "b", "c")
    closing = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["a", "c"])
    return (
        e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .crossJoin(wedges.agg(F.count(F.lit(1)).cast("long").alias("n_wedges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Multi-source BFS: min-hop distance from any seed, bounded by
    ``max_depth``.  Output ``(node, dist)`` for every node reachable in
    <= max_depth hops (seeds at dist 0).

    Classic iterative min-relaxation: round k sets
    ``dist(v) = min(dist(v), 1 + min over in-neighbors dist(u))``, so
    after ``max_depth`` rounds every distance <= max_depth is exact
    (monotone decreasing, unit edges).  Early exit when a round changes
    nothing -- the fixpoint is already the bounded answer.  Distances
    are integers, so the result is bit-identical on any engine/
    partitioning -- a recursive CTE with UNION-dedup replays it in SQL.

    Scale posture: per round one join keyed on the edge src (the cached
    edge partitioning is reused across rounds) + one map-side-combinable
    min.  Frontier rows are (node, int) pairs; ``localCheckpoint`` per
    round caps plan growth, superseded checkpoints released -- the same
    loop discipline as connected_components/pagerank.  max_depth bounds
    work: this is the bounded-reachability primitive (ego networks,
    blast-radius audits), not all-pairs.
    """
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst")).cache()
    # Lifecycle bookkeeping tracks the CHECKPOINT FRAMES themselves, never
    # a projection over one: _unpersist_checkpoint/hold_pinned inspect the
    # analyzed plan for a bare LogicalRDD, so a `.drop()` view would make
    # every release a silent no-op and leak one frontier frame per round
    # (r8 review finding).  `dist` below is always a thin view over `ckpt`.
    ckpt = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    dist = ckpt
    prev_ckpt = None
    try:
        for _ in range(max_depth):
            relaxed = (
                e.join(dist, F.col("e_src") == F.col("node"))
                .groupBy(F.col("e_dst").alias("node"))
                .agg((F.min("dist") + 1).alias("nd"))
            )
            stepped_ckpt = (
                dist.join(relaxed, "node", "full")
                .select(
                    "node",
                    F.least(
                        F.coalesce(F.col("dist"), F.col("nd")),
                        F.coalesce(F.col("nd"), F.col("dist")),
                    ).alias("dist"),
                    (F.col("dist").isNull()).cast("long").alias("__new"),
                )
                # Lazy (r13, CC precedent): the frontier-count agg below
                # is the round's ONLY job, materializing the checkpoint.
                .localCheckpoint(eager=False)
            )
            n_new = stepped_ckpt.agg(F.sum("__new")).first()[0] or 0
            if prev_ckpt is not None:
                _unpersist_checkpoint(prev_ckpt)
            prev_ckpt, ckpt = ckpt, stepped_ckpt
            dist = stepped_ckpt.drop("__new")
            if not n_new:
                # no node joined the reachable set this round; distances
                # of already-reached nodes can still only have IMPROVED
                # to their exact value in earlier rounds (unit edges:
                # a node first reached in round k has exact dist k)
                break
    finally:
        e.unpersist()
    if prev_ckpt is not None:
        _unpersist_checkpoint(prev_ckpt)
    hold_pinned("graph.bfs", ckpt)
    return dist


def temporal_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    avail: str = "avail",
    arr: str = "arr",
    seed_col: str = "node",
    seed_date_col: str = "d",
) -> DataFrame:
    """EARLIEST-ARRIVAL reachability over a temporal graph: an edge
    (src, dst, avail, arr) is traversable only if the walker reaches
    ``src`` no later than ``avail``, and then arrives at ``dst`` at
    ``arr`` -- the time-RESPECTING semantics static BFS gets wrong
    (a shipment that left before the contamination arrived cannot carry
    it).  Requires ``arr >= avail`` on every edge (arrival dates are
    then monotone along any walk, so min-relaxation converges and after
    k rounds every node whose optimal walk has <= k edges carries its
    exact earliest date -- the same bounded-k contract as
    ``bfs_distances``).

    Round = one join keyed on the cached edge src (+ the availability
    predicate) + one map-side-combinable min + full-join fold;
    localCheckpoint per round with eager release, checkpoint frames
    pinned per the registry discipline.  Output: ``(node, d)`` --
    earliest arrival for every node reached within ``rounds`` hops.
    """
    from pyspark.sql import functions as F

    e = edges.select(
        F.col(src).alias("e_src"),
        F.col(dst).alias("e_dst"),
        F.col(avail).alias("e_avail"),
        F.col(arr).alias("e_arr"),
    ).cache()
    ckpt = (
        seeds.select(F.col(seed_col).alias("node"), F.col(seed_date_col).alias("d"))
        .groupBy("node")
        .agg(F.min("d").alias("d"))
        .localCheckpoint(eager=True)
    )
    state = ckpt
    prev_ckpt = None
    try:
        for _ in range(rounds):
            relaxed = (
                e.join(
                    state,
                    (F.col("e_src") == F.col("node"))
                    & (F.col("e_avail") >= F.col("d")),
                )
                .groupBy(F.col("e_dst").alias("rnode"))
                .agg(F.min("e_arr").alias("nd"))
            )
            stepped_ckpt = (
                state.join(relaxed, state["node"] == relaxed["rnode"], "full")
                .select(
                    F.coalesce(F.col("node"), F.col("rnode")).alias("node"),
                    F.least(
                        F.coalesce(F.col("d"), F.col("nd")),
                        F.coalesce(F.col("nd"), F.col("d")),
                    ).alias("d"),
                )
                .localCheckpoint(eager=True)
            )
            if prev_ckpt is not None:
                _unpersist_checkpoint(prev_ckpt)
            prev_ckpt, ckpt = ckpt, stepped_ckpt
            state = stepped_ckpt
    finally:
        e.unpersist()
    if prev_ckpt is not None:
        _unpersist_checkpoint(prev_ckpt)
    hold_pinned("graph.temporal", ckpt)
    return state


def shortest_paths_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    seed_col: str = "node",
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths, bounded at ``rounds`` edges
    (distributed Bellman-Ford).  Output ``(node, dist)`` -- the exact
    min-cost distance from any seed over walks of <= ``rounds`` edges.

    Weights must be NON-NEGATIVE INTEGERS (cost cents, ms latencies,
    hop counts): integer min-plus relaxation is bit-identical on any
    engine/partitioning, so an unrolled-CTE oracle replays it exactly
    -- the weighted sibling of ``bfs_distances`` (unit weights) in the
    same bounded-k contract: after k rounds every node whose optimal
    walk has <= k edges carries its exact distance.

    Per round: ONE join keyed on the cached edge src + one map-side-
    combinable min + a full-join fold; frontier rows are (node, long)
    pairs.  ``localCheckpoint`` per round caps plan growth (the frame
    feeds both the fold and the next join), superseded checkpoints
    released eagerly -- the shared loop discipline of BFS / PageRank /
    connected components.  Early exit when a round improves nothing:
    with non-negative weights, min-plus relaxation is monotone
    non-increasing, so an unchanged round IS the bounded fixpoint.
    """
    e = edges.select(
        F.col(src).alias("e_src"),
        F.col(dst).alias("e_dst"),
        F.col(weight).cast("long").alias("e_w"),
    ).cache()
    ckpt = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    dist = ckpt
    prev_ckpt = None
    try:
        for _ in range(rounds):
            relaxed = (
                e.join(dist, F.col("e_src") == F.col("node"))
                .groupBy(F.col("e_dst").alias("rnode"))
                .agg(F.min(F.col("dist") + F.col("e_w")).alias("nd"))
            )
            stepped_ckpt = (
                dist.join(relaxed, dist["node"] == relaxed["rnode"], "full")
                .select(
                    F.coalesce(F.col("node"), F.col("rnode")).alias("node"),
                    F.least(
                        F.coalesce(F.col("dist"), F.col("nd")),
                        F.coalesce(F.col("nd"), F.col("dist")),
                    ).alias("dist"),
                    (
                        F.col("dist").isNull()
                        | (F.col("nd") < F.col("dist"))
                    ).cast("long").alias("__chg"),
                )
                # Lazy (r13, CC precedent): the improvement-count agg
                # below is the round's ONLY job and materializes it.
                .localCheckpoint(eager=False)
            )
            n_chg = stepped_ckpt.agg(F.sum("__chg")).first()[0] or 0
            if prev_ckpt is not None:
                _unpersist_checkpoint(prev_ckpt)
            prev_ckpt, ckpt = ckpt, stepped_ckpt
            dist = stepped_ckpt.drop("__chg")
            if not n_chg:
                break
    finally:
        e.unpersist()
    if prev_ckpt is not None:
        _unpersist_checkpoint(prev_ckpt)
    hold_pinned("graph.sssp", ckpt)
    return dist


def _build_undirected_kcore(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Both edge directions from one scan, distinct, cached."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
        .cache()
    )


def kcore_bounded(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    prebuilt_undirected: bool = False,
) -> DataFrame:
    """Bounded k-core decomposition: iteratively peel nodes of degree
    < ``k`` (degree counted only over edges whose BOTH endpoints are
    still alive) for up to ``rounds`` rounds -- the standard dense-
    subgraph extractor (fraud rings, co-purchase cores, hub detection).
    Same bounded-k contract as BFS/SSSP: if peeling reaches its
    fixpoint within the round budget (it converges in 2-3 rounds on
    real degree distributions; peeling is monotone so an unchanged
    round IS the fixpoint), the output is the EXACT k-core with each
    survivor's in-core degree; otherwise it is the round-``rounds``
    over-approximation.

    Early exit on node-count equality alone is sound BECAUSE peeling
    is monotone (the alive set only shrinks, so equal count == equal
    set).  Per round: two semi-joins against the cached undirected
    edge frame + one map-side-combinable count; localCheckpoint per
    round, superseded checkpoints released (shared loop discipline).

    ``prebuilt_undirected=True`` declares the input ALREADY holds both
    edge directions, distinct, as (src, dst) -- callers that computed
    degree statistics to pick ``k`` pass their frame back instead of
    paying the explode+distinct twice (r10 review finding).

    Output: ``(node, deg)`` for the surviving nodes."""
    if not isinstance(k, int) or k < 0:
        raise ValueError(f"kcore_bounded needs an integer k >= 0, got {k!r}")
    if prebuilt_undirected:
        und = edges.select(
            F.col(src).alias("s"), F.col(dst).alias("d")
        ).cache()
    else:
        und = _build_undirected_kcore(edges, src, dst)

    # Lifecycle discipline: prev/ckpt always hold the CHECKPOINT frames
    # themselves -- never a .select() projection over one, which would
    # make _unpersist_checkpoint a silent no-op (the r8 leak class).
    ckpt = (
        und.select(F.col("s").alias("node")).distinct().localCheckpoint(eager=True)
    )
    alive = ckpt
    n_alive = alive.count()
    prev = None
    deg = None
    try:
        for _ in range(rounds):
            deg = (
                und.join(alive.select(F.col("node").alias("s")), "s", "semi")
                .join(alive.select(F.col("node").alias("d")), "d", "semi")
                .groupBy(F.col("s").alias("node"))
                .agg(F.count(F.lit(1)).cast("long").alias("deg"))
                .filter(F.col("deg") >= k)
                # Lazy (r13, CC precedent): the survivor count below is
                # the round's ONLY job and materializes the checkpoint.
                .localCheckpoint(eager=False)
            )
            n_new = deg.count()
            if prev is not None:
                _unpersist_checkpoint(prev)
            prev, ckpt = ckpt, deg
            alive = deg.select("node")
            if n_new == n_alive:
                break
            n_alive = n_new
    finally:
        und.unpersist()
    if prev is not None:
        _unpersist_checkpoint(prev)
    hold_pinned("graph.kcore", ckpt)
    return deg if deg is not None else ckpt.withColumn("deg", F.lit(None).cast("long"))


def hits_fixedpoint(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """HITS hubs & authorities (Kleinberg) over a directed edge list --
    the two-sided companion to PageRank: authorities collect hub mass
    over in-edges, hubs collect authority mass over out-edges, each
    side renormalized per half-step.

    Exact cross-engine replay: scores live in BIGINT ``scale`` units;
    the usual L2 normalization (an irrational sqrt of a sum) is
    replaced by L-inf -- divide by the max, ``(s * scale) div max`` --
    which preserves the RANKING each half-step exactly and keeps every
    intermediate an integer the oracle can replay (headroom: max
    in-degree * scale^2 must stay < 2^63, i.e. degree < ~9e3 at the
    default scale; shrink ``scale`` for denser graphs).

    Loop discipline (the PageRank/CC pattern): edges distinct +
    persisted pre-partitioned once; each half-step is one equi-join +
    map-side-combinable sum; the per-round max is a bounded 1-row
    collect; frames localCheckpoint per half-step with superseded-
    checkpoint release.

    Returns ``(hubs, auths)`` as ``(node, score_fp)`` frames.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .persist()
    )
    hubs = e.select(F.col("s").alias("node")).distinct().select(
        "node", F.lit(scale).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    auths = None
    supers: list[DataFrame] = [hubs]

    def _half(frame: DataFrame, edge_key: str, out_key: str) -> DataFrame:
        raw = (
            e.join(frame.withColumnRenamed("node", edge_key), edge_key)
            .groupBy(F.col(out_key).alias("node"))
            .agg(F.sum("r").cast("long").alias("s"))
        )
        # Lazy checkpoints (r13, CC precedent): the per-half max agg is
        # the half-step's ONLY job -- it materializes `raw` (and, via
        # lineage, the previous half's `out`); each half-step thus costs
        # one job instead of three.
        raw = raw.localCheckpoint(eager=False)
        supers.append(raw)
        mx = raw.agg(F.max("s")).first()[0]
        if mx is None:
            raise ValueError("hits_fixedpoint: empty edge list")
        out = raw.select(
            "node",
            F.expr(f"(s * {int(scale)}) div {int(mx)}").cast("long").alias("r"),
        ).localCheckpoint(eager=False)
        supers.append(out)
        return out

    try:
        for _ in range(iterations):
            auths = _half(hubs, "s", "d")
            hubs = _half(auths, "d", "s")
        # MATERIALIZE the lazy finals before the finally releases their
        # ancestors: an unmaterialized lazy checkpoint still reaches its
        # parents through lineage, and those parents are materialized
        # lineage-CUT checkpoints -- unpersisting them first would make
        # the returned frames unrecomputable.  Two bounded jobs over
        # cached parents.
        for final in (auths, hubs):
            if final is not None:
                final.count()  # JVM-only action; persists the checkpoint
    finally:
        e.unpersist()
        # Release every superseded intermediate except the two finals.
        for f in supers:
            if f is not hubs and f is not auths:
                _unpersist_checkpoint(f)
    hold_pinned("graph.hits_hubs", hubs)
    hold_pinned("graph.hits_auths", auths)
    return (
        hubs.select("node", F.col("r").alias("score_fp")),
        auths.select("node", F.col("r").alias("score_fp")),
    )
