"""r16 pins: the graph-loop action-folding must stick.

The r15 loops ran one-to-two Python-side ACTIONS per round (eager
checkpoint materializations, per-round convergence counts, trailing
finalization counts), each a synchronous job barrier.  r16 folds them:
pagerank chains rounds lazily into one final materialization, bfs/sssp/
kcore check convergence every 2nd round, temporal reachability
materializes its whole round chain in one job, and HITS drops the seed
checkpoint + the two trailing count() jobs.  Results are pinned
byte-identical by the existing coverage tests + oracles; THESE tests
pin the scheduling shape -- the number of driver-side actions one
operator call issues -- so a refactor that quietly reintroduces
per-round actions fails here first.

Raw Spark job counts are NOT a usable pin under AQE (every materialized
shuffle stage is its own job; a 5-round pagerank on an 8-node chain
shows ~30), so the counter wraps the DataFrame action surface the
operators use: ``collect`` (which ``first``/``take``/``head`` funnel
into), ``count``, and ``localCheckpoint(eager=True)``.  The counts are
exact and deterministic -- they depend only on the operator's control
flow, never on Spark's physical planning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class _ActionCounter:
    """Counts driver-side actions issued while active."""

    def __init__(self, monkeypatch):
        # Spark 4: pyspark.sql.dataframe.DataFrame is a dispatch facade;
        # concrete (non-Connect) frames are classic.dataframe.DataFrame,
        # so the patch must land on the classic class.
        try:
            import pyspark.sql.classic.dataframe as dfmod
        except ImportError:  # Spark 3.x
            import pyspark.sql.dataframe as dfmod

        self.n = 0
        DF = dfmod.DataFrame
        counter = self

        orig_collect = DF.collect
        orig_count = DF.count
        orig_ckpt = DF.localCheckpoint

        def collect(df, *a, **k):
            counter.n += 1
            return orig_collect(df, *a, **k)

        def count(df, *a, **k):
            counter.n += 1
            return orig_count(df, *a, **k)

        def ckpt(df, eager=True):
            if eager:
                counter.n += 1
            return orig_ckpt(df, eager=eager)

        monkeypatch.setattr(DF, "collect", collect)
        monkeypatch.setattr(DF, "count", count)
        monkeypatch.setattr(DF, "localCheckpoint", ckpt)


@pytest.fixture(scope="module")
def chain_edges(spark):
    # Symmetrized 8-node chain: every node has out-edges (pagerank
    # precondition); BFS from node 1 keeps adding nodes for 4+ rounds so
    # no early exit masks the per-round action count.
    rows = [(i, i + 1) for i in range(1, 8)]
    e = spark.createDataFrame(rows, "src long, dst long")
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


@pytest.fixture(scope="module")
def seeds(spark):
    return spark.createDataFrame([(1,)], "node long")


def _released(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        release_caches,
    )

    release_caches()


def test_pagerank_actions(spark, chain_edges, monkeypatch):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        pagerank_fixedpoint,
    )

    c = _ActionCounter(monkeypatch)
    pagerank_fixedpoint(chain_edges, iterations=5)
    _released(spark)
    # 3 = combined probe/stats collect + the cadence checkpoint at round
    # 4 (checkpoint_every=4) + the final checkpoint materializing the
    # lazily-chained tail.  r15 ran 8 (separate dangling count, stats
    # collect, eager zero-rows checkpoint, and an eager checkpoint per
    # round).
    assert c.n == 3, f"pagerank issued {c.n} actions; per-round actions are back"


def test_bfs_actions(spark, chain_edges, seeds, monkeypatch):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        bfs_distances,
    )

    c = _ActionCounter(monkeypatch)
    bfs_distances(chain_edges, seeds, max_depth=4).collect()
    _released(spark)
    # 3 = convergence checks at rounds 2 and 4 + the caller's collect.
    # r15 ran 6 (eager seed checkpoint + one check per round + collect).
    assert c.n == 3, f"bfs issued {c.n} actions; per-round checks are back"


def test_sssp_actions(spark, chain_edges, seeds, monkeypatch):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        shortest_paths_bounded,
    )

    c = _ActionCounter(monkeypatch)
    shortest_paths_bounded(
        chain_edges.withColumn("w", F.lit(2)), seeds, rounds=4
    ).collect()
    _released(spark)
    # Same shape as BFS: 3 on r16 vs 6 on r15.
    assert c.n == 3, f"sssp issued {c.n} actions; per-round checks are back"


def test_kcore_actions(spark, chain_edges, monkeypatch):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        kcore_bounded,
    )

    c = _ActionCounter(monkeypatch)
    kcore_bounded(chain_edges, k=2, rounds=4).collect()
    _released(spark)
    # 5 = one survivor count per round (check_every=1 -- a peel round
    # costs far more than a count job, so kcore keeps the earliest
    # sound early exit; the chain fixture never converges, so all 4
    # rounds count) + collect.  r15 ran 7 (eager initial checkpoint +
    # exact initial count + one count per round + collect): what r16
    # drops is the baseline pair, not the per-round checks.
    assert c.n == 5, f"kcore issued {c.n} actions; the baseline count is back"


def test_temporal_actions(spark, chain_edges, seeds, monkeypatch):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        temporal_reachability,
    )

    c = _ActionCounter(monkeypatch)
    temporal_reachability(
        chain_edges.select(
            "src",
            "dst",
            F.lit("2024-01-01").alias("avail"),
            F.lit("2024-01-02").alias("arr"),
        ),
        seeds.select("node", F.lit("2024-01-01").alias("d")),
        rounds=3,
    )
    _released(spark)
    # 1 = the single count that materializes the whole 3-round lazy
    # chain.  r15 ran 4 (eager seed checkpoint + one eager checkpoint
    # per round).
    assert c.n == 1, f"temporal issued {c.n} actions; per-round checkpoints are back"


def test_hits_actions(spark, chain_edges, monkeypatch):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        hits_fixedpoint,
    )

    c = _ActionCounter(monkeypatch)
    hits_fixedpoint(chain_edges, iterations=3)
    _released(spark)
    # 6 = one max collect per half-step (the L-inf normalization IS the
    # algorithm; it cannot fold).  r15 ran 9 (plus the eager seed
    # checkpoint and two trailing finalization counts).
    assert c.n == 6, f"hits issued {c.n} actions; seed/finalization actions are back"
