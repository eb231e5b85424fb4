"""Distributed global-ntile equivalence + connected-components storage bound."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.windows import (
    global_ntile,
)


def test_global_ntile_matches_window_ntile(spark, sf_dir):
    """global_ntile must reproduce NTILE(k) OVER (ORDER BY ...) exactly --
    including the first-(n mod k)-buckets-get-one-extra-row rule."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    order_by = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    for k in (4, 7):
        expected = {
            (r.o_orderkey, r.q)
            for r in orders.withColumn("q", F.ntile(k).over(Window.orderBy(*order_by))).collect()
        }
        got = {
            (r.o_orderkey, r.q)
            for r in global_ntile(
                orders, order_by, k, range_col="o_totalprice", alias="q"
            ).collect()
        }
        assert got == expected, f"k={k}: {len(got ^ expected)} rows differ"


def test_global_ntile_small_n(spark):
    """n < k: every row gets its own bucket (NTILE degenerate case)."""
    df = spark.createDataFrame([(1,), (2,), (3,)], "x long")
    got = sorted(
        (r.x, r.b)
        for r in global_ntile(
            df, [F.asc("x")], 10, range_col="x", alias="b", range_desc=False
        ).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_connected_components_bounded_storage(spark):
    """CC caches at most [edges + final labels] when it returns: superseded
    per-iteration label frames must be unpersisted (r1 leaked one per round)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        connected_components,
        release_caches,
    )

    # Measure CC's OWN footprint as a DELTA over whatever the shared test
    # session still pins: clearCache/release_caches drop everything the
    # registries know about, but an unrelated earlier test can leave a
    # stray persisted RDD (observed flaking at +1 in full-suite order),
    # and an absolute count would blame CC for it.
    spark.catalog.clearCache()
    release_caches()
    baseline = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    # 0-1-2-3-4-5 chain: needs several label-propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)] + [(10, 11)], "doc_a long, doc_b long"
    )
    labels = connected_components(pairs, max_iter=10)
    out = {(r.doc, r.canonical) for r in labels.collect()}
    assert {(i, 0) for i in range(7)} <= out
    assert (11, 10) in out
    # Superseded rounds are unpersisted explicitly inside the loop, so the
    # only pinned storage CC ADDS on return is the final labels checkpoint
    # (edges were unpersisted on exit).  A chain of 6 needs >= 3 rounds; a
    # leak would pin one RDD per round.
    n_cached = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_cached - baseline <= 2, (
        f"{n_cached - baseline} new cached RDDs after CC -- per-iteration leak"
    )
    spark.catalog.clearCache()
