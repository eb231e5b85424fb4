"""Sampling operators (training-data pipeline surface): seeded sample and
stratified sampleBy.  Sampling is partition-layout-dependent, so these are
property tests (fractions, determinism within a session), not oracle
queries."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_seeded_sample_fraction(spark, sf_dir_medium):
    li = spark.read.parquet(f"{sf_dir_medium}/lineitem.parquet")
    n = li.count()
    s = li.sample(fraction=0.1, seed=42)
    k = s.count()
    assert 0.07 * n < k < 0.13 * n
    # deterministic within a fixed plan/session
    assert s.count() == k


def test_stratified_sample_by(spark, sf_dir_medium):
    li = spark.read.parquet(f"{sf_dir_medium}/lineitem.parquet")
    fractions = {"R": 0.05, "A": 0.2, "N": 0.5}
    s = li.sampleBy("l_returnflag", fractions, seed=42)
    got = {r.l_returnflag: r["count"] for r in s.groupBy("l_returnflag").count().collect()}
    base = {r.l_returnflag: r["count"] for r in li.groupBy("l_returnflag").count().collect()}
    for flag, frac in fractions.items():
        ratio = got.get(flag, 0) / base[flag]
        assert abs(ratio - frac) < 0.05, f"{flag}: {ratio} vs {frac}"


def test_approx_percentile_rank_error_bound(spark, sf_dir_medium):
    """approx_percentile (t-digest-style sketch) must land within the
    advertised rank-error bound of the exact percentile -- the 100 TB
    substitute for exact per-group sorts (agg_median_stddev documents
    exact as dim-group-only)."""
    o = spark.read.parquet(f"{sf_dir_medium}/orders.parquet")
    accuracy = 1000  # rank error <= n / accuracy
    qs = [0.1, 0.5, 0.9]
    approx = o.select(
        F.percentile_approx("o_totalprice", qs, accuracy).alias("a")
    ).first()["a"]
    prices = sorted(r.o_totalprice for r in o.select("o_totalprice").collect())
    n = len(prices)
    import bisect

    for q, a in zip(qs, approx):
        rank = bisect.bisect_left(prices, a)
        assert abs(rank - q * n) <= n / accuracy + 1, (
            f"q={q}: approx {a} at rank {rank}, expected ~{q * n}"
        )
