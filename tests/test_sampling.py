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


def test_heavy_hitters_exact_vs_bruteforce(spark):
    """The candidates-then-verify output must equal the full GROUP BY
    HAVING answer on a skewed distribution, including near-threshold
    items on both sides of the cut."""
    from pyspark.sql import functions as F

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.aggregates import (
        heavy_hitters,
    )

    # 100 rows: 'a' x30, 'b' x11, 'c' x10 (exactly at 10% -> excluded:
    # share must be STRICTLY greater), rest singletons.
    rows = ["a"] * 30 + ["b"] * 11 + ["c"] * 10 + [f"x{i}" for i in range(49)]
    df = spark.createDataFrame([(r,) for r in rows], "item string")
    got = {(r.item, r.n) for r in heavy_hitters(df, "item", min_share=0.10).collect()}
    brute = {
        (r.item, r.n)
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") > 10)
        .collect()
    }
    assert got == brute == {("a", 30), ("b", 11)}
