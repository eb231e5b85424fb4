"""Property-based tests (hypothesis): the r7 widening operators vs
exhaustive Python references on arbitrary small inputs.

fuzzy_join's d<=1 completeness and resample's interpolation arithmetic
are exactly the kind of claims a single example can false-positive on;
the property tests sweep arbitrary string sets / gap placements."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# small alphabet maximizes collisions/near-misses
name_s = st.text(alphabet="abc", min_size=1, max_size=5)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lnames=st.lists(name_s, min_size=1, max_size=4, unique=True),
    rnames=st.lists(name_s, min_size=1, max_size=4, unique=True),
)
def test_fuzzy_join_complete_for_distance1(spark, lnames, rnames):
    """Every pair with levenshtein <= 1 is found; nothing above 1 passes."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        fuzzy_join,
    )

    left = spark.createDataFrame(list(enumerate(lnames)), "lid long, lname string")
    right = spark.createDataFrame(list(enumerate(rnames)), "rid long, rname string")
    got = {
        (r["lid"], r["rid"]): r["dist"]
        for r in fuzzy_join(left, right, "lid", "lname", "rid", "rname", 1).collect()
    }
    want = {
        (li, ri): _lev(ln, rn)
        for li, ln in enumerate(lnames)
        for ri, rn in enumerate(rnames)
        if _lev(ln, rn) <= 1
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    obs=st.dictionaries(
        st.integers(min_value=0, max_value=9),  # day offset
        st.integers(min_value=0, max_value=100),  # value (int -> exact floats)
        min_size=1,
        max_size=6,
    )
)
def test_resample_interpolate_matches_reference(spark, obs):
    """Dense spine; linear interpolation between bracketing observations;
    edge fill outside -- vs a pure-Python replay with identical float ops."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.timeseries import (
        resample_interpolate,
    )

    base = datetime.date(2024, 1, 1)
    rows = [("k", base + datetime.timedelta(days=d), float(v)) for d, v in obs.items()]
    df = spark.createDataFrame(rows, "key string, day date, val double")
    got = {
        r["day"]: (r["val_filled"], r["was_gap"])
        for r in resample_interpolate(df, "key", "day", "val").collect()
    }

    days = sorted(obs)
    want = {}
    import math

    for d in range(days[0], days[-1] + 1):
        day = base + datetime.timedelta(days=d)
        if d in obs:
            v, gap = float(obs[d]), 0
        else:
            prev = max(x for x in days if x < d)
            nxt = min(x for x in days if x > d)
            pv, nv = float(obs[prev]), float(obs[nxt])
            v = pv + (nv - pv) * (float(d - prev) / float(nxt - prev))
            gap = 1
        want[day] = (math.floor(v * 10000 + 0.5) / 10000.0, gap)
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=30
    ),
    probs=st.lists(
        st.sampled_from([0.1, 0.25, 0.3, 0.5, 0.66, 0.75, 0.9, 1.0]),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
def test_quantile_edges_distributed_property(spark, vals, probs):
    """Distributed exact quantiles == percentile_disc on arbitrary
    multisets (duplicates, negatives, tiny partitions)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.aggregates import (
        quantile_edges_distributed,
    )

    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    plist = ", ".join(repr(p) for p in sorted(probs))
    want = list(
        df.agg(
            F.expr(f"percentile_disc(array({plist})) WITHIN GROUP (ORDER BY v)")
        ).first()[0]
    )
    got = quantile_edges_distributed(df, "v", sorted(probs), num_partitions=3)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lnames=st.lists(name_s, min_size=1, max_size=3, unique=True),
    rnames=st.lists(name_s, min_size=1, max_size=3, unique=True),
)
def test_fuzzy_join_complete_for_distance2(spark, lnames, rnames):
    """SymSpell delete-2 blocking: every pair with levenshtein <= 2
    found, nothing above 2 passes."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        fuzzy_join,
    )

    left = spark.createDataFrame(list(enumerate(lnames)), "lid long, lname string")
    right = spark.createDataFrame(list(enumerate(rnames)), "rid long, rname string")
    got = {
        (r["lid"], r["rid"]): r["dist"]
        for r in fuzzy_join(left, right, "lid", "lname", "rid", "rname", 2).collect()
    }
    want = {
        (li, ri): _lev(ln, rn)
        for li, ln in enumerate(lnames)
        for ri, rn in enumerate(rnames)
        if _lev(ln, rn) <= 2
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ivs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=40), st.integers(min_value=0, max_value=15)),
        min_size=1,
        max_size=8,
    ),
    cell=st.sampled_from([1, 3, 7, 50]),
)
def test_interval_overlap_join_matches_bruteforce(spark, ivs, cell):
    """Cell blocking is complete for ANY cell size: candidates share the
    overlap's cell, verify keeps exactly the true overlaps."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [(i, s, s + ln) for i, (s, ln) in enumerate(ivs)]
    a = spark.createDataFrame(rows, "ida long, a0 long, a1 long")
    b = spark.createDataFrame(
        [(i + 100, s, e) for i, s, e in rows], "idb long, b0 long, b1 long"
    )
    got = {
        (r["ida"], r["idb"])
        for r in interval_overlap_join(a, b, "a0", "a1", "b0", "b1", cell).collect()
    }
    want = {
        (i, j + 100)
        for i, s1, e1 in rows
        for j, s2, e2 in rows
        if s1 <= e2 and s2 <= e1
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(devs=st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=25))
def test_cusum_property(spark, devs):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.timeseries import (
        cusum_positive,
    )

    df = spark.createDataFrame(
        [("k", i, d) for i, d in enumerate(devs)], "k string, i long, d long"
    )
    got = [r["cusum"] for r in cusum_positive(df, "k", "i", "d").orderBy("i").collect()]
    want, s = [], 0
    for d in devs:
        s = max(0, s + d)
        want.append(s)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(st.integers(min_value=0, max_value=8), st.integers(min_value=0, max_value=8)),
        min_size=1,
        max_size=20,
    )
)
def test_triangle_count_property(spark, edges):
    from itertools import combinations

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        triangle_count,
    )

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not canon:
        return
    df = spark.createDataFrame(sorted(canon), "lo long, hi long")
    got = triangle_count(df).first()["n_triangles"]
    nodes = {v for e in canon for v in e}
    want = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if {(a, b), (a, c), (b, c)} <= canon
    )
    assert got == want
