"""Property-based cross-checks for the r12 drift/eval statistics: each
operator is replayed by an independent brute-force Python reference on
random small inputs (the oracle layer already checks cross-ENGINE
parity; these check cross-IMPLEMENTATION correctness of the algorithm
itself -- edge rules, tie handling, smoothing, empty bins)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
    chisq_independence,
    ks_two_sample,
    psi_two_sample,
    runs_test,
)


def _micro(num: int, den: int) -> int:
    """Python replica of micro_ratio_sql's half-up split arithmetic."""
    q1, r1 = divmod(num * 1000, den)
    return q1 * 1000 + (2 * r1 * 1000 + den) // (2 * den)


# --------------------------------------------------------------------------
# ks_two_sample vs a brute-force integer KS
# --------------------------------------------------------------------------


@given(
    a=st.lists(st.integers(0, 8), min_size=1, max_size=12),
    b=st.lists(st.integers(0, 8), min_size=1, max_size=12),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_ks_matches_bruteforce(spark, a, b):
    rows = [(float(v), True) for v in a] + [(float(v), False) for v in b]
    out = ks_two_sample(
        spark.createDataFrame(rows, "v double, in_a boolean"), "v", "in_a"
    ).collect()[0]
    values = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    best_d, best_at = -1, None
    cum_a = cum_b = 0
    for v in values:
        cum_a += a.count(v)
        cum_b += b.count(v)
        d = abs(cum_a * nb - cum_b * na)
        if d > best_d:
            best_d, best_at = d, v
    assert (out["n_a"], out["n_b"]) == (na, nb)
    assert out["ks_at"] == float(best_at)
    assert out["ks_micro"] == _micro(best_d, na * nb)


# --------------------------------------------------------------------------
# chisq_independence vs the dense direct formula
# --------------------------------------------------------------------------


@given(
    pairs=st.lists(
        st.tuples(st.sampled_from("xyz"), st.integers(0, 2)),
        min_size=2,
        max_size=30,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_chisq_matches_dense_direct(spark, pairs):
    out = chisq_independence(
        spark.createDataFrame(pairs, "a string, b long"), "a", "b"
    ).collect()[0]
    n = len(pairs)
    cells: dict[tuple, int] = {}
    ra: dict[str, int] = {}
    cb: dict[int, int] = {}
    for x, y in pairs:
        cells[(x, y)] = cells.get((x, y), 0) + 1
        ra[x] = ra.get(x, 0) + 1
        cb[y] = cb.get(y, 0) + 1
    # Engine replica: per-OBSERVED-cell floor(n*O^2/(na*nb)*1e6+0.5),
    # summed, minus n*1e6 (the Σ O^2/E - n identity).
    total = sum(
        math.floor(
            (float(n) * float(o) * float(o))
            / (float(ra[x]) * float(cb[y]))
            * 1e6
            + 0.5
        )
        for (x, y), o in cells.items()
    ) - n * 1_000_000
    # Dense direct reference: Σ over ALL cells (O-E)^2/E.
    dense = sum(
        (cells.get((x, y), 0) - ra[x] * cb[y] / n) ** 2 / (ra[x] * cb[y] / n)
        for x in ra
        for y in cb
    )
    assert out["n"] == n
    assert out["chi2_micro"] == total
    # the quantized statistic tracks the dense float one to bin slop
    assert abs(out["chi2_micro"] - dense * 1e6) <= len(ra) * len(cb) + 1
    assert out["dof"] == (len(ra) - 1) * (len(cb) - 1)


# --------------------------------------------------------------------------
# runs_test vs a brute-force scan
# --------------------------------------------------------------------------


@given(xs=st.lists(st.integers(-5, 5), min_size=1, max_size=20))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_runs_matches_bruteforce(spark, xs):
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, x long"
    )
    out = runs_test(df, "t", "x").collect()[0]
    n = len(xs)
    med = sorted(xs)[(n + 1) // 2 - 1]  # lower median
    signs = [x > med for x in xs]
    runs = 1 + sum(1 for i in range(1, n) if signs[i] != signs[i - 1])
    a, b = sum(signs), n - sum(signs)
    assert out["median_val"] == med
    assert (out["n_pos"], out["n_neg"]) == (a, b)
    assert out["n_runs"] == runs
    assert out["expected_runs_micro"] == 1_000_000 + _micro(2 * a * b, n)


# --------------------------------------------------------------------------
# psi_two_sample vs a brute-force binning replica
# --------------------------------------------------------------------------


@given(
    a=st.lists(st.integers(0, 9), min_size=1, max_size=15),
    b=st.lists(st.integers(0, 9), min_size=0, max_size=15),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_psi_matches_bruteforce(spark, a, b):
    n_bins = 4
    rows = [(float(v), True) for v in a] + [(float(v), False) for v in b]
    out = {
        r["bin"]: r
        for r in psi_two_sample(
            spark.createDataFrame(rows, "v double, in_a boolean"),
            "v",
            "in_a",
            n_bins=n_bins,
        ).collect()
    }
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    # edges: least value whose cumulative A-count reaches ceil(k*na/4)
    edges = []
    for k in range(1, n_bins):
        rank, cum = (k * na + n_bins - 1) // n_bins, 0
        for v in values:
            cum += a.count(v)
            if cum >= rank:
                edges.append(v)
                break
    assert len(edges) == n_bins - 1

    def bin_of(v):
        return 1 + sum(1 for e in edges if v > e)

    for bin_no in range(1, n_bins + 1):
        ab = sum(1 for v in a if bin_of(v) == bin_no)
        bb = sum(1 for v in b if bin_of(v) == bin_no)
        r = out[bin_no]
        assert (r["n_a_bin"], r["n_b_bin"]) == (ab, bb)
        p = (2.0 * ab + 1.0) / (2.0 * na + float(n_bins))
        q = (2.0 * bb + 1.0) / (2.0 * nb + float(n_bins))
        expected = math.floor((p - q) * math.log(p / q) * 1e9 + 0.5)
        assert abs(r["psi_nano"] - expected) <= 1  # ln ulp slack


# --------------------------------------------------------------------------
# reliability_bins vs a brute-force NTILE replica
# --------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.booleans()),
        min_size=2,
        max_size=24,
        unique_by=lambda r: r,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_reliability_matches_ntile_replica(spark, rows):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        reliability_bins,
    )

    k = 3
    data = [(float(s), i, y) for i, (s, y) in enumerate(rows)]
    out = {
        r["bin"]: r
        for r in reliability_bins(
            spark.createDataFrame(data, "v double, o long, y boolean"),
            "v",
            "o",
            "y",
            n_bins=k,
        ).collect()
    }
    # SQL-standard NTILE over the total order (v, o): first n%k buckets
    # take one extra row.
    ordered = sorted(data, key=lambda r: (r[0], r[1]))
    n = len(ordered)
    q, rem = divmod(n, k)
    sizes = [q + 1 if i < rem else q for i in range(k)]
    pos = 0
    for bin_no in range(1, k + 1):
        chunk = ordered[pos : pos + sizes[bin_no - 1]]
        pos += sizes[bin_no - 1]
        if not chunk:
            assert bin_no not in out
            continue
        r = out[bin_no]
        assert r["n"] == len(chunk)
        assert r["n_events"] == sum(1 for c in chunk if c[2])
        assert r["event_rate_micro"] == _micro(r["n_events"], r["n"])
