"""Hand cases for the r12 batch 2: KS two-sample drift, chi-square
independence, the runs test, JSD source drift, binary rank evaluation
(P/R/MRR), and the feature-hashing collision audit."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
    chisq_independence,
    ks_two_sample,
    runs_test,
)


# --------------------------------------------------------------------------
# ks_two_sample: exact integer sup-gap
# --------------------------------------------------------------------------


def _ksdf(spark, rows):
    return spark.createDataFrame(rows, "v double, in_a boolean")


def test_ks_hand_case(spark):
    # A = {1,2,3}, B = {1,5}: scaled gaps |cum_a*n_b - cum_b*n_a| over
    # values 1,2,3,5 are 1,1,3,0 -> D = 3/(3*2) = 0.5 attained at v=3.
    rows = [(1.0, True), (2.0, True), (3.0, True), (1.0, False), (5.0, False)]
    out = ks_two_sample(_ksdf(spark, rows), "v", "in_a").collect()[0]
    assert (out["n_a"], out["n_b"]) == (3, 2)
    assert out["ks_at"] == 3.0
    assert out["ks_micro"] == 500_000


def test_ks_identical_samples_zero(spark):
    rows = [(v, f) for v in (1.0, 2.0, 7.0) for f in (True, False)]
    out = ks_two_sample(_ksdf(spark, rows), "v", "in_a").collect()[0]
    assert out["ks_micro"] == 0


def test_ks_nulls_excluded_and_degenerate(spark):
    # NULL values carry no rank; an empty side yields the -1 sentinel.
    rows = [(1.0, True), (None, False), (2.0, True)]
    out = ks_two_sample(_ksdf(spark, rows), "v", "in_a").collect()[0]
    assert (out["n_a"], out["n_b"]) == (2, 0)
    assert out["ks_micro"] == -1


def test_ks_disjoint_supports_full_distance(spark):
    # A entirely below B: D = 1.
    rows = [(1.0, True), (2.0, True), (10.0, False), (11.0, False)]
    out = ks_two_sample(_ksdf(spark, rows), "v", "in_a").collect()[0]
    assert out["ks_micro"] == 1_000_000
    assert out["ks_at"] == 2.0  # smallest value attaining the sup


# --------------------------------------------------------------------------
# chisq_independence
# --------------------------------------------------------------------------


def _cdf(spark, rows):
    return spark.createDataFrame(rows, "a string, b long")


def test_chisq_independent_is_zero(spark):
    # Perfectly balanced 2x2: observed == expected in every cell.
    rows = [("x", 0)] * 5 + [("x", 1)] * 5 + [("y", 0)] * 5 + [("y", 1)] * 5
    out = chisq_independence(_cdf(spark, rows), "a", "b").collect()[0]
    assert out["n"] == 20 and out["n_cells"] == 4 and out["dof"] == 1
    assert out["chi2_micro"] == 0


def test_chisq_perfect_association(spark):
    # Diagonal-only 2x2 with n=4: chi-square = n = 4 (phi = 1).
    rows = [("x", 0), ("x", 0), ("y", 1), ("y", 1)]
    out = chisq_independence(_cdf(spark, rows), "a", "b").collect()[0]
    assert out["n_cells"] == 2  # empty cells never materialize
    assert out["dof"] == 1
    assert out["chi2_micro"] == 4_000_000


def test_chisq_nulls_excluded(spark):
    rows = [("x", 0), (None, 1), ("y", None), ("y", 1)]
    out = chisq_independence(_cdf(spark, rows), "a", "b").collect()[0]
    assert out["n"] == 2


# --------------------------------------------------------------------------
# runs_test
# --------------------------------------------------------------------------


def _rdf(spark, xs):
    return spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, x long"
    )


def test_runs_alternating_series(spark):
    # [1,5,1,5,1]: lower median 1, signs F T F T F -> 5 runs;
    # a=2, b=3: expected = 1 + 12/5 = 3.4; var = 84/100 = 0.84.
    out = runs_test(_rdf(spark, [1, 5, 1, 5, 1]), "t", "x").collect()[0]
    assert (out["n"], out["n_pos"], out["n_neg"]) == (5, 2, 3)
    assert out["median_val"] == 1
    assert out["n_runs"] == 5
    assert out["expected_runs_micro"] == 3_400_000
    assert out["var_runs_micro"] == 840_000


def test_runs_monotone_series(spark):
    # [1,2,3,4]: lower median 2, signs F F T T -> exactly 2 runs (the
    # trend signature).
    out = runs_test(_rdf(spark, [1, 2, 3, 4]), "t", "x").collect()[0]
    assert out["median_val"] == 2
    assert (out["n_pos"], out["n_neg"]) == (2, 2)
    assert out["n_runs"] == 2


def test_runs_constant_series(spark):
    # All equal: nothing above the median -> one run of "below".
    out = runs_test(_rdf(spark, [7, 7, 7]), "t", "x").collect()[0]
    assert (out["n_pos"], out["n_neg"], out["n_runs"]) == (0, 3, 1)
    assert out["expected_runs_micro"] == 1_000_000  # 1 + 0


def test_runs_null_values_dropped(spark):
    # NULL x rows must be excluded before the median/sign pass (r13):
    # a NULL would violate global_cumsum's non-null contract and order
    # differently across engines.  Same result as the alternating
    # series with the NULLs absent.
    rows = [(0, 1), (1, None), (2, 5), (3, 1), (4, None), (5, 5), (6, 1)]
    df = spark.createDataFrame(rows, "t long, x long")
    out = runs_test(df, "t", "x").collect()[0]
    ref = runs_test(_rdf(spark, [1, 5, 1, 5, 1]), "t", "x").collect()[0]
    assert out == ref


# --------------------------------------------------------------------------
# jsd_source_drift
# --------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_jsd_identical_distributions_zero(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        jsd_source_drift,
    )

    # Every source's distribution equals the corpus mix -> JSD = 0.
    out = jsd_source_drift(
        _docs(spark, [("s1", "a b"), ("s2", "a b")]), "source", "text"
    ).collect()
    assert {r["source"]: r["jsd_nano"] for r in out} == {"s1": 0, "s2": 0}


def test_jsd_disjoint_vocab_hand_value(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        jsd_source_drift,
    )

    # s1 = "a a", s2 = "b b": corpus = {a: .5, b: .5}.  For each source
    # p=1 vs c=.5 on its own term (m=.75) plus the closed-form
    # 0.5*ln2*(uncovered corpus mass .5) tail; symmetric by construction.
    out = {
        r["source"]: r
        for r in jsd_source_drift(
            _docs(spark, [("s1", "a a"), ("s2", "b b")]), "source", "text"
        ).collect()
    }
    p, c = 1.0, 0.5
    m = (p + c) / 2.0
    term = 0.5 * p * math.log(p / m) + 0.5 * c * math.log(c / m)
    tail = 0.5 * math.log(2.0) * 0.5
    expected = math.floor(term * 1e9 + 0.5) + math.floor(tail * 1e9 + 0.5)
    for s in ("s1", "s2"):
        # +-1 nano slack: JVM Math.log vs libm may differ in the last ulp.
        assert abs(out[s]["jsd_nano"] - expected) <= 1
        assert out[s]["n_tokens"] == 2 and out[s]["n_terms"] == 1
    assert out["s1"]["jsd_nano"] == out["s2"]["jsd_nano"]  # symmetry


def test_jsd_bounded_by_ln2(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        jsd_source_drift,
    )

    out = jsd_source_drift(
        _docs(spark, [("s1", "a a a"), ("s2", "b"), ("s3", "c c")]),
        "source",
        "text",
    ).collect()
    for r in out:
        assert 0 <= r["jsd_nano"] <= math.floor(math.log(2.0) * 1e9 + 0.5)


# --------------------------------------------------------------------------
# rank_eval_table
# --------------------------------------------------------------------------


def test_rank_eval_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.retrieval import (
        rank_eval_table,
    )

    ranked = spark.createDataFrame(
        [("d1", 1), ("d2", 2), ("d3", 3)], "doc string, rank long"
    )
    # d2 relevant and retrieved; d9 relevant but missed -> recall caps
    # at 1/2; first relevant at rank 2 -> RR = 0.5.
    rel = spark.createDataFrame(
        [("d2", 1), ("d9", 2), ("d3", 0)], "doc string, rel long"
    )
    rows = {
        r["rank"]: r
        for r in rank_eval_table(ranked, rel, "doc", 3).collect()
    }
    assert [rows[i]["hits"] for i in (1, 2, 3)] == [0, 1, 1]
    assert rows[1]["prec_micro"] == 0
    assert rows[2]["prec_micro"] == 500_000
    assert rows[3]["prec_micro"] == 333_333
    assert rows[3]["recall_micro"] == 500_000
    assert all(rows[i]["rr_micro"] == 500_000 for i in (1, 2, 3))


def test_rank_eval_no_relevant_sentinels(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.retrieval import (
        rank_eval_table,
    )

    ranked = spark.createDataFrame([("d1", 1)], "doc string, rank long")
    rel = spark.createDataFrame([("d1", 0)], "doc string, rel long")
    out = rank_eval_table(ranked, rel, "doc", 1).collect()[0]
    assert out["recall_micro"] == -1  # no relevant docs exist
    assert out["rr_micro"] == 0  # none retrieved either


# --------------------------------------------------------------------------
# feature_hash_audit
# --------------------------------------------------------------------------


def _h60(term: str) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[1:16], 16)


def test_feature_hash_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        feature_hash_audit,
    )

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    out = {
        r["bucket"]: r
        for r in feature_hash_audit(docs, "text", 64).collect()
    }
    expected: dict[int, list[tuple[int, int]]] = {}
    for term, tf in (("apple", 2), ("banana", 2), ("cherry", 1)):
        h = _h60(term)
        sign = 1 if (h // 64) % 2 == 0 else -1
        expected.setdefault(h % 64, []).append((tf, sign))
    assert set(out) == set(expected)
    for b, items in expected.items():
        assert out[b]["n_terms"] == len(items)
        assert out[b]["n_postings"] == sum(tf for tf, _ in items)
        assert out[b]["net_weight"] == sum(tf * s for tf, s in items)


def test_feature_hash_mass_conservation(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        feature_hash_audit,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 3} shared") for i in range(20)],
        "doc_id long, text string",
    )
    rows = feature_hash_audit(docs, "text", 16).collect()
    assert sum(r["n_postings"] for r in rows) == 60  # 3 tokens x 20 docs
    assert all(0 <= r["bucket"] < 16 for r in rows)
    assert all(abs(r["net_weight"]) <= r["n_postings"] for r in rows)


# --------------------------------------------------------------------------
# psi_two_sample
# --------------------------------------------------------------------------


def test_psi_identical_samples_zero(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        psi_two_sample,
    )

    rows = [(float(v), f) for v in range(1, 11) for f in (True, False)]
    df = spark.createDataFrame(rows, "v double, in_a boolean")
    out = psi_two_sample(df, "v", "in_a", n_bins=10).collect()
    assert len(out) == 10
    assert all(r["psi_nano"] == 0 for r in out)  # p == q in every bin
    assert [r["bin"] for r in out] == list(range(1, 11))


def test_psi_disjoint_shift_hand_value(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        psi_two_sample,
    )

    # A = ten 1.0s, B = ten 2.0s: every A-decile edge is 1.0 (cum_a hits
    # every rank at the single value), so A lands in bin 1 and B --
    # above ALL nine edges -- in bin 10; add-half smoothing keeps all 10
    # bins defined.  Expected values replayed with the same op order.
    rows = [(1.0, True)] * 10 + [(2.0, False)] * 10
    df = spark.createDataFrame(rows, "v double, in_a boolean")
    out = {r["bin"]: r for r in psi_two_sample(df, "v", "in_a").collect()}
    assert (out[1]["n_a_bin"], out[1]["n_b_bin"]) == (10, 0)
    assert (out[10]["n_a_bin"], out[10]["n_b_bin"]) == (0, 10)

    def share(cnt, n):
        return (2.0 * cnt + 1.0) / (2.0 * n + 10.0)

    def contrib(a, b):
        p, q = share(a, 10), share(b, 10)
        return math.floor((p - q) * math.log(p / q) * 1e9 + 0.5)

    for b, r in out.items():
        expected = contrib(r["n_a_bin"], r["n_b_bin"])
        assert abs(r["psi_nano"] - expected) <= 1  # ulp slack on ln
    # Empty-both bins contribute 0 exactly (p == q under smoothing).
    assert out[5]["psi_nano"] == 0


def test_psi_nonneg_total(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        psi_two_sample,
    )

    rows = [(float(v % 7) + (0.5 if f else 0.0), f)
            for v in range(60) for f in (True, False)]
    df = spark.createDataFrame(rows, "v double, in_a boolean")
    out = psi_two_sample(df, "v", "in_a").collect()
    # PSI is a sum of (p-q)ln(p/q) terms, each >= 0.
    assert all(r["psi_nano"] >= 0 for r in out)


# --------------------------------------------------------------------------
# reliability_bins
# --------------------------------------------------------------------------


def test_reliability_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        reliability_bins,
    )

    df = spark.createDataFrame(
        [(1.0, 1, False), (2.0, 2, False), (3.0, 3, True), (4.0, 4, True)],
        "v double, o long, y boolean",
    )
    out = {r["bin"]: r for r in
           reliability_bins(df, "v", "o", "y", n_bins=2).collect()}
    assert (out[1]["n"], out[1]["n_events"]) == (2, 0)
    assert (out[2]["n"], out[2]["n_events"]) == (2, 2)
    assert out[1]["pred_micro"] == 250_000 and out[2]["pred_micro"] == 750_000
    assert out[1]["event_rate_micro"] == 0
    assert out[2]["event_rate_micro"] == 1_000_000
    # sum (p-y)^2 in e12: bin1 = 2*0.25^2 = 0.125; bin2 = 2*(0.75-1)^2.
    assert out[1]["brier_e12"] == 125_000_000_000
    assert out[2]["brier_e12"] == 125_000_000_000


def test_reliability_null_scores_excluded(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        reliability_bins,
    )

    df = spark.createDataFrame(
        [(1.0, 1, True), (None, 2, True), (2.0, 3, False)],
        "v double, o long, y boolean",
    )
    out = reliability_bins(df, "v", "o", "y", n_bins=2).collect()
    assert sum(r["n"] for r in out) == 2
