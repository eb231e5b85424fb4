"""Hand-case tests for the retrieval-model operators (query-likelihood,
reciprocal-rank fusion, nDCG) -- oracle parity proves fixture-scale
bit-equality; these prove the semantic edges a fixture dodges:
zero-hit documents still scored, corpus-absent query terms dropped,
RRF integer contributions and missing-list behavior, perfect-ranking
nDCG == 1.0 exactly, rel-less ranked docs counting as rel = 0."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.retrieval import (
    ndcg_table,
    ql_dirichlet_topk,
    rrf_fuse,
)


def _nano(x: float) -> int:
    return math.floor(x * 1e9 + 0.5)


# ------------------------------------------------------ query likelihood
def test_ql_scores_match_hand_computation(spark):
    # corpus: d1 = "a a b", d2 = "b c c c"; query = [a, c], mu = 2.0
    # L = 7, c_a = 2, c_c = 3.
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c c c")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in ql_dirichlet_topk(
            df, "doc_id", "text", ["a", "c"], mu=2.0, topn=10
        ).collect()
    }
    mu, L = 2.0, 7.0
    c = _nano(math.log(mu * 2.0 / L)) + _nano(math.log(mu * 3.0 / L))
    # d1: hit on a (tf=2): ln((2*7 + 2*2)/(2*2)); doc part 2*ln(3+2)
    d1 = (
        _nano(math.log((2 * 7.0 + mu * 2.0) / (mu * 2.0)))
        + c
        - _nano(2.0 * math.log(3.0 + mu))
    )
    # d2: hit on c (tf=3): ln((3*7 + 2*3)/(2*3)); doc part 2*ln(4+2)
    d2 = (
        _nano(math.log((3 * 7.0 + mu * 3.0) / (mu * 3.0)))
        + c
        - _nano(2.0 * math.log(4.0 + mu))
    )
    assert rows[1]["score_fp"] == d1
    assert rows[2]["score_fp"] == d2
    assert rows[1]["n_hit_terms"] == 1 and rows[2]["n_hit_terms"] == 1
    assert rows[1]["dl"] == 3 and rows[2]["dl"] == 4


def test_ql_zero_hit_doc_still_scored_and_absent_terms_dropped(spark):
    # d3 contains no query term -> score = C - n_q*ln(dl+mu); the term
    # 'zzz' never occurs in the corpus -> dropped (n_q counts survivors).
    df = spark.createDataFrame(
        [(1, "a b"), (2, "b b"), (3, "c c c")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in ql_dirichlet_topk(
            df, "doc_id", "text", ["a", "zzz"], mu=1.0, topn=10
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # zero-hit docs 2 and 3 still present
    L = 7.0
    c = _nano(math.log(1.0 * 1.0 / L))  # only 'a' survives, c_a = 1
    assert out[2]["n_hit_terms"] == 0
    assert out[2]["score_fp"] == c - _nano(1.0 * math.log(2.0 + 1.0))
    assert out[3]["score_fp"] == c - _nano(1.0 * math.log(3.0 + 1.0))
    # shorter zero-hit doc scores higher (less mass to explain)
    assert out[2]["score_fp"] > out[3]["score_fp"]


def test_ql_requires_terms(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ql_dirichlet_topk(df, "doc_id", "text", [])


# ------------------------------------------------------------------- RRF
def test_rrf_integer_contributions_and_missing_list(spark):
    # k=60: rank 1 -> round(1e6/61) = 16393, rank 2 -> round(1e6/62) =
    # 16129, rank 3 -> round(1e6/63) = 15873.
    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "id long, rank long"
    )
    b = spark.createDataFrame([(20, 1), (40, 2)], "id long, rank long")
    out = {
        r["id"]: r for r in rrf_fuse(a, b, "id", k=60, topn=10).collect()
    }
    assert out[20]["rrf_fp"] == 16129 + 16393  # both lists
    assert out[10]["rrf_fp"] == 16393 and out[10]["rank_b"] is None
    assert out[40]["rrf_fp"] == 16129 and out[40]["rank_a"] is None
    assert out[30]["rrf_fp"] == 15873
    # doc in both lists outranks either single-list doc
    ordered = [
        r["id"] for r in rrf_fuse(a, b, "id", k=60, topn=10).collect()
    ]
    assert ordered[0] == 20


def test_rrf_tie_breaks_on_id_and_validates_k(spark):
    a = spark.createDataFrame([(5, 1), (3, 2)], "id long, rank long")
    b = spark.createDataFrame([(3, 1), (5, 2)], "id long, rank long")
    ordered = [r["id"] for r in rrf_fuse(a, b, "id", k=60, topn=10).collect()]
    assert ordered == [3, 5]  # equal scores -> id ascending
    with pytest.raises(ValueError):
        rrf_fuse(a, b, "id", k=0)


# ------------------------------------------------------------------ nDCG
def test_ndcg_perfect_ranking_is_exactly_one(spark):
    rel = spark.createDataFrame(
        [(1, 3), (2, 2), (3, 1), (4, 0)], "id long, rel long"
    )
    ranked = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "id long, rank long"
    )
    rows = ndcg_table(ranked, rel, "id", 3).orderBy("rank").collect()
    assert [r["ndcg_micro"] for r in rows] == [1000000, 1000000, 1000000]
    assert [r["rel"] for r in rows] == [3, 2, 1]
    # gains: (2^rel - 1)/log2(rank+1) nano-rounded
    assert rows[0]["gain_nano"] == _nano(7.0)
    assert rows[1]["gain_nano"] == _nano(3.0 / math.log2(3.0))
    assert rows[2]["gain_nano"] == _nano(1.0 / 2.0)


def test_ndcg_swapped_ranking_and_missing_rel(spark):
    # ideal order is 1(rel 3), 2(rel 1); ranking puts 2 first and ranks
    # doc 9 which has NO relevance row -> rel 0, gain 0.
    rel = spark.createDataFrame([(1, 3), (2, 1)], "id long, rel long")
    ranked = spark.createDataFrame(
        [(2, 1), (1, 2), (9, 3)], "id long, rank long"
    )
    rows = {r["rank"]: r for r in ndcg_table(ranked, rel, "id", 3).collect()}
    assert rows[3]["rel"] == 0 and rows[3]["gain_nano"] == 0
    g_at1 = _nano(1.0)  # doc 2: (2^1-1)/log2(2) = 1
    i_at1 = _nano(7.0)  # ideal: doc 1 first
    assert rows[1]["dcg_nano"] == g_at1
    assert rows[1]["idcg_nano"] == i_at1
    assert rows[1]["ndcg_micro"] == (2 * g_at1 * 1000000 + i_at1) // (
        2 * i_at1
    )
    # rank 2: dcg adds doc 1's gain 7/log2(3); idcg adds doc 2's 1/log2(3)
    dcg2 = g_at1 + _nano(7.0 / math.log2(3.0))
    idcg2 = i_at1 + _nano(1.0 / math.log2(3.0))
    assert rows[2]["dcg_nano"] == dcg2
    assert rows[2]["idcg_nano"] == idcg2
    # all-zero relevance at a rank -> idcg 0 -> NULL ndcg (guarded)
    rel0 = spark.createDataFrame([(2, 0)], "id long, rel long")
    rk0 = spark.createDataFrame([(2, 1)], "id long, rank long")
    row0 = ndcg_table(rk0, rel0, "id", 1).collect()[0]
    assert row0["ndcg_micro"] is None
    with pytest.raises(ValueError):
        ndcg_table(ranked, rel, "id", 0)
