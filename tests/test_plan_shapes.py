"""Physical-plan regression tests: the PLANS.md claims as assertions.

These pin the plan SHAPES that make queries scale -- broadcast joins on
dims, top-k as TakeOrderedAndProject, predicate pushdown reaching the
parquet scans, the distributed-NTILE partitioning, single-shuffle GEMM
tiling -- so a future edit that silently regresses one (e.g. a dim stops
broadcasting and the fact table starts shuffling) fails a test, not a
benchmark round."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString() + "\n" + (
        df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    )


def test_topk_is_take_ordered(spark, sf_dir):
    p = _plan(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in p, "top-k lost its TakeOrderedAndProject plan"


def test_tpch_q3_broadcasts_dims(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in p, "q3 dims no longer broadcast"
    assert "SortMergeJoin" not in p, "q3 fact side is shuffling for enrichment"


def test_tpch_q6_pushes_all_predicates(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q6_forecast_revenue")
    assert "PushedFilters:" in p
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in p.split("PushedFilters:", 1)[1], f"{frag} not pushed to scan"


def test_tpch_q19_disjunction_pushed_both_sides(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q19_disjunctive_revenue")
    pushed = [seg.split("]", 1)[0] for seg in p.split("PushedFilters: [")[1:]]
    assert any("l_quantity" in s and "Or(" in s for s in pushed), "lineitem OR not pushed"
    assert any("p_brand" in s and "Or(" in s for s in pushed), "part OR not pushed"


def test_tpch_q4_is_semi_join(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q4_late_shipments")
    assert "LeftSemi" in p, "EXISTS no longer plans as a semi join"


def test_ntile_never_single_partition_window(spark, sf_dir):
    p = _plan(spark, sf_dir, "window_ntile_spend_quartiles")
    assert "windowspecdefinition(__pid" in p, "global NTILE lost its __pid partitioning"
    assert "hashpartitioning(__pid" in p


def test_neardup_single_shuffle_gemm(spark, sf_dir):
    p = _plan(spark, sf_dir, "embedding_neardup_pairs")
    assert "FlatMapGroupsInPandas" in p, "blocked GEMM stage missing"
    assert p.count("Exchange hashpartitioning") == 1, (
        "block-pair GEMM should shuffle exactly once"
    )


def test_courier_metrics_partial_aggregation(spark, sf_dir):
    p = _plan(spark, sf_dir, "courier_metrics")
    assert "HashAggregate" in p
    assert "SortAggregate" not in p


@pytest.mark.parametrize(
    "name", ["project_normalize", "filter_isin_case", "histogram_price_buckets"]
)
def test_narrow_queries_read_pruned_schema(spark, sf_dir, name):
    """Column pruning reaches the scan: ReadSchema must not contain every
    table column (these queries project a strict subset)."""
    p = _plan(spark, sf_dir, name)
    read = p.split("ReadSchema:", 1)[1].splitlines()[0]
    assert len(read.split(",")) <= 6, f"scan reads too many columns: {read}"


def test_topn_per_group_uses_window_group_limit(spark, sf_dir):
    """rank<=N filter must rewrite to WindowGroupLimit (partial stage
    keeps N rows per key BEFORE the shuffle -- at scale this is the
    difference between shuffling 3 rows/key and the whole fact table)."""
    p = _plan(spark, sf_dir, "topn_orders_per_customer")
    assert "WindowGroupLimit" in p
    assert "Partial" in p.split("WindowGroupLimit", 2)[-1] or p.count("WindowGroupLimit") >= 2
