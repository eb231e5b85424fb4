"""Physical-plan pins for the r12 drift/eval/featurization family: the
scale claims (no global sort, bounded shuffles, TakeOrdered argmax,
single-pass windows) asserted mechanically so a refactor that
reintroduces a single-task stage fails a test, not a bench round."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _two_sample(spark, n=40):
    rows = [(float(i % 11), i % 3 == 0) for i in range(n)]
    return spark.createDataFrame(rows, "v double, in_a boolean")


def test_ks_plan_takeordered_no_global_sort(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        ks_two_sample,
    )

    plan = _plan(ks_two_sample(_two_sample(spark), "v", "in_a"))
    # argmax via TakeOrderedAndProject(limit=1), never a full Sort+Limit
    assert "TakeOrderedAndProject" in plan, plan
    # the prefix sum is per-__pid: every Window node must be partitioned
    # (a global Window would read "windowspecdefinition(v" with no
    # partition key and funnel the histogram through one task)
    for line in plan.split("\n"):
        if "windowspecdefinition" in line:
            assert "__pid" in line, line
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan


def test_psi_plan_bounded_shape(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        psi_two_sample,
    )

    plan = _plan(psi_two_sample(_two_sample(spark), "v", "in_a", n_bins=4))
    assert "TakeOrderedAndProject" not in plan  # no argmax stage here
    for line in plan.split("\n"):
        if "windowspecdefinition" in line:
            assert "__pid" in line, line
    # edges ride broadcasts, never a shuffle keyed on the edge row
    assert "BroadcastExchange" in plan, plan


def test_feature_hash_plan_two_exchanges_codegen_only(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        feature_hash_audit,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 3} shared words") for i in range(12)],
        "doc_id long, text string",
    )
    plan = _plan(feature_hash_audit(docs, "text", 16))
    # exactly two shuffles: the distinct-term aggregate and the
    # n_buckets-row final groupBy -- nothing else may appear
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan


def test_reliability_plan_no_global_sort(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        reliability_bins,
    )

    df = spark.createDataFrame(
        [(float(i % 7), i, i % 4 == 0) for i in range(40)],
        "v double, o long, y boolean",
    )
    plan = _plan(reliability_bins(df, "v", "o", "y", n_bins=4))
    # global_ntile's row_number windows are per-range-partition
    for line in plan.split("\n"):
        if "windowspecdefinition" in line:
            assert "__pid" in line, line


def test_rank_eval_single_ranked_subtree(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.retrieval import (
        rank_eval_table,
    )

    ranked = spark.createDataFrame(
        [(f"d{i}", i + 1) for i in range(5)], "doc string, rank long"
    )
    rel = spark.createDataFrame(
        [(f"d{i}", i % 2) for i in range(9)], "doc string, rel long"
    )
    plan = _plan(rank_eval_table(ranked, rel, "doc", 5))
    # the ranked-side join must appear ONCE: first_rel_rank is a window
    # over the same k-row frame, not a second aggregate consumer that
    # re-executes the join (r12 review finding)
    assert plan.count("SortMergeJoin") + plan.count(
        "BroadcastHashJoin"
    ) <= 2, plan  # ranked<->relevance once, + the n_rel broadcast cross
