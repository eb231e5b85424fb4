"""Medallion runner (T6): per-date end-to-end with empty-input guard and
restart safety."""

from __future__ import annotations

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.runner import (
    run_medallion,
    run_medallion_day,
)


def test_runner_two_dates_and_rerun(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("medallion"))
    out = run_medallion(spark, root, ["2024-05-01", "2024-05-02"], n_records=120)
    assert set(out) == {"2024-05-01", "2024-05-02"}
    for stats in out.values():
        assert stats["bronze"] == 120
        assert stats["silver"] >= 2 * 120  # checkpoint fan-out >= 2 per shipment
        assert stats["gold_tables"] == 7

    total_before = spark.read.parquet(f"{root}/silver").count()
    # restart safety: re-running one date must not change totals
    again = run_medallion_day(spark, root, "2024-05-01", n_records=120)
    assert again["bronze"] == 120
    assert spark.read.parquet(f"{root}/silver").count() == total_before

    gold = spark.read.parquet(f"{root}/gold/2024-05-01/fact_courier_metrics")
    assert gold.count() > 0


def test_runner_empty_date_skips(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("medallion2"))
    # generate=False with no bronze data -> guard path
    import os

    os.makedirs(f"{root}/bronze/2024-06-01", exist_ok=True)
    out = run_medallion_day(spark, root, "2024-06-01", generate=False)
    assert out == {"bronze": 0, "silver": 0, "gold_tables": 0}


def test_plan_backfill_partition_discovery(spark, tmp_path_factory):
    """Missing dates surface sorted; present dates are skipped; an absent
    table means everything backfills."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.pipelines.runner import (
        plan_backfill,
    )

    root = str(tmp_path_factory.mktemp("bf") / "silver")
    dates = ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert plan_backfill(spark, root, dates) == dates  # no table yet

    spark.createDataFrame(
        [(1, "2024-01-02")], "k long, load_date string"
    ).write.partitionBy("load_date").parquet(root)
    assert plan_backfill(spark, root, dates) == ["2024-01-01", "2024-01-03"]
