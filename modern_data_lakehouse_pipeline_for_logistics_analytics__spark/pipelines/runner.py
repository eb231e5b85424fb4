"""Medallion runner (SURVEY.md T6 / section 3.4).

The reference sequences bronze -> silver -> gold -> warehouse as four OS
processes under an Airflow DAG (`scheduling/orchestration.py:86-167`),
with stage handoff through the lake.  This runner keeps the same stage
boundaries (each stage reads what the previous wrote -- restartable,
idempotent) in one deterministic Python entry point; schedulers call
``run_medallion_day`` per date and get the reference's daily semantics
without the 7-day rewrite.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .bronze import generate_bronze_day, write_bronze_json
from .gold import build_gold_tables, write_gold
from .silver import read_bronze, silver_transform, write_silver


def run_medallion_day(
    spark: SparkSession,
    lake_root: str,
    date_str: str,
    n_records: int = 1000,
    generate: bool = True,
) -> dict[str, int]:
    """One date end-to-end: (optional) bronze generation -> silver
    flatten/clean -> gold star schema.  Returns row counts per stage
    (computed once each -- the reference double-counts every stage,
    `Silver_tranformation.py:71,124`).

    Empty-input guard (T3): a date with no bronze rows skips downstream
    stages, mirroring `Silver_tranformation.py:67-69`.
    """
    bronze_root = f"{lake_root}/bronze"
    silver_root = f"{lake_root}/silver"
    gold_root = f"{lake_root}/gold/{date_str}"

    if generate:
        write_bronze_json(generate_bronze_day(spark, date_str, n_records), bronze_root, date_str)

    df_bronze = read_bronze(spark, f"{bronze_root}/{date_str}")
    if df_bronze.isEmpty():
        return {"bronze": 0, "silver": 0, "gold_tables": 0}

    df_silver = silver_transform(df_bronze, date_str)
    write_silver(df_silver, silver_root)

    df_silver_back = spark.read.parquet(silver_root).filter(
        f"load_date = '{date_str}'"
    )
    gold = build_gold_tables(df_silver_back)
    write_gold(gold, gold_root)

    return {
        "bronze": df_bronze.count(),
        "silver": df_silver_back.count(),
        "gold_tables": len(gold),
    }


def run_medallion(
    spark: SparkSession,
    lake_root: str,
    dates: list[str],
    n_records: int = 1000,
) -> dict[str, dict[str, int]]:
    """Multi-date run -- the reference's 7-day loop without re-processing:
    each date writes only its own partitions (dynamic partition
    overwrite), so re-running any subset is safe."""
    return {d: run_medallion_day(spark, lake_root, d, n_records) for d in dates}
