"""Medallion runner (SURVEY.md T6 / section 3.4).

The reference sequences bronze -> silver -> gold -> warehouse as four OS
processes under an Airflow DAG (`scheduling/orchestration.py:86-167`),
with stage handoff through the lake.  This runner keeps the same stage
boundaries (each stage reads what the previous wrote -- restartable,
idempotent) in one deterministic Python entry point; schedulers call
``run_medallion_day`` per date and get the reference's daily semantics
without the 7-day rewrite.

Retry/alerting parity: the reference's DAG gives every task
``retries=2`` with a 1-minute delay (`scheduling/orchestration.py:44-45,
124-125,137,146`) and a ``send_failure_notification`` task gated on
``trigger_rule="one_failed"`` (`orchestration.py:150-167`).
``run_with_retries`` reproduces both semantics engine-side: per-stage
bounded retries with a delay, and an ``on_failure`` hook invoked ONCE
with the failing stage's name and final exception -- the stage sequence
stops there, exactly like a downstream-skipping DAG failure.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import SparkSession

from .bronze import generate_bronze_day, write_bronze_json
from .gold import build_gold_tables, write_gold
from .silver import read_bronze, silver_transform, write_silver


class StageFailure(RuntimeError):
    """A stage exhausted its retries; ``.stage`` names it."""

    def __init__(self, stage: str, cause: BaseException):
        super().__init__(f"stage {stage!r} failed after retries: {cause}")
        self.stage = stage
        self.__cause__ = cause


def run_with_retries(
    stages: list[tuple[str, Callable[[], object]]],
    retries: int = 2,
    retry_delay_sec: float = 60.0,
    on_failure: Callable[[str, BaseException], None] | None = None,
    _sleep: Callable[[float], None] = time.sleep,
) -> dict[str, object]:
    """Run named stages in order; each gets ``retries`` re-attempts with
    ``retry_delay_sec`` between them (Airflow ``retries``/``retry_delay``
    parity).  On final failure the ``on_failure`` hook fires once (the
    one_failed notification task) and ``StageFailure`` propagates --
    downstream stages never run, matching DAG dependency semantics.
    Returns {stage_name: result} for completed stages.  Transient
    failures (a flaky object-store PUT, a warehouse deadlock) therefore
    self-heal without rerunning completed stages -- each stage reads what
    the previous one committed to the lake, so a retry re-executes only
    its own idempotent write."""
    results: dict[str, object] = {}
    for name, fn in stages:
        last_exc: BaseException | None = None
        for attempt in range(retries + 1):
            if attempt:
                _sleep(retry_delay_sec)
            try:
                results[name] = fn()
                last_exc = None
                break
            except Exception as exc:  # noqa: BLE001 -- stage boundary
                last_exc = exc
        if last_exc is not None:
            if on_failure is not None:
                on_failure(name, last_exc)
            raise StageFailure(name, last_exc)
    return results


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


def run_medallion_day_retried(
    spark: SparkSession,
    lake_root: str,
    date_str: str,
    n_records: int = 1000,
    generate: bool = True,
    retries: int = 2,
    retry_delay_sec: float = 60.0,
    on_failure=None,
) -> dict[str, object]:
    """``run_medallion_day`` split at the reference's task boundaries
    (bronze / silver / gold) under ``run_with_retries``: each stage's
    write is idempotent (dynamic partition overwrite), so a retry redoes
    only the failed stage, and a final failure fires the notification
    hook and skips downstream -- the full orchestration contract of
    `scheduling/orchestration.py` without an Airflow dependency."""
    bronze_root = f"{lake_root}/bronze"
    silver_root = f"{lake_root}/silver"
    gold_root = f"{lake_root}/gold/{date_str}"

    def bronze() -> int:
        if generate:
            write_bronze_json(
                generate_bronze_day(spark, date_str, n_records), bronze_root, date_str
            )
        return read_bronze(spark, f"{bronze_root}/{date_str}").count()

    silver_rows = {"n": 0}

    def silver() -> int:
        df_bronze = read_bronze(spark, f"{bronze_root}/{date_str}")
        if df_bronze.isEmpty():
            return 0
        write_silver(silver_transform(df_bronze, date_str), silver_root)
        n = spark.read.parquet(silver_root).filter(f"load_date = '{date_str}'").count()
        silver_rows["n"] = n
        return n

    def gold() -> int:
        # Empty-input guard (T3): a date with no silver rows skips gold,
        # mirroring run_medallion_day's early return.
        if not silver_rows["n"]:
            return 0
        back = spark.read.parquet(silver_root).filter(f"load_date = '{date_str}'")
        tables = build_gold_tables(back)
        write_gold(tables, gold_root)
        return len(tables)

    return run_with_retries(
        [("bronze", bronze), ("silver", silver), ("gold", gold)],
        retries=retries,
        retry_delay_sec=retry_delay_sec,
        on_failure=on_failure,
    )


def plan_backfill(
    spark,
    silver_root: str,
    expected_dates: list[str],
    partition_col: str = "load_date",
) -> list[str]:
    """Backfill planner: which of ``expected_dates`` are MISSING from the
    partitioned silver table -- the work list ``run_medallion`` re-runs
    (idempotent dynamic-partition overwrite makes re-running a present
    date harmless, but the planner keeps backfills from reprocessing the
    whole calendar the way the reference's fixed 7-day lookback did,
    `scheduling/orchestration.py:90-91`).

    Partition discovery only: reads the directory listing / partition
    values, never the data files.  Dates come back sorted so the
    backfill replays in order.
    """
    import os

    if not os.path.isdir(silver_root):
        return sorted(expected_dates)
    from pyspark.sql import functions as F

    # Cast to string: parquet partition-column type inference reads
    # date-shaped directory values back as DATE, which would never equal
    # the caller's ISO strings.
    present = {
        r[0]
        for r in spark.read.parquet(silver_root)
        .select(F.col(partition_col).cast("string"))
        .distinct()
        .collect()
    }
    return sorted(d for d in expected_dates if d not in present)
