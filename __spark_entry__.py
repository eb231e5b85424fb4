"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries live in
``modern_data_lakehouse_pipeline_for_logistics_analytics__spark/plans/``;
each module registers (name, callable, oracle-SQL) triples covering the
SURVEY.md section 2 operator inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans import (
    ORACLE,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The courier-metrics aggregate (`Gold_layer/starschema.py:137-145`
    semantics) transplanted onto ``orders``: per-priority distinct count,
    conditional count, 2dp average, derived percentage.
    """
    return QUERIES["courier_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for ops with no exact
    SQL expression -- approx sketches, LSH bucketing, streaming -- which get
    the driver's rows-only check)."""
    return dict(ORACLE)
