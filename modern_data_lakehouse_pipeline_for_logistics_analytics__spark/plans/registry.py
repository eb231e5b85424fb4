"""Query registry backing the ``__spark_entry__`` driver contract.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional ANSI-SQL oracle string DuckDB runs over the same parquet tables.
Column names must match exactly between the two (the driver sorts columns by
name before hashing values), so every computed column is aliased on BOTH
sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query plan and (optionally) its DuckDB oracle.

    Queries with no oracle (non-SQL-expressible: streaming, approximate,
    LSH-bucketed) get the driver's weaker rows-only check.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the ``events`` fixture with ``ts`` as a microsecond timestamp,
    whatever physical type the fixture generation used.  Fixtures have
    shipped ``ts`` two ways across rounds:

    - parquet TIMESTAMP(MICROS): Spark reads it as a timestamp directly --
      pass through.
    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
      (PARQUET_TYPE_ILLEGAL), so read nanos as long (runtime conf) and
      truncate to microseconds -- the same truncation Python's datetime
      applies to DuckDB's TIMESTAMP_NS, so oracle comparisons stay exact.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if isinstance(df.schema["ts"].dataType, LongType):
        # Integral `div`, NOT float division: ns values ~1.7e18 lose their
        # last digits in a double, rounding some timestamps up 1us vs
        # DuckDB's truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
