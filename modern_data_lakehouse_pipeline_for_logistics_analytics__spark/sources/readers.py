"""Sources (SURVEY.md section 2.1, S1-S3, S10).

The reference reads multiline JSON with schema inference
(`Silver_layer/Silver_tranformation.py:62`), partitioned parquet
(`Gold_layer/starschema.py:59`) and header CSV
(`Snowflake/snowflake_connection.py:79-82`).  At 100 TB, schema inference is
an extra full pass over the data, so every reader here accepts an explicit
schema and only falls back to inference when none is given.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: Driver fixture tables (TESTDATA.md); one parquet file per table.
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan; Catalyst pushes filters/projections into the reader
    (verify with .explain -> PushedFilters / ReadSchema)."""
    return spark.read.parquet(path)


def read_json_multiline(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Bronze-style whole-file JSON-array scan (S1).

    Reference: `Silver_tranformation.py:62` (`multiline=True`, inferred).
    Multiline JSON cannot be split within a file, so parallelism = file
    count: bronze producers must emit many files per partition, not one
    giant array (the reference writes exactly one file/day,
    `Bronze_layer/extraction.py:122-128` -- a scale bug we do not copy).
    """
    reader = spark.read.option("multiline", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Line-JSON scan that never drops OR fails on malformed records --
    returns ``(good, quarantined)``.

    At 100 TB some malformed records are a certainty; FAILFAST kills the
    job on the first one and DROPMALFORMED silently loses data.
    PERMISSIVE with ``columnNameOfCorruptRecord`` keeps the raw text of
    every bad line so the quarantine frame can be audited/replayed.  The
    frame is cached before splitting: Spark refuses a filter that
    references only the corrupt column on an uncached scan (the parser
    would need to re-run with a different required schema).
    """
    from pyspark.sql import functions as F

    full_schema = schema.add(corrupt_col, "string")
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
        .cache()
    )
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """Header CSV scan (S3). Reference leaves every column string
    (`snowflake_connection.py:79-82`); pass a schema to get typed columns
    without an inference pass."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC columnar scan (beyond §2: interchange with Hive/Trino stacks
    whose warehouses are ORC-native).  Same pushdown story as parquet --
    Spark's vectorized ORC reader honors filter pushdown and column
    pruning (verify with .explain -> PushedFilters / ReadSchema)."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """Raw text ingestion for document corpora (beyond §2; the
    training-data path often starts from plain .txt shards).  Default is
    one row per LINE (splittable -> parallelism from file blocks, the
    100 TB-safe mode); ``whole_file=True`` gives one row per FILE
    (parallelism = file count, same caveat as multiline JSON -- use only
    when documents are files).  NOTE: must be the ``wholetext`` kwarg of
    ``.text()`` -- ``.option("wholetext", ...)`` is silently ignored by
    this reader (verified against pyspark 4.1)."""
    return spark.read.text(path, wholetext=whole_file)


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load driver fixture tables from ``sf_dir`` (defaults to all ten)."""
    use = names or TABLE_NAMES
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in use}
