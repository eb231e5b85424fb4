"""Sinks (SURVEY.md section 2.1, S4-S5).

Reference behavior: full-overwrite, Hive-partitioned parquet for Silver
(`Silver_tranformation.py:121`) and header CSV for Gold
(`Gold_layer/starschema.py:76-146`).  Our default is typed parquet at every
layer (the reference's CSV Gold erases types -- SURVEY.md section 1.3);
CSV remains as an egress format only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink (S4).  With
    ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by the session
    factory) an overwrite only replaces the partitions present in ``df`` --
    the idempotent per-date re-run contract of the reference
    (`Silver_tranformation.py:54,121`) without rewriting the whole table."""
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Header CSV egress (S5) -- export only, not a storage layer."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_orc_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned ORC sink (beyond §2) -- for egress into Hive/Trino
    stacks whose warehouses are ORC-native.  Same dynamic-partition
    overwrite semantics as the parquet sink (session factory sets
    ``partitionOverwriteMode=dynamic``)."""
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.orc(path)


def write_text(df: DataFrame, path: str, column: str, mode: str = "overwrite") -> None:
    """One-column raw text sink (document-corpus egress).  ``column`` is
    cast to string; Spark requires exactly one value column for .text."""
    from pyspark.sql import functions as F

    df.select(F.col(column).cast("string").alias("value")).write.mode(mode).text(path)
