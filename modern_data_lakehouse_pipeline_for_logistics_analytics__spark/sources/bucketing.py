"""Bucketed tables: the co-located-join layout (SURVEY.md section 4).

A fact<->fact join on a high-cardinality key shuffles BOTH sides every
query.  Writing the tables bucketed on the join key (same bucket count)
pre-partitions the data at rest: Spark's scan reports the bucketing as
the output partitioning, so the sort-merge join needs NO Exchange on
either side -- the single biggest recurring-shuffle saving available at
100 TB (pay the shuffle once at write, never at read).

Bucketed writes require ``saveAsTable`` (the bucket metadata lives in the
catalog, not the files); ``path`` keeps the data external.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed (and optionally sorted)
    table.  Joins/aggregations keyed on ``bucket_by`` between tables
    with the SAME bucket count read shuffle-free."""
    writer = df.write.mode(mode).option("path", path).bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
