"""Warehouse egress (SURVEY.md S9).

The reference creates one all-STRING Snowflake table per (gold table x
date) and bulk-loads via pandas (`Snowflake/snowflake_connection.py:
94-104`) -- type erasure plus unbounded table proliferation.  Ours writes
ONE typed table per gold entity with a ``load_date`` column, through
Spark's generic JDBC sink (the Snowflake Spark connector is the same call
with ``format("snowflake")``); no pandas staging, executors stream
partitions directly.

Connection settings come from the caller -- never hardcoded (the
reference embeds credentials in source, `snowflake_connection.py:20-27`).
Import-gated: environments without a JDBC driver can still import the
package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    load_date: str,
    options: dict | None = None,
    mode: str = "append",
) -> None:
    """Typed warehouse load: adds the load_date column (replacing
    table-per-date) and writes via JDBC.  Use ``numPartitions`` in
    ``options`` to bound concurrent warehouse connections."""
    writer = (
        df.withColumn("load_date", F.lit(load_date))
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode(mode)
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()
