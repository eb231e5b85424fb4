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

# Spark SQL type -> ANSI DDL type for the DB-API load path.
_DDL_TYPES = {
    "string": "VARCHAR",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
}


#: Keys the writer derives from its positional arguments; a caller's
#: ``options`` dict silently overriding one of these would redirect the
#: load (wrong url/table/mode) with no error.
_RESERVED_JDBC_KEYS = frozenset({"format", "mode", "url", "dbtable", "load_date"})


def jdbc_plan(
    url: str, table: str, load_date: str, options: dict | None = None, mode: str = "append"
) -> dict:
    """The fully-resolved JDBC writer configuration as plain data -- the
    unit tests assert against this, keeping the untestable part of
    ``write_jdbc`` (the driverful ``save()``) one line.  Reserved keys in
    ``options`` are rejected loudly instead of clobbering the positional
    arguments."""
    clash = _RESERVED_JDBC_KEYS & set(options or {})
    if clash:
        raise ValueError(
            f"options may not override reserved JDBC keys {sorted(clash)}; "
            "pass url/table/mode as positional arguments"
        )
    plan = {"format": "jdbc", "mode": mode, "url": url, "dbtable": table,
            "load_date": load_date}
    plan.update(options or {})
    return plan


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
    plan = jdbc_plan(url, table, load_date, options, mode)
    writer = (
        df.withColumn("load_date", F.lit(plan["load_date"]))
        .write.format(plan["format"])
        .option("url", plan["url"])
        .option("dbtable", plan["dbtable"])
        .mode(plan["mode"])
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


def warehouse_ddl(df: DataFrame, table: str) -> str:
    """CREATE TABLE DDL preserving Spark types (the reference's loader
    erases every column to STRING, `snowflake_connection.py:97-99`)."""
    cols = []
    for f in df.schema.fields:
        t = _DDL_TYPES.get(f.dataType.simpleString())
        if t is None:
            raise ValueError(f"no warehouse DDL mapping for {f.name}: {f.dataType.simpleString()}")
        cols.append(f'"{f.name}" {t}')
    return f'CREATE TABLE IF NOT EXISTS "{table}" ({", ".join(cols)})'


def write_warehouse_dbapi(
    df: DataFrame,
    connection,
    table: str,
    load_date: str,
    batch_size: int = 10_000,
) -> int:
    """Executable warehouse load over any DB-API connection (sqlite3,
    duckdb, ...): typed CREATE TABLE + batched executemany inserts.

    This is the driver-side egress edge (SURVEY section 7.4(5) allows
    collect only at ML/serving/egress boundaries): gold tables are
    dim-sized aggregates by construction.  Rows stream through
    ``toLocalIterator`` in bounded batches, so the driver holds one batch
    at a time, never the table.  Returns rows loaded.  For fact-scale
    egress use ``write_jdbc`` (executors stream partitions directly).
    """
    staged = df.withColumn("load_date", F.lit(load_date))
    connection.execute(warehouse_ddl(staged, table))
    placeholders = ", ".join(["?"] * len(staged.columns))
    sql = f'INSERT INTO "{table}" VALUES ({placeholders})'
    n, batch = 0, []
    for row in staged.toLocalIterator():
        batch.append(tuple(row))
        if len(batch) >= batch_size:
            connection.executemany(sql, batch)
            n += len(batch)
            batch = []
    if batch:
        connection.executemany(sql, batch)
        n += len(batch)
    if hasattr(connection, "commit"):
        connection.commit()
    return n
