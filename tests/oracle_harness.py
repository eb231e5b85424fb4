"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
tables and compares row count, column names, and order-insensitive values
EXACTLY -- floats included.  The driver's gate is an exact value-hash, so
any ulp of float divergence the r1 harness tolerated (rel_tol 1e-9) was a
silent driver hash-FAIL; exact local comparison is the only faithful
predictor.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = (
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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), round(x, 6) if isinstance(x, float) else str(x))
        for x in row
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(_norm(v) for v in r) for r in spark_df.collect()]

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(_norm(v) for v in r) for r in res.fetchall()]

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    # Align column order by sorted name (the driver sorts columns by name).
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_sorted = sorted(([r[i] for i in s_idx] for r in spark_rows), key=_sort_key)
    d_sorted = sorted(([r[i] for i in d_idx] for r in duck_rows), key=_sort_key)

    for n, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, (sv, dv) in zip(sorted(spark_cols), zip(sr, dr)):
            if sv != dv:
                problems.append(f"row {n} col {c}: {sv!r} != {dv!r}")
        if len(problems) > 8:
            problems.append("... (truncated)")
            break
    return problems
