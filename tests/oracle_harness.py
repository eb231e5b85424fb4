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


def _dtype_class(dt) -> str:
    """Coarse dtype class for canonicalizer-parity checks."""
    import pandas.api.types as pt

    if pt.is_float_dtype(dt):
        # float32 vs float64 hash differently at the driver -- keep width.
        return str(dt)
    if pt.is_integer_dtype(dt):
        return "int"
    if pt.is_bool_dtype(dt):
        return "bool"
    if pt.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def canonicalizer_problems(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Emulate the DRIVER's pandas canonicalizer failure modes.

    The driver converts both results to pandas, sorts, and hashes values;
    three things r1 proved can break it even when fetchall-values match:
      - DuckDB HUGEINT (e.g. SUM(BIGINT)) -> pandas float64 vs Spark int64;
      - DuckDB FLOAT (float32) vs Spark double (float64);
      - array/map cells ('unhashable type: list' during sort).
    """
    problems: list[str] = []
    spdf = spark_df.toPandas()
    ddf = con.execute(sql).df()
    for col in sorted(set(spdf.columns) & set(ddf.columns)):
        sc, dc = _dtype_class(spdf[col].dtype), _dtype_class(ddf[col].dtype)
        if sc != dc and {sc, dc} != {"object"}:
            # datetime-vs-object (dates) is benign (values normalize);
            # int-vs-float or float-width skew is the driver hash killer.
            if {sc, dc} <= {"datetime", "object"}:
                continue
            problems.append(f"col {col}: pandas dtype class spark={sc} duck={dc}")
        for side, pdf in (("spark", spdf), ("duck", ddf)):
            if len(pdf) and pdf[col].dtype == object:
                v = pdf[col].iloc[0]
                try:
                    hash(v)
                except TypeError:
                    problems.append(f"col {col}: unhashable {type(v).__name__} cell ({side})")
    return problems


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
    if not problems:
        problems.extend(canonicalizer_problems(spark_df, con, sql))
    return problems
