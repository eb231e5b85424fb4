"""Local replica of the driver's correctness gate: run each named query
through Spark AND its DuckDB oracle at $SPARK_GRAFT_SF_DIR (default
sf0.01), then compare row count, sorted column names, and exact values
(columns sorted by name, rows sorted by all values -- the driver hashes
the same canonical form, so an exact mismatch here is a hash-FAIL there).

Usage: python scripts/check_oracle.py [query ...]   (no args = every
oracle-backed query)
"""

from __future__ import annotations

import math
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = 0.0 if v == 0 else (v if not math.isnan(v) else "NaN")
            vals.append(v)
        canon.append(tuple(vals))
    return sorted(canon, key=lambda r: [(x is None, str(x)) for x in r])


def main() -> None:
    import duckdb

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or [n for n in queries if n in oracles]

    spark = build_session(app_name="check-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_fail = 0
    for name in names:
        if name not in queries:
            print(f"{name:42s} NOT REGISTERED")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"{name:42s} rows-only (no oracle)")
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:42s} ERROR {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        rows_ok = len(s_rows) == len(o_rows)
        schema_ok = sorted(s_cols) == sorted(o_cols)
        vals_ok = False
        if rows_ok and schema_ok:
            vals_ok = _canon(s_rows, s_cols) == _canon(o_rows, o_cols)
        status = "PASS" if (rows_ok and schema_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            n_fail += 1
            detail = f" rows={len(s_rows)}/{len(o_rows)} cols={sorted(s_cols)}/{sorted(o_cols)}"
            if rows_ok and schema_ok:
                sc, oc = _canon(s_rows, s_cols), _canon(o_rows, o_cols)
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                detail = f" first value diffs: {diff}"
        else:
            detail = f" ({len(s_rows)} rows)"
        print(f"{name:42s} {status}{detail}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
