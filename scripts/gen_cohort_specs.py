"""Generate + validate ``plans/cohort_specs.py`` (cohort digest membership).

For every oracle-backed registry query this script:

1. reads the DuckDB result schema (``DESCRIBE (<oracle sql>)``) and the
   Spark result schema (``df.dtypes``) at sf0.001,
2. unifies each column to a digest kind (see ``plans/cohort_digest.py`` --
   the driver compares Python *values*, so e.g. Spark DECIMAL vs DuckDB
   DOUBLE both canonicalize through DOUBLE),
3. VALIDATES the digest end-to-end: runs ``spark_digest`` and
   ``duck_digest_sql`` for the member and compares (q, n, s) exactly --
   any member whose digest does not reproduce bit-for-bit is excluded
   (it stays in the normal stalest-first rotation),
4. groups the validated members by registering plans module and
   bin-packs modules into cohorts of <= MAX_COHORT members,
5. writes ``plans/cohort_specs.py`` (SPECS, COHORTS, SKIPPED).

Rerun whenever a member's result schema changes or queries are
added/renamed; ``plans/cohorts.py`` raises at import if a spec'd member
disappears from the registry, which is the signal to rerun this.

Usage: python scripts/gen_cohort_specs.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

MAX_COHORT = 32

_INT_S = {"bigint", "int", "smallint", "tinyint"}
_INT_D = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT", "HUGEINT"}
_FLT_S = {"double", "float"}
_FLT_D = {"DOUBLE", "FLOAT", "REAL"}


def unify(spark_t: str, duck_t: str) -> str | None:
    duck_base = duck_t.split("(")[0].strip().upper()
    s_int = spark_t in _INT_S
    s_flt = spark_t in _FLT_S or spark_t.startswith("decimal")
    d_int = duck_base in _INT_D
    d_flt = duck_base in _FLT_D or duck_base == "DECIMAL"
    if spark_t == "string" and duck_base == "VARCHAR":
        return "str"
    if spark_t == "boolean" and duck_base == "BOOLEAN":
        return "bool"
    if spark_t == "date" and duck_base == "DATE":
        return "date"
    if spark_t.startswith("timestamp") and duck_base.startswith("TIMESTAMP"):
        return "ts"
    if s_int and d_int:
        return "int"
    if (s_int or s_flt) and (d_int or d_flt):
        return "double"
    return None


def main() -> None:
    import duckdb

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans import (
        ORACLE,
        QUERIES,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.cohort_digest import (
        duck_digest_sql,
        spark_digest,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        release_caches,
    )

    sf_dir = "/root/testdata/sf0.001"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]

    spark = build_session(app_name="gen-cohort-specs")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    specs: dict[str, list[tuple[str, str]]] = {}
    skipped: dict[str, str] = {}
    module_of: dict[str, str] = {}

    names = [n for n in QUERIES if n in ORACLE and not n.startswith("cohort_digest_")]
    for i, name in enumerate(sorted(names)):
        try:
            duck_schema = {
                r[0]: r[1] for r in con.execute(f"DESCRIBE ({ORACLE[name]})").fetchall()
            }
            df = QUERIES[name](spark, sf_dir)
            spark_schema = dict(df.dtypes)
        except Exception as exc:  # noqa: BLE001
            skipped[name] = f"schema error: {type(exc).__name__}: {exc}"[:200]
            print(f"[{i+1}/{len(names)}] {name:42s} SKIP {skipped[name]}", flush=True)
            continue
        if sorted(duck_schema) != sorted(spark_schema):
            skipped[name] = f"column mismatch {sorted(spark_schema)} vs {sorted(duck_schema)}"
            print(f"[{i+1}/{len(names)}] {name:42s} SKIP {skipped[name]}", flush=True)
            continue
        spec: list[tuple[str, str]] = []
        bad = None
        for col in sorted(spark_schema):
            kind = unify(spark_schema[col], duck_schema[col])
            if kind is None:
                bad = f"unsupported type pair {col}: {spark_schema[col]} / {duck_schema[col]}"
                break
            spec.append((col, kind))
        if bad:
            skipped[name] = bad
            print(f"[{i+1}/{len(names)}] {name:42s} SKIP {bad}", flush=True)
            continue
        # end-to-end validation at sf0.001
        try:
            s_row = spark_digest(name, df, spec).collect()[0]
            d_row = con.execute(duck_digest_sql(name, ORACLE[name], spec)).fetchone()
        except Exception as exc:  # noqa: BLE001
            skipped[name] = f"digest error: {type(exc).__name__}: {exc}"[:200]
            print(f"[{i+1}/{len(names)}] {name:42s} SKIP {skipped[name]}", flush=True)
            release_caches()
            continue
        release_caches()
        if (s_row["q"], s_row["n"], s_row["s"]) != (d_row[0], d_row[1], d_row[2]):
            skipped[name] = f"digest mismatch spark={tuple(s_row)} duck={d_row}"
            print(f"[{i+1}/{len(names)}] {name:42s} SKIP {skipped[name]}", flush=True)
            continue
        specs[name] = spec
        module_of[name] = QUERIES[name].__module__.rsplit(".", 1)[-1]
        print(f"[{i+1}/{len(names)}] {name:42s} OK n={s_row['n']} s={s_row['s']}", flush=True)

    # group by module, bin-pack modules (largest first) into cohorts
    by_mod: dict[str, list[str]] = defaultdict(list)
    for n, m in module_of.items():
        by_mod[m].append(n)
    cohorts: dict[str, list[str]] = {}
    bins: list[tuple[list[str], list[str]]] = []  # (module labels, members)
    for mod in sorted(by_mod, key=lambda m: -len(by_mod[m])):
        members = sorted(by_mod[mod])
        while len(members) > MAX_COHORT:  # split oversized modules
            bins.append(([mod], members[:MAX_COHORT]))
            members = members[MAX_COHORT:]
        placed = False
        for labels, existing in bins:
            if len(existing) + len(members) <= MAX_COHORT:
                existing.extend(members)
                labels.append(mod)
                placed = True
                break
        if not placed:
            bins.append(([mod], members))
    for labels, members in bins:
        cohorts[f"cohort_digest_{labels[0]}"] = sorted(members)
    # disambiguate duplicate names from split modules
    seen: dict[str, int] = {}
    final: dict[str, list[str]] = {}
    for cname in sorted(cohorts):
        k = seen.get(cname, 0)
        seen[cname] = k + 1
        final[f"{cname}_{k+1}" if k else cname] = cohorts[cname]
    # a split module's first bin also needs the suffix applied retroactively
    renamed: dict[str, list[str]] = {}
    for cname, members in final.items():
        base = cname.rsplit("_", 1)[0] if cname.rsplit("_", 1)[-1].isdigit() else cname
        if seen.get(base, 0) > 1 and cname == base:
            renamed[f"{base}_1"] = members
        else:
            renamed[cname] = members

    out = os.path.join(
        REPO_ROOT,
        "modern_data_lakehouse_pipeline_for_logistics_analytics__spark",
        "plans",
        "cohort_specs.py",
    )
    with open(out, "w") as fh:
        fh.write(
            '"""GENERATED by scripts/gen_cohort_specs.py -- do not hand-edit.\n\n'
            f"Validated at {sf_dir}: every SPECS entry reproduced its digest\n"
            "bit-for-bit on Spark AND DuckDB at generation time.  SKIPPED\n"
            'records members excluded from cohort coverage and why.\n"""\n\n'
        )
        fh.write("SPECS = {\n")
        for n in sorted(specs):
            fh.write(f"    {n!r}: {specs[n]!r},\n")
        fh.write("}\n\nCOHORTS = {\n")
        for c in sorted(renamed):
            fh.write(f"    {c!r}: {renamed[c]!r},\n")
        fh.write("}\n\nSKIPPED = {\n")
        for n in sorted(skipped):
            fh.write(f"    {n!r}: {skipped[n]!r},\n")
        fh.write("}\n")
    print(f"\nwrote {out}: {len(specs)} members in {len(renamed)} cohorts, {len(skipped)} skipped")
    spark.stop()


if __name__ == "__main__":
    main()
