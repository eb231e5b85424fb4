"""Generate + validate ``plans/approx_digest_pins.py`` (r13, judge item 6).

The 8 rows-only registry queries (blake2b LSH, float-plane ANN, KMeans
IVF, HLL approx, stub decode) cannot be replayed in DuckDB, so they get
no per-round value evidence — only row counts.  But every one of them is
DETERMINISTIC on fixed input (seeded hashes, seeded KMeans, commutative
HLL merges, digest-stub decode), so their results CAN be pinned: this
script digests each member's full result (the same (q, n, s) digest the
oracle-backed cohorts use, ``plans/cohort_digest.py``) at every test
scale and writes the values as literals.  ``cohort_digest_approx`` then
registers with an oracle that simply SELECTs the pinned rows keyed on
the scale's ``orders`` row count (distinct at every test scale; documents
collides: 500 rows at BOTH sf0.001 and sf0.01) — the driver's hash compare becomes
value-level drift detection for the rows-only family: any change to a
seeded hash family, banding geometry, tie-break, or stub constant flips
the digest and the round goes red.

The pin is a REGRESSION BASELINE, not an independent reimplementation —
stated plainly in the generated file and the query docstring.  To guard
against partitioning-sensitivity (float sum order, KMeans|| init
sampling), every digest is computed under BOTH the repo's tuned session
(local[32], 32 shuffle partitions) and a driver-style vanilla session
(200 shuffle partitions); a member whose digests disagree is SKIPPED
with the divergence recorded, because pinning it would manufacture
driver-round false alarms.

Usage: python scripts/gen_approx_digest.py
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

_KIND = {
    "bigint": "int",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "double": "double",
    "float": "double",
}


def _spec(df) -> list[tuple[str, str]] | None:
    spec = []
    for c, t in df.dtypes:
        if t.startswith("timestamp"):
            kind = "ts"
        elif t.startswith("decimal"):
            kind = "double"
        else:
            kind = _KIND.get(t)
        if kind is None:  # complex column -> member not pinnable
            return None
        spec.append((c, kind))
    return spec


def _run_all(build):
    """digests[(member, sf_dir)] = (n, s); also returns specs + doc counts."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans import (
        ORACLE,
        QUERIES,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.cohort_digest import (
        spark_digest,
    )

    spark = build()
    spark.sparkContext.setLogLevel("ERROR")
    members = sorted(n for n in QUERIES if n not in ORACLE)
    digests: dict[tuple[str, str], tuple[int, int]] = {}
    specs: dict[str, list[tuple[str, str]]] = {}
    doc_counts: dict[str, int] = {}
    skipped: dict[str, str] = {}
    for sf in SF_DIRS:
        doc_counts[sf] = spark.read.parquet(f"{sf}/orders.parquet").count()
        for m in members:
            if m in skipped:
                continue
            df = QUERIES[m](spark, sf)
            spec = specs.get(m) or _spec(df)
            if spec is None:
                skipped[m] = "complex column type"
                continue
            specs[m] = spec
            row = spark_digest(m, df, spec).collect()[0]
            digests[(m, sf)] = (row["n"], row["s"])
            print(f"  {m} @ {sf}: n={row['n']} s={row['s']}", flush=True)
    spark.stop()
    return digests, specs, doc_counts, skipped


def main() -> None:
    from pyspark.sql import SparkSession

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )

    print("pass 1: tuned session (local[32], 32 shuffle partitions)")
    d_tuned, specs, doc_counts, skipped = _run_all(
        lambda: build_session(app_name="gen_approx_digest")
    )

    print("pass 2: vanilla driver-style session (200 shuffle partitions)")
    d_vanilla, _, _, _ = _run_all(
        lambda: (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "200")
            .getOrCreate()
        )
    )

    members = sorted({m for m, _ in d_tuned})
    stable, divergent = [], {}
    for m in members:
        mismatches = [
            sf
            for sf in SF_DIRS
            if d_tuned.get((m, sf)) != d_vanilla.get((m, sf))
        ]
        if mismatches:
            divergent[m] = (
                f"digest differs between 32- and 200-partition sessions at "
                f"{mismatches} -- partitioning-sensitive, not pinnable"
            )
        else:
            stable.append(m)
    skipped.update(divergent)

    pins = {
        doc_counts[sf]: {m: list(d_tuned[(m, sf)]) for m in stable}
        for sf in SF_DIRS
    }
    out = os.path.join(
        REPO_ROOT,
        "modern_data_lakehouse_pipeline_for_logistics_analytics__spark",
        "plans",
        "approx_digest_pins.py",
    )
    with open(out, "w") as fh:
        fh.write(
            '"""GENERATED by scripts/gen_approx_digest.py -- do not hand-edit.\n'
            "\n"
            "Pinned (q, n, s) digests of the rows-only registry queries at the\n"
            "three test scales, keyed by the scale's orders row count (documents collides across scales).  Each\n"
            "pin reproduced bit-for-bit under BOTH a 32-partition tuned session\n"
            "and a 200-partition vanilla session at generation time (partition-\n"
            "order-sensitive members are SKIPPED, not pinned).  These are\n"
            "REGRESSION BASELINES of deterministic-but-not-SQL-expressible\n"
            "pipelines, not independent recomputations -- see\n"
            "plans/approx_cohort.py for what a red digest means.\n"
            '"""\n\n'
        )
        fh.write("SPECS_APPROX = {\n")
        for m in stable:
            fh.write(f"    {m!r}: {sorted(specs[m])!r},\n")
        fh.write("}\n\n")
        fh.write("PINS = {\n")
        for nd, rows in sorted(pins.items()):
            fh.write(f"    {nd}: {{\n")
            for m, ns in sorted(rows.items()):
                fh.write(f"        {m!r}: {tuple(ns)!r},\n")
            fh.write("    },\n")
        fh.write("}\n\n")
        fh.write(f"SKIPPED = {skipped!r}\n")
    print(f"wrote {out}: {len(stable)} pinned, skipped: {skipped or 'none'}")


if __name__ == "__main__":
    main()
