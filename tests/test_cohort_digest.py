"""Cohort digest machinery (plans/cohort_digest.py, plans/cohorts.py).

The generic parity suite already runs every ``cohort_digest_*`` query
against its DuckDB twin; these tests cover the canonicalization edge
cases a healthy fixture never exercises (NULLs in every kind, negative
/ -0.0 doubles, NaN, huge magnitudes) and the standing coverage
invariant: every oracle-backed query is cohort-covered, so one driver
window slot per family re-verifies the whole registry each round.
"""

from __future__ import annotations

import duckdb
import pytest

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans import (
    ORACLE,
    QUERIES,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.cohort_digest import (
    duck_digest_sql,
    spark_digest,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.cohort_specs import (
    COHORTS,
    SKIPPED,
    SPECS,
)


def test_every_oracle_query_is_cohort_covered():
    """Standing invariant (rotation policy r11): an oracle-backed query
    must be a member of some cohort digest (or explicitly SKIPPED with a
    reason).  A new registration fails here until
    ``scripts/gen_cohort_specs.py --add <name>`` folds it in."""
    members = {m for ms in COHORTS.values() for m in ms}
    oracle_backed = {
        n for n in QUERIES if n in ORACLE and not n.startswith("cohort_digest_")
    }
    uncovered = oracle_backed - members - set(SKIPPED)
    assert not uncovered, f"not cohort-covered: {sorted(uncovered)}"
    # and every member still exists (cohorts.py raises at import too,
    # but this failure message names the stale spec directly)
    assert not members - oracle_backed, f"stale members: {sorted(members - oracle_backed)}"
    # members listed in a cohort must carry a spec
    assert not members - set(SPECS), f"members without specs: {sorted(members - set(SPECS))}"


def test_cohorts_are_window_pinned():
    """plans/__init__ must register every cohort digest before any
    non-digest query, so the ~8 digest slots are in the driver's
    50-query window every round."""
    names = list(QUERIES)
    n_digests = sum(1 for n in names if n.startswith("cohort_digest_"))
    # COHORTS digests + cohort_digest_approx (rows-only pins, r13 --
    # registered in plans/approx_cohort.py, outside COHORTS).
    assert n_digests == len(COHORTS) + 1
    assert all(n.startswith("cohort_digest_") for n in names[:n_digests])


def test_digest_edge_case_kinds(spark):
    """Spark and DuckDB digests agree on a synthetic frame exercising
    every kind with NULLs, negative and -0.0 doubles, NaN, magnitudes
    beyond the 1e6 fixed-point map's int64 range, empty strings, and
    epoch-boundary timestamps."""
    rows = [
        (1, "a", True, "2024-01-31", "2024-01-31 23:59:59.000001", 1.5),
        (-2, "", False, "1970-01-01", "1970-01-01 00:00:00.000000", -2.25),
        (None, None, None, None, None, None),
        (3, "\x1f|sep", True, "1992-06-02", "2000-02-29 12:00:00.500000", -0.0),
        (4, "nan", False, "2024-12-31", "2024-01-01 00:00:00.000000", float("nan")),
        (5, "big", True, "2024-01-01", "2024-01-01 00:00:01.000000", 1.0e13),
        (6, "neg", True, "2024-01-02", "2024-01-02 00:00:01.000000", -1.0e13),
    ]
    sdf = spark.createDataFrame(
        rows, "i long, s string, b boolean, d string, t string, x double"
    ).selectExpr(
        "i", "s", "b", "cast(d as date) as d", "cast(t as timestamp) as t", "x"
    )
    spec = [
        ("b", "bool"),
        ("d", "date"),
        ("i", "int"),
        ("s", "str"),
        ("t", "ts"),
        ("x", "double"),
    ]
    got = spark_digest("edge", sdf, spec).collect()[0]

    con = duckdb.connect()
    values = ", ".join(
        "("
        + ", ".join(
            [
                "NULL" if r[0] is None else str(r[0]),
                "NULL" if r[1] is None else f"'{r[1]}'",
                "NULL" if r[2] is None else str(r[2]).lower(),
                "NULL" if r[3] is None else f"DATE '{r[3]}'",
                "NULL" if r[4] is None else f"TIMESTAMP '{r[4]}'",
                "NULL"
                if r[5] is None
                else ("'NaN'::DOUBLE" if r[5] != r[5] else f"CAST({r[5]!r} AS DOUBLE)"),
            ]
        )
        + ")"
    for r in rows)
    member_sql = f"SELECT * FROM (VALUES {values}) AS v(i, s, b, d, t, x)"
    want = con.execute(duck_digest_sql("edge", member_sql, spec)).fetchone()
    assert (got["q"], got["n"], got["s"]) == tuple(want)


def test_digest_distinguishes_duplicate_rows(spark):
    """SUM-of-hashes (unlike XOR) must see the difference between a row
    appearing once and three times."""
    spec = [("v", "int")]
    one = spark.createDataFrame([(7,)], "v long")
    three = spark.createDataFrame([(7,), (7,), (7,)], "v long")
    d1 = spark_digest("d", one, spec).collect()[0]
    d3 = spark_digest("d", three, spec).collect()[0]
    assert d3["s"] == 3 * d1["s"] and d3["n"] == 3


def test_digest_empty_result(spark):
    spec = [("v", "int")]
    empty = spark.createDataFrame([], "v long")
    row = spark_digest("e", empty, spec).collect()[0]
    assert (row["n"], row["s"]) == (0, 0)


def test_null_vs_sentinel_string_distinct(spark):
    """A NULL string must not digest equal to the literal SOH sentinel's
    neighbor cases: NULL -> chr(1), empty string -> ''."""
    spec = [("s", "str")]
    a = spark.createDataFrame([(None,)], "s string")
    b = spark.createDataFrame([("",)], "s string")
    da = spark_digest("x", a, spec).collect()[0]
    db = spark_digest("x", b, spec).collect()[0]
    assert da["s"] != db["s"]


def test_control_chars_escaped_both_engines(spark):
    """r12 (r11 advice): a literal SOH string must NOT digest equal to
    NULL, an embedded US must not shift field boundaries, and the
    DuckDB twin must agree on the escaped forms."""
    import duckdb

    spec = [("a", "str"), ("b", "str")]
    null_row = spark.createDataFrame([(None, "x")], "a string, b string")
    soh_row = spark.createDataFrame([("\x01", "x")], "a string, b string")
    dn = spark_digest("x", null_row, spec).collect()[0]
    ds = spark_digest("x", soh_row, spec).collect()[0]
    assert dn["s"] != ds["s"]

    # ('y<US>', 'x') vs ('y', '<US>x'): without escaping both rows
    # canonicalize to 'y<US><US>x'.
    shift_a = spark.createDataFrame([("y\x1f", "x")], "a string, b string")
    shift_b = spark.createDataFrame([("y", "\x1fx")], "a string, b string")
    da = spark_digest("x", shift_a, spec).collect()[0]
    db = spark_digest("x", shift_b, spec).collect()[0]
    assert da["s"] != db["s"]

    # Cross-engine: the DuckDB twin digests the same tricky values to
    # the same (n, s).
    con = duckdb.connect()
    for sdf, (va, vb) in [
        (soh_row, ("chr(1)", "'x'")),
        (shift_a, ("'y' || chr(31)", "'x'")),
        (spark.createDataFrame([("\x02", "\x02\x02")], "a string, b string"),
         ("chr(2)", "chr(2) || chr(2)")),
    ]:
        got = spark_digest("x", sdf, spec).collect()[0]
        member_sql = f"SELECT {va} AS a, {vb} AS b"
        want = con.execute(duck_digest_sql("x", member_sql, spec)).fetchone()
        assert (got["q"], got["n"], got["s"]) == tuple(want)


@pytest.mark.parametrize("cname", sorted(COHORTS))
def test_cohort_sizes_bounded(cname):
    assert 1 <= len(COHORTS[cname]) <= 32
