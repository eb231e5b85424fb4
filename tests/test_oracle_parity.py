"""Oracle-differential tests (SURVEY.md section 5, strategy item 1).

Every registered query with an oracle is executed on Spark AND DuckDB over
the sf0.001 fixture and compared exactly (the driver does the same at
sf0.01). Queries without an oracle are smoke-run (>=0 rows, stable schema).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_connection

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    # A 0-row result matches a 0-row oracle trivially (caught live: a
    # mis-aimed date window made tpch_q4 a vacuous pass) -- every
    # registered oracle query must produce rows at every fixture scale.
    assert df.count() > 0, f"{name}: vacuous (0 rows) at {sf_dir}"
    problems = compare(df, duck, ORACLE[name])
    assert not problems, f"{name}: " + "; ".join(problems[:10])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_smoke(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    assert df.count() > 0, f"{name}: vacuous (0 rows) at {sf_dir}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
