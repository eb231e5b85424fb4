"""One-pass validation rules: counts are exact, NULL predicates count as
violations (never silently pass), the fail-fast gate raises with the
counts attached, and the whole rule set costs one aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.validation import (
    RuleViolations,
    expect_or_fail,
    rule_violation_counts,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "F"), (3, None, "X"), (4, 3.0, None)],
        "k long, price double, status string",
    )


def _rules():
    # Built lazily: Column expressions need an active SparkContext, which
    # doesn't exist at module-collection time.
    return {
        "price_positive": F.col("price").isNull() | (F.col("price") <= 0),
        "status_domain": ~F.col("status").isin("O", "F") | F.col("status").isNull(),
    }


def test_counts_exact_and_null_safe(spark):
    got = {
        r.rule: (r.n_violations, r.n_rows)
        for r in rule_violation_counts(_df(spark), _rules()).collect()
    }
    # price: NULL (k=3) and -5 (k=2) violate; status: 'X' (k=3) and NULL
    # (k=4) violate -- the NULL status makes ~isin(...) NULL, which must
    # count as a violation, not silently pass.
    assert got == {"price_positive": (2, 4), "status_domain": (2, 4)}


def test_single_aggregate_pass(spark):
    """N rules must not become N scans: exactly one scan and one final
    aggregate in the physical plan."""
    plan = (
        rule_violation_counts(_df(spark), _rules())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ") + plan.count("FileScan") <= 1 or "LocalTableScan" in plan
    assert "Exchange hashpartitioning" not in plan  # global agg: single exchange only


def test_expect_or_fail_gate(spark):
    with pytest.raises(RuleViolations) as exc:
        expect_or_fail(_df(spark), _rules())
    assert exc.value.counts == {"price_positive": 2, "status_domain": 2}

    clean = _df(spark).filter(F.col("k") == 1)
    assert expect_or_fail(clean, _rules()) == {"price_positive": 0, "status_domain": 0}
