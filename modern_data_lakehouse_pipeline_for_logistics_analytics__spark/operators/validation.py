"""Declarative data-quality rules evaluated in ONE aggregate pass
(expectations-style validation without a second scan per rule).

A rule is ``(name, boolean Column)`` where the column is TRUE when the
row VIOLATES the rule.  All rules fold into a single ``agg`` of
conditional sums -- at 100 TB, N rules cost one read, not N; this is the
batch-audit complement of ``pipelines.silver.with_quality_observation``
(which piggybacks the same counters on a write job).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class RuleViolations(Exception):
    """Raised by :func:`expect_or_fail`; carries the per-rule counts."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        failed = {k: v for k, v in counts.items() if v}
        super().__init__(f"data-quality rules violated: {failed}")


def rule_violation_counts(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """One row per rule: ``rule, n_violations, n_rows`` -- a single
    HashAggregate over one scan regardless of rule count.  Violation
    predicates are null-safe (NULL predicate counts as a violation: an
    unevaluable rule must not silently pass)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n_rows")] + [
        F.sum(F.coalesce(cond.cast("long"), F.lit(1))).cast("long").alias(f"__v_{name}")
        for name, cond in rules.items()
    ]
    wide = df.agg(*aggs)
    stacked = ", ".join(f"'{name}', __v_{name}" for name in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stacked}) AS (rule, n_violations)", "__n_rows AS n_rows"
    )


def expect_or_fail(df: DataFrame, rules: dict[str, Column]) -> dict[str, int]:
    """Evaluate the rules; raise :class:`RuleViolations` if ANY rule has
    violations, else return the (all-zero) counts dict.  The gate a
    pipeline puts between landing and publishing."""
    counts = {
        r["rule"]: r["n_violations"] for r in rule_violation_counts(df, rules).collect()
    }
    if any(counts.values()):
        raise RuleViolations(counts)
    return counts
