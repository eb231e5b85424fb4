"""Named query plans exposed through ``__spark_entry__``.

Importing this package registers every query module; ``QUERIES`` /
``ORACLE`` are the registries the driver contract reads.

Registration ORDER is part of the driver contract: the driver verifies
exactly the first 50 registered queries, so queries that most need a fresh
CORRECTNESS entry must register first.  ``_PRIORITY`` front-loads (r4) (a)
the 12 queries that sat past position 50 in r2/r3 and have never had a
driver CORRECTNESS row, (b) queries whose plan changed this round
(un-forced SF-scaled broadcasts; dedup_clusters' new recursive oracle;
the zscore semi-join), and (c) the r1-only greens, stalest first, to
refresh their evidence.  Rows-only queries (no oracle -> weak driver row;
pytest covers them) and r3-green unchanged queries follow outside the
window in original order.
"""

from .registry import ORACLE, QUERIES, register

__all__ = ["QUERIES", "ORACLE", "register"]


def _load_all() -> None:
    """Import every query module (idempotent).  Import failures are LOUD:
    a silently-skipped module would shrink ``queries()`` with zero signal
    and the driver would just verify fewer queries."""
    for mod in (
        "relational",
        "joins",
        "windows",
        "scalars",
        "nested",
        "dedup",
        "similarity",
        "textstats",
        "eventtime",
        "multimodal",
        "extras",
        "analytics",
        "udfs",
        "subqueries",
        "maintenance",
        "coverage2",
        "tpch2",
        "tpch3",
        "product_analytics",
    ):
        try:
            __import__(f"{__name__}.{mod}")
        except Exception as exc:  # noqa: BLE001 -- re-raise with module context
            raise ImportError(f"query module {__name__}.{mod} failed to import: {exc}") from exc


# Names that must land inside the driver's verification window, in order.
# r5 NOTE: the ten tpch3 queries (q8/q9/q11/q13/q15/q16/q17/q18/q21/
# q22), skew_salted_event_counts, and docs_training_prep are new in r4
# and register past position 50 -- rotate them into the window next
# round (all pre-flighted green at sf0.001, sf0.01 AND sf0.1 with
# scripts/check_oracle.py).
_PRIORITY = [
    # (a) never had a driver CORRECTNESS row (past position 50 in r2/r3);
    # all 12 pre-flighted green with scripts/check_oracle.py at sf0.01
    # (embedding_neardup_lsh is rows-only by design).
    "text_tfidf_top_terms",
    "profile_orders_columns",
    "tpch_q4_late_shipments",
    "tpch_q12_priority_by_returnflag",
    "tpch_q14_promo_revenue_share",
    "tpch_q19_disjunctive_revenue",
    "funnel_view_click_purchase",
    "cohort_weekly_retention",
    "text_top_bigram_share",
    "text_pii_pattern_counts",
    "topn_orders_per_customer",
    "embedding_neardup_lsh",
    # (b) plan changed this round -> re-verify: dedup_clusters gained the
    # WITH RECURSIVE oracle (was rows-only); the TPC-H joins dropped
    # forced broadcasts of SF-scaled tables; zscore now semi-joins.
    "dedup_clusters",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "join_broadcast_region_revenue",
    "apply_in_pandas_zscore",
    # (c) r1-only greens, unchanged since r1 but last verified two rounds
    # ago -- refresh their evidence (fills the window to 50; the final
    # two scalar variants land just outside and stay r1-green).
    "courier_metrics",
    "pricing_summary",
    "project_normalize",
    "filter_isin_case",
    "fillna_defaults",
    "dim_ordered_key",
    "dim_hashed_key_unique",
    "dedup_first_order",
    "rollup_status_priority",
    "cube_status_priority",
    "topk_orders",
    "union_fold",
    "intersect_custkeys",
    "except_custkeys",
    "global_count",
    "tpch_q6_forecast_revenue",
    "join_semi_urgent_customers",
    "join_anti_no_finished",
    "join_range_ship_window",
    "window_latest_line_per_order",
    "window_rank_priorities",
    "window_days_between_orders",
    "window_ntile_spend_quartiles",
    "scalar_datetime",
    "scalar_strings",
    "scalar_json",
    "scalar_math",
    "scalar_conditionals",
    "array_stats_per_vec",
    "higherorder_array_ops",
    "dedup_exact_groups",
    "scalar_strings2",
    "scalar_datetime2",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    ordered = _PRIORITY + [n for n in QUERIES if n not in set(_PRIORITY)]
    for registry in (QUERIES, ORACLE):
        snapshot = dict(registry)
        registry.clear()
        registry.update({n: snapshot[n] for n in ordered if n in snapshot})


_load_all()
_reorder()
