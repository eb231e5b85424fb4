"""Named query plans exposed through ``__spark_entry__``.

Importing this package registers every query module; ``QUERIES`` /
``ORACLE`` are the registries the driver contract reads.

Registration ORDER is part of the driver contract: the r1 driver verified
exactly the first 50 registered queries, so queries that most need a fresh
CORRECTNESS entry must register first.  ``_PRIORITY`` front-loads (a) the
31 queries the r1 driver never reached, (b) the r1 hash-FAIL /
canonicalizer-crash queries fixed this round, (c) queries whose underlying
operator implementation changed this round, and (d) queries newly added
this round.  Everything else (all driver-green in r1) follows in original
order.
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
        "product_analytics",
    ):
        try:
            __import__(f"{__name__}.{mod}")
        except Exception as exc:  # noqa: BLE001 -- re-raise with module context
            raise ImportError(f"query module {__name__}.{mod} failed to import: {exc}") from exc


# Names that must land inside the driver's verification window, in order.
_PRIORITY = [
    # (a) registered after position 50 in r1 -> no CORRECTNESS entry yet
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_quality_scores",
    "text_langid_votes",
    "text_token_counts",
    "text_fingerprints",
    "tumbling_hourly_counts",
    "sliding_2h_hop_1h",
    "session_windows_30m",
    "daily_incremental_counts",
    "multimodal_decode_stub",
    "join_full_outer_order_counts",
    "join_cross_status_region",
    "explode_outer_with_empties",
    "scalar_try_cast",
    "sql_grouping_sets",
    "union_by_name_mismatched",
    "window_range_7day_spend",
    "pivot_status_by_priority",
    "agg_minby_maxby",
    "agg_median_stddev",
    "pandas_udf_scalar_log1p",
    "pandas_udf_grouped_weighted_mean",
    "apply_in_pandas_zscore",
    "sql_exists_correlated",
    "sql_scalar_correlated",
    "sql_in_subquery",
    "merge_upsert_orders",
    "scd2_user_event_type",
    "agg_corr_stats",
    # (b) r1 hash-FAILs / canonicalizer crashes, fixed this round
    "tpch_q7_volume_shipping",
    "window_rolling_sum_spend",
    "window_running_sum_spend",
    "explode_embedding_positions",
    "scalar_map_json",
    "array_agg_statuses",
    # (c) operator implementation changed this round -> re-verify
    "asof_prev_error_per_event",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "embedding_neardup_pairs",
    # (d) new this round -- oracle-backed first (a driver value-hash row
    # is worth more than a rows-only row; entries past position 50 wait
    # for the next round's window)
    "unpivot_lineitem_measures",
    "string_agg_names_per_segment",
    "histogram_price_buckets",
    "regexp_extract_all_digits",
    "window_first_last_nth",
    "percentile_disc_prices",
    "bitwise_line_flags",
    "sample_deterministic_split",
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
