"""Physical-plan regression tests: the PLANS.md claims as assertions.

These pin the plan SHAPES that make queries scale -- broadcast joins on
dims, top-k as TakeOrderedAndProject, predicate pushdown reaching the
parquet scans, the distributed-NTILE partitioning, single-shuffle GEMM
tiling -- so a future edit that silently regresses one (e.g. a dim stops
broadcasting and the fact table starts shuffling) fails a test, not a
benchmark round."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString() + "\n" + (
        df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    )


def test_topk_is_take_ordered(spark, sf_dir):
    p = _plan(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in p, "top-k lost its TakeOrderedAndProject plan"


def test_tpch_q3_broadcasts_dims(spark, sf_dir):
    """No forced hint on the SF-scaled customer side anymore -- at this SF
    the size-statistics planner must still choose broadcast on its own
    (proving the un-hinted plan is unchanged locally while AQE keeps the
    sf100 fallback to SMJ available)."""
    p = _plan(spark, sf_dir, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in p, "q3 dims no longer broadcast"
    assert "SortMergeJoin" not in p, "q3 fact side is shuffling for enrichment"


#: Queries whose joins mix bounded dims (nation 25 / region 5 rows) with
#: SF-scaled tables (customer, supplier, part) -- the r3 VERDICT's
#: weak-at-100x list plus the tpch2 part joins.
_HINT_AUDIT_QUERIES = [
    "join_broadcast_region_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue_share",
    "tpch_q19_disjunctive_revenue",
    # r6: the partsupp-family adaptations hint only nation/region too.
    "tpch_q2_min_cost_supplier",
    "tpch_q20_promotion_suppliers",
]

#: Columns that prove a hinted relation is one of the bounded dims.
_BOUNDED_MARKERS = ("n_nationkey", "r_regionkey")


@pytest.mark.parametrize("name", _HINT_AUDIT_QUERIES)
def test_no_forced_broadcast_of_unbounded_tables(spark, sf_dir, name):
    """An explicit broadcast hint overrides autoBroadcastJoinThreshold AND
    AQE's runtime size check, so a hint on an SF-scaled table (customer /
    supplier / part) turns into an executor OOM at sf100 instead of a
    graceful SMJ.  Every ResolvedHint subtree in the analyzed plan must
    therefore bottom out in a BOUNDED dim (nation/region only)."""
    df = QUERIES[name](spark, sf_dir)
    lines = df._jdf.queryExecution().analyzed().toString().splitlines()
    hinted_relations = []
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln:
            continue
        for nxt in lines[i + 1:]:
            if "Relation" in nxt and "parquet" in nxt:
                hinted_relations.append(nxt)
                break
    for rel in hinted_relations:
        assert any(m in rel for m in _BOUNDED_MARKERS), (
            f"{name}: forced broadcast of an SF-scaled table: {rel.strip()}"
        )


def test_tpch_q6_pushes_all_predicates(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q6_forecast_revenue")
    assert "PushedFilters:" in p
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in p.split("PushedFilters:", 1)[1], f"{frag} not pushed to scan"


def test_tpch_q19_disjunction_pushed_both_sides(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q19_disjunctive_revenue")
    pushed = [seg.split("]", 1)[0] for seg in p.split("PushedFilters: [")[1:]]
    assert any("l_quantity" in s and "Or(" in s for s in pushed), "lineitem OR not pushed"
    assert any("p_brand" in s and "Or(" in s for s in pushed), "part OR not pushed"


def test_tpch_q4_is_semi_join(spark, sf_dir):
    p = _plan(spark, sf_dir, "tpch_q4_late_shipments")
    assert "LeftSemi" in p, "EXISTS no longer plans as a semi join"


def test_ntile_never_single_partition_window(spark, sf_dir):
    p = _plan(spark, sf_dir, "window_ntile_spend_quartiles")
    assert "windowspecdefinition(__pid" in p, "global NTILE lost its __pid partitioning"
    assert "hashpartitioning(__pid" in p


def test_neardup_single_shuffle_gemm(spark, sf_dir):
    p = _plan(spark, sf_dir, "embedding_neardup_pairs")
    assert "FlatMapGroupsInPandas" in p, "blocked GEMM stage missing"
    assert p.count("Exchange hashpartitioning") == 1, (
        "block-pair GEMM should shuffle exactly once"
    )


def test_courier_metrics_partial_aggregation(spark, sf_dir):
    p = _plan(spark, sf_dir, "courier_metrics")
    assert "HashAggregate" in p
    assert "SortAggregate" not in p


@pytest.mark.parametrize(
    "name", ["project_normalize", "filter_isin_case", "histogram_price_buckets"]
)
def test_narrow_queries_read_pruned_schema(spark, sf_dir, name):
    """Column pruning reaches the scan: ReadSchema must not contain every
    table column (these queries project a strict subset)."""
    p = _plan(spark, sf_dir, name)
    read = p.split("ReadSchema:", 1)[1].splitlines()[0]
    assert len(read.split(",")) <= 6, f"scan reads too many columns: {read}"


def test_topn_per_group_uses_window_group_limit(spark, sf_dir):
    """rank<=N filter must rewrite to WindowGroupLimit (partial stage
    keeps N rows per key BEFORE the shuffle -- at scale this is the
    difference between shuffling 3 rows/key and the whole fact table)."""
    p = _plan(spark, sf_dir, "topn_orders_per_customer")
    assert "WindowGroupLimit" in p
    assert "Partial" in p.split("WindowGroupLimit", 2)[-1] or p.count("WindowGroupLimit") >= 2


def test_tpch_q18_topk_and_semi(spark, sf_dir):
    """The IN-over-HAVING subquery must plan as a semi join against the
    aggregated order keys, and top-100 as TakeOrderedAndProject (never a
    global sort)."""
    p = _plan(spark, sf_dir, "tpch_q18_large_volume_customers")
    assert "TakeOrderedAndProject" in p
    assert "LeftSemi" in p


def test_tpch_q21_single_scan_aggregate(spark, sf_dir):
    """r7 single-scan shape: both EXISTS/NOT EXISTS quantifiers collapse
    into per-order counts, so lineitem must be scanned exactly ONCE (the
    r6 semi+anti chain read it three times) and no self-join of any kind
    remains -- the only join is lineitem-to-filtered-orders."""
    p = _plan(spark, sf_dir, "tpch_q21_waiting_suppliers")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # ONE lineitem scan: count scans whose ReadSchema mentions l_suppkey.
    scans = [
        seg
        for seg in p.split("FileScan parquet")[1:]
        if "l_suppkey" in seg.split("ReadSchema", 1)[-1][:400]
    ]
    assert len(scans) == 1, f"lineitem scanned {len(scans)} times"
    # the two-level aggregate must partial-aggregate before each shuffle
    assert "partial" in p.lower()


def test_tpch_q16_not_in_is_anti_join(spark, sf_dir):
    """NOT IN over the non-null s_suppkey column must plan as a left-anti
    join (not a null-aware nested loop)."""
    p = _plan(spark, sf_dir, "tpch_q16_supplier_cnt")
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p


def test_tpch_q2_min_join_no_cartesian(spark, sf_dir):
    """Q2's decorrelated per-part MIN must come back as an equi join on
    (partkey, cost) -- a nested-loop/cartesian re-join of the min table
    is quadratic in suppliers-per-part at scale.  The region restriction
    must reach suppliers as a semi join or broadcast equi join."""
    p = _plan(spark, sf_dir, "tpch_q2_min_cost_supplier")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "TakeOrderedAndProject" in p  # top-100, never a global sort


def test_tpch_q20_threshold_semi_chain(spark, sf_dir):
    """Q20's quantity-threshold chain must stay semi joins end-to-end
    (part filter -> pair aggregate -> supplier): a regular inner join
    would duplicate suppliers per qualifying pair and break the
    one-row-per-supplier output, and lineitem must be scanned ONCE (the
    two conditional sums share a single aggregate)."""
    p = _plan(spark, sf_dir, "tpch_q20_promotion_suppliers")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p
    # ONE lineitem scan: count scans whose ReadSchema mentions l_quantity.
    # _plan concatenates the simple executedPlan dump AND the formatted
    # dump; only the simple dump renders "FileScan parquet ... ReadSchema"
    # inline, so the count below sees each physical scan exactly once.
    scans = [seg for seg in p.split("FileScan parquet")[1:] if "l_quantity" in seg.split("ReadSchema", 1)[-1][:400]]
    assert len(scans) == 1, f"lineitem scanned {len(scans)} times"


def test_trainprep_narrow_ops_zero_shuffles(spark, sf_dir):
    """chunk_documents and quality_gates are per-row expressions: the
    plan must contain NO Exchange of any kind -- they pipeline straight
    into the scan, which is what lets them run at corpus scale for the
    cost of the read alone."""
    for name in ("train_chunk_documents", "train_quality_gates"):
        p = _plan(spark, sf_dir, name)
        assert "Exchange" not in p, f"{name} grew a shuffle"
        assert p.count("FileScan parquet") == 1


def test_trainprep_pack_no_single_partition_window(spark, sf_dir):
    """pack_sequences' global prefix sum must NOT plan as a
    SinglePartition window (the one-task wall the two-phase scheme
    exists to avoid): the only exchanges are the per-partition hash
    window and the broadcast of the base offsets."""
    for name in ("train_pack_sequences", "train_token_budget_sample"):
        p = _plan(spark, sf_dir, name)
        assert "Exchange SinglePartition" not in p, f"{name} collapsed to one task"
        assert "BroadcastExchange" in p  # base offsets ride a broadcast


def test_trainprep_span_dedup_single_scan(spark, sf_dir):
    """span_dedup reads the corpus ONCE (the r7 totals-branch fold);
    a second text scan would double the dominant cost at scale."""
    p = _plan(spark, sf_dir, "train_span_dedup")
    scans = [seg for seg in p.split("FileScan parquet")[1:] if "text" in seg.split("ReadSchema", 1)[-1][:400]]
    assert len(scans) == 1, f"documents text scanned {len(scans)} times"


def test_trainprep_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark n-gram set must broadcast (eval sets are tiny; the
    corpus side must never shuffle its text for this join)."""
    p = _plan(spark, sf_dir, "train_decontaminate_ngrams")
    assert "BroadcastExchange" in p
    assert "LeftSemi" in p  # hits counted via semi join, no row duplication


# ---------------------------------------------------------------- coverage3
def _node_depth(line: str) -> int:
    """Depth of a physical-plan tree line = offset where the node name
    starts, after the ``:  +- `` scaffolding and the ``*(n)`` codegen
    marker."""
    import re

    m = re.match(r"^[\s:+-]*(\*\(\d+\)\s)?", line)
    return m.end()


def _join_subtree(plan_tree: str, join_marker: str = "BroadcastHashJoin") -> list[str]:
    """Lines strictly inside the first ``join_marker`` node's subtree
    (contiguous deeper-indented lines below it); [] if the join is absent."""
    lines = [l for l in plan_tree.splitlines() if l.strip()]
    ji = next((i for i, l in enumerate(lines) if join_marker in l), None)
    if ji is None:
        return []
    jdepth = _node_depth(lines[ji])
    subtree = []
    for line in lines[ji + 1 :]:
        if _node_depth(line) <= jdepth:
            break
        subtree.append(line)
    return subtree


def test_bloom_probe_filters_before_join(spark, sf_dir):
    """The bloom arithmetic must evaluate ON THE SCAN side, upstream of the
    membership join -- i.e. inside the BroadcastHashJoin's SUBTREE, in a
    node that sits above the probe FileScan.  The r7 assertion compared
    flat string positions, which passes whenever element_at appears
    anywhere after the join text (ADVICE: nearly vacuous); this walks the
    indentation tree instead.

    Two shapes are pinned:
    1. ``bloom_prune_join`` (the pruning operator): a Filter node carrying
       element_at strictly between the join and the probe scan.
    2. ``bloom_prune_orders`` (the registered audit query, which must NOT
       filter -- false positives are counted): the element_at arithmetic
       still evaluates below the join, scan-side.
    """
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.bloom import (
        bloom_prune_join,
    )
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_acctbal") > 9000
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pruned = bloom_prune_join(orders, cust, "o_custkey", "c_custkey")
    ptree = pruned._jdf.queryExecution().executedPlan().toString()
    sub = _join_subtree(ptree)
    assert sub, "bloom_prune_join membership join stopped broadcasting"
    filt_i = next(
        (i for i, l in enumerate(sub) if "Filter" in l and "element_at" in l), None
    )
    assert filt_i is not None, (
        "bloom element_at Filter is not a descendant of the BroadcastHashJoin"
    )
    fdepth = _node_depth(sub[filt_i])
    assert any(
        "FileScan" in l and _node_depth(l) > fdepth for l in sub[filt_i + 1 :]
    ), "no probe FileScan beneath the bloom Filter"
    assert "SortMergeJoin" not in ptree

    p = _plan(spark, sf_dir, "bloom_prune_orders")
    tree = p.split("== Physical Plan ==")[0]
    audit_sub = _join_subtree(tree)
    assert audit_sub, "audit membership join stopped broadcasting"
    assert any("element_at" in l for l in audit_sub), (
        "bloom arithmetic migrated above the audit join (no longer scan-side)"
    )
    assert "SortMergeJoin" not in p


def test_resample_single_exchange_per_key(spark, sf_dir):
    """Spine join + both window frames share ONE hash partitioning on the
    series key: exactly one shuffle for the windows (plus the aggregate
    building daily sums), and no single-partition global window."""
    p = _plan(spark, sf_dir, "resample_interpolate_daily_revenue")
    assert "SinglePartition" not in p, "a window collapsed to one partition"
    assert p.count("Window") >= 1


def test_fuzzy_join_shuffles_hashes_not_strings(spark, sf_dir):
    """The variant join must key on the 60-bit portable hash (__vh), so
    shuffle rows carry 8-byte keys; and the verify stage must be plain
    levenshtein, not a python UDF."""
    p = _plan(spark, sf_dir, "fuzzy_match_suppliers")
    assert "__vh" in p, "variant join no longer keys on the portable hash"
    assert "levenshtein" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_sketch_registers_partial_aggregate(spark, sf_dir):
    """Register build must plan as partial HashAggregate -> Exchange ->
    final: the shuffle carries (group, bucket, rank) register rows, never
    raw (day, user) pairs."""
    p = _plan(spark, sf_dir, "distinct_sketch_daily_users")
    assert "partial_max" in p or "partial_first" in p or "HashAggregate" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_quantile_bins_single_object_agg(spark, sf_dir):
    """Edges come from ONE array-argument percentile_disc (a single
    ObjectHashAggregate / SortAggregate pass), not N scalar aggregates
    each collecting the column."""
    p = _plan(spark, sf_dir, "quantile_bins_totalprice")
    exec_str = p[: p.index("== Physical Plan ==")] if "== Physical Plan ==" in p else p
    # one partial + one final ObjectHashAggregate, each with a SINGLE
    # array-argument percentile_disc; the scalar form would list 9
    # percentile_disc functions per aggregate.
    assert exec_str.count("partial_percentile_disc") == 1, "edges no longer one partial pass"
    assert exec_str.count("percentile_disc") == 2, "scalar percentile_disc reappeared (N-pass edges)"
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p  # edge row broadcast


def test_spatial_nn_single_cell_shuffle_and_windowed_argmin(spark, sf_dir):
    """Candidates come from ONE equi-join on cell ids (SortMergeJoin or
    shuffle hash -- never a cartesian), and the argmin is a per-point
    window over candidates, not a global sort."""
    p = _plan(spark, sf_dir, "spatial_nearest_supplier")
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "SinglePartition" not in p
    assert "row_number" in p


def test_pagerank_edges_materialized_once(spark, sf_dir):
    """The prepared edge table must come from the persisted frame
    (InMemoryTableScan), so iterations never re-run the lineitem scan +
    distinct + degree join."""
    df = QUERIES["pagerank_part_supplier"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    # final plan reads checkpointed ranks; the persist proof is that no
    # lineitem scan remains in the last iteration's lineage
    assert "lineitem" not in p or p.count("lineitem") <= 1


def test_stratified_sample_window_group_limit(spark, sf_dir):
    """rank<=k must rewrite to WindowGroupLimit (partial stage keeps k
    rows per stratum before the shuffle)."""
    p = _plan(spark, sf_dir, "stratified_sample_orders")
    assert "WindowGroupLimit" in p


def test_pit_join_single_shuffle_no_pair_blowup(spark, sf_dir):
    """The as-of lookup must use the union-window formulation: no join of
    facts against the interval table (which materializes fact x
    earlier-version pairs), one window over the tagged union."""
    p = _plan(spark, sf_dir, "pit_join_event_segments")
    assert "Union" in p
    assert "last(" in p or "last_value" in p
