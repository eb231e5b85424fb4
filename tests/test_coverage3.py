"""Semantics tests for the round-7 widening operators: bloom pruning,
time-series interpolation, fuzzy ER join, portable sketches, quantile
bins."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.aggregates import (
    quantile_bucketize,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prune_join,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
    fuzzy_join,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
    distinct_sketch,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.timeseries import (
    resample_interpolate,
)


# ----------------------------------------------------------------- bloom
def test_bloom_no_false_negatives(spark):
    """Every build-side key must pass its own filter -- the property the
    exact-join fallback relies on."""
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_build(build, "k", num_bits=4096, k=3)
    survivors = build.filter(bloom_might_contain(F.col("k"), words, 4096, 3)).count()
    assert survivors == 500


def test_bloom_prunes_most_non_members(spark):
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    words = bloom_build(build, "k", num_bits=4096, k=3)
    probe = spark.range(10_000, 20_000).select(F.col("id").alias("k"))
    fp = probe.filter(bloom_might_contain(F.col("k"), words, 4096, 3)).count()
    # 300 set bits in 4096 -> fp rate ~ (300/4096)^3 ~ 4e-4
    assert fp < 100


def test_bloom_prune_join_equals_exact_semi(spark):
    probe = spark.range(0, 2000).select((F.col("id") % 700).alias("k"), F.col("id").alias("v"))
    build = spark.range(0, 50).select((F.col("id") * 7).alias("bk"))
    got = bloom_prune_join(probe, build, "k", "bk", num_bits=1 << 12)
    want = probe.join(
        build.withColumnRenamed("bk", "k").distinct(), on="k", how="left_semi"
    )
    assert sorted(got.select("k", "v").collect()) == sorted(want.select("k", "v").collect())


def test_bloom_prune_join_rejects_outer(spark):
    """The bloom pre-filter drops probe rows BEFORE the join, so an outer
    flavor would silently lose rows that must survive with NULLs -- the
    operator must refuse loudly (r7 ADVICE)."""
    probe = spark.range(0, 10).select(F.col("id").alias("k"))
    build = spark.range(0, 5).select(F.col("id").alias("bk"))
    with pytest.raises(ValueError, match="left_semi"):
        bloom_prune_join(probe, build, "k", "bk", how="left")
    # the two sound flavors still work
    assert bloom_prune_join(probe, build, "k", "bk", how="inner").count() == 5
    assert bloom_prune_join(probe, build, "k", "bk", how="left_semi").count() == 5


def test_bloom_word_array_bounded(spark):
    words = bloom_build(spark.range(0, 10).select(F.col("id").alias("k")), "k", 1 << 12, 3)
    assert len(words) == (1 << 12) // 32
    assert all(0 <= w < (1 << 32) for w in words)


# ------------------------------------------------------------ timeseries
def test_resample_interpolate_hand_case(spark):
    d = datetime.date
    df = spark.createDataFrame(
        [("a", d(2024, 1, 1), 10.0), ("a", d(2024, 1, 4), 40.0), ("b", d(2024, 1, 2), 5.0)],
        "key string, day date, val double",
    )
    out = {
        (r["key"], r["day"]): (r["val_filled"], r["was_gap"])
        for r in resample_interpolate(df, "key", "day", "val").collect()
    }
    assert out[("a", d(2024, 1, 1))] == (10.0, 0)
    assert out[("a", d(2024, 1, 2))] == (20.0, 1)  # 10 + (40-10) * 1/3
    assert out[("a", d(2024, 1, 3))] == (30.0, 1)
    assert out[("a", d(2024, 1, 4))] == (40.0, 0)
    assert out[("b", d(2024, 1, 2))] == (5.0, 0)
    assert len(out) == 5


def test_resample_edge_fill(spark):
    """Leading/trailing gaps use nearest-edge fill, not extrapolation."""
    d = datetime.date
    df = spark.createDataFrame(
        [("a", d(2024, 1, 1), None), ("a", d(2024, 1, 2), 8.0), ("a", d(2024, 1, 3), None)],
        "key string, day date, val double",
    )
    # nulls in the input behave like missing days
    out = {r["day"]: r["val_filled"] for r in resample_interpolate(df, "key", "day", "val").collect()}
    assert out == {d(2024, 1, 1): 8.0, d(2024, 1, 2): 8.0, d(2024, 1, 3): 8.0}


# ------------------------------------------------------------- fuzzy join
def _df_names(spark, rows, idc, strc):
    return spark.createDataFrame(rows, f"{idc} long, {strc} string")


def test_fuzzy_join_distance1_complete(spark):
    """Insert / delete / substitute at distance 1 are all found."""
    left = _df_names(
        spark, [(1, "meier"), (2, "mayer"), (3, "schmidt"), (4, "xyz")], "lid", "lname"
    )
    right = _df_names(
        spark,
        [(10, "meier"), (11, "meyer"), (12, "meie"), (13, "meiers"), (14, "qqq")],
        "rid",
        "rname",
    )
    got = {
        (r["lid"], r["rid"]): r["dist"]
        for r in fuzzy_join(left, right, "lid", "lname", "rid", "rname", 1).collect()
    }
    assert got[(1, 10)] == 0  # exact
    assert got[(1, 11)] == 1  # substitute
    assert got[(1, 12)] == 1  # delete
    assert got[(1, 13)] == 1  # insert
    assert (4, 14) not in got
    assert all(d <= 1 for d in got.values())


def test_fuzzy_join_verify_kills_shared_variant_distance2(spark):
    """'xab' and 'aby' share delete-1 variant 'ab' but are distance 2:
    blocking surfaces them, verify must reject."""
    left = _df_names(spark, [(1, "xab")], "lid", "lname")
    right = _df_names(spark, [(2, "aby")], "rid", "rname")
    assert fuzzy_join(left, right, "lid", "lname", "rid", "rname", 1).count() == 0


# --------------------------------------------------------------- sketches
def test_sketch_merge_lossless(spark, sf_dir_medium):
    """max-merge of daily registers == registers computed at weekly grain
    directly (the mergeability contract)."""
    e = (
        spark.read.parquet(f"{sf_dir_medium}/events.parquet")
        .select(F.to_date("ts").alias("day"), "user_id")
    )
    daily = hll_registers(e, ["day"], "user_id")
    merged = (
        daily.withColumn("week", F.to_date(F.date_trunc("week", "day")))
        .groupBy("week", "bucket")
        .agg(F.max("r").alias("r"))
    )
    direct = hll_registers(
        e.withColumn("week", F.to_date(F.date_trunc("week", "day"))), ["week"], "user_id"
    )
    assert sorted(merged.collect()) == sorted(direct.collect())


def test_sketch_merge_operator(spark):
    a = spark.range(0, 1000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(500, 1500).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    ra, rb = hll_registers(a, ["g"], "v"), hll_registers(b, ["g"], "v")
    merged_est = hll_estimate(hll_merge([ra, rb], ["g"]), ["g"]).first()["est"]
    union_est = distinct_sketch(a.unionByName(b), ["g"], "v").first()["est"]
    assert merged_est == union_est  # merge == sketch of the union


@pytest.mark.parametrize("n", [80, 1000])
def test_sketch_estimate_accuracy(spark, n):
    df = spark.range(0, n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = distinct_sketch(df, ["g"], "v").first()["est"]
    # m=64 -> ~13% standard error; allow 3 sigma
    assert abs(est - n) / n < 0.4


def test_sketch_linear_counting_small(spark):
    """Tiny cardinalities take the linear-counting branch and stay tight."""
    df = spark.range(0, 5).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = distinct_sketch(df, ["g"], "v").first()["est"]
    assert abs(est - 5) < 2


# ----------------------------------------------------------- quantile bins
def test_quantile_bins_partition_and_order(spark, sf_dir_medium):
    o = spark.read.parquet(f"{sf_dir_medium}/orders.parquet")
    probs = [0.25, 0.5, 0.75]
    binned = quantile_bucketize(o, "o_totalprice", probs)
    assert binned.count() == o.count()  # no rows lost
    stats = (
        binned.groupBy("bin")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"), F.count("*").alias("n"))
        .orderBy("bin")
        .collect()
    )
    assert [r["bin"] for r in stats] == [1, 2, 3, 4]
    for prev, cur in zip(stats, stats[1:]):
        assert prev["hi"] <= cur["lo"]  # bins are ordered, non-overlapping
    n = o.count()
    for r in stats:  # quartiles of a near-continuous column: ~n/4 each
        assert abs(r["n"] - n / 4) / n < 0.05


def test_quantile_bins_null_input_gets_null_bin(spark):
    """NULLs never participate in the quantile edges, so they must get a
    NULL bin -- not silently land in bin 1 (r7 ADVICE)."""
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 9)] + [(None,), (None,)],
        "x double",
    )
    binned = quantile_bucketize(df, "x", [0.5])
    rows = binned.select("x", "bin").collect()
    assert {r["bin"] for r in rows if r["x"] is None} == {None}
    assert all(r["bin"] in (1, 2) for r in rows if r["x"] is not None)
    assert binned.count() == 10  # NULL rows are kept, just unbinned


def test_quantile_edges_distributed_matches_percentile_disc(spark, sf_dir_medium):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.aggregates import (
        quantile_edges_distributed,
    )

    o = spark.read.parquet(f"{sf_dir_medium}/orders.parquet")
    probs = [0.1, 0.25, 0.3, 0.5, 0.75, 0.9]
    plist = ", ".join(repr(p) for p in probs)
    want = o.agg(
        F.expr(f"percentile_disc(array({plist})) WITHIN GROUP (ORDER BY o_totalprice)")
    ).first()[0]
    got = quantile_edges_distributed(o, "o_totalprice", probs, num_partitions=8)
    assert got == list(want)


def test_quantile_edges_distributed_duplicates_and_exact_boundary(spark):
    """n=1000 with p=0.3 lands exactly on rank 300 (float 0.3*1000 =
    300.0000000000001 would off-by-one); heavy duplicates exercise the
    (value, count) collapse."""
    df = spark.range(0, 1000).select((F.col("id") % 10).cast("double").alias("v"))
    probs = [0.3, 0.5, 1.0]
    want = df.agg(
        F.expr("percentile_disc(array(0.3, 0.5, 1.0)) WITHIN GROUP (ORDER BY v)")
    ).first()[0]
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.aggregates import (
        quantile_edges_distributed,
    )

    got = quantile_edges_distributed(df, "v", probs, num_partitions=4)
    assert got == list(want)


# ---------------------------------------------------------------- spatial
def test_grid_nn_matches_bruteforce(spark):
    """Blocking completeness: grid_nn_join == brute-force nearest within
    radius on random-ish deterministic points."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.spatial import (
        grid_nn_join,
        hashed_coords,
    )

    pts = hashed_coords(spark.range(0, 300).select(F.col("id").alias("pid")), "pid")
    sites = hashed_coords(spark.range(0, 40).select(F.col("id").alias("sid")), "sid")
    R = 120_000
    got = {
        r["pid"]: (r["sid"], r["dist2"])
        for r in grid_nn_join(pts, sites, "pid", "sid", R).collect()
    }
    import itertools

    p = [(r["pid"], r["x"], r["y"]) for r in pts.collect()]
    s = [(r["sid"], r["x"], r["y"]) for r in sites.collect()]
    want = {}
    for pid, px, py in p:
        best = None
        for sid, sx, sy in s:
            d2 = (px - sx) ** 2 + (py - sy) ** 2
            if d2 <= R * R and (best is None or (d2, sid) < best):
                best = (d2, sid)
        if best is not None:
            want[pid] = (best[1], best[0])
    assert got == want


# --------------------------------------------------------------- pagerank
def test_pagerank_fixedpoint_exhaustive_reference(spark):
    """Exact equality with a pure-Python replay of the same fixed-point
    recurrence on a small star+path graph."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        SCALE,
        pagerank_fixedpoint,
    )

    raw = [(1, 2), (1, 3), (1, 4), (4, 5), (5, 1)]
    sym = raw + [(b, a) for a, b in raw]
    edges = spark.createDataFrame(sym, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank_fixedpoint(edges, 5).collect()}

    from collections import defaultdict

    out = defaultdict(list)
    for a, b in sym:
        out[a].append(b)
    ranks = {n: SCALE for n in out}
    for _ in range(5):
        sums = defaultdict(int)
        for u, vs in out.items():
            c = ranks[u] // len(vs)
            for v in vs:
                sums[v] += c
        ranks = {v: 15 * SCALE // 100 + (85 * s) // 100 for v, s in sums.items()}
    assert got == dict(ranks)
    # the hub (node 1, degree 4) outranks the leaves
    assert got[1] == max(got.values())


def test_pagerank_mass_approximately_conserved(spark):
    """Total fixed-point mass stays within quantization loss of n*SCALE
    (each node loses < deg + 1 units per iteration to floor division)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        SCALE,
        pagerank_fixedpoint,
    )

    li = spark.createDataFrame(
        [(i, (i * 7) % 20) for i in range(20)], "src long, dst long"
    )
    edges = li.unionByName(li.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    total = sum(r["rank_fp"] for r in pagerank_fixedpoint(edges, 5).collect())
    n = edges.select("src").distinct().count()
    assert abs(total - n * SCALE) < n * 1000  # quantization-only drift


# -------------------------------------------------------------- surprisal
def test_unigram_surprisal_semantics(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        unigram_surprisal,
    )
    import math

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a a a rare")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_surprisal(docs, "doc_id", "text").collect()}
    # corpus: a x7, rare x1 -> p(a)=7/8, p(rare)=1/8
    assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 4
    assert out[1]["avg_surprisal"] == round(-math.log(7 / 8), 6)
    want2 = round((3 * -math.log(7 / 8) + -math.log(1 / 8)) / 4, 6)
    assert abs(out[2]["avg_surprisal"] - want2) <= 1e-6
    assert out[2]["avg_surprisal"] > out[1]["avg_surprisal"]  # rare token raises score


def test_pagerank_final_checkpoint_bounded(spark):
    """Each run supersedes the previous run's pinned final checkpoint
    (bound: one per session), and release via dedup.release_caches()
    drops it entirely."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators import graph
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        release_caches,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        _pinned_finals,
    )

    spark.catalog.clearCache()
    release_caches()
    graph.pagerank_fixedpoint(edges, 2).collect()
    first = _pinned_finals.get("graph.pagerank")
    assert first is not None
    graph.pagerank_fixedpoint(edges, 3).collect()
    assert _pinned_finals.get("graph.pagerank") is not first  # superseded
    release_caches()
    assert "graph.pagerank" not in _pinned_finals
    n_cached = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_cached == 0, f"{n_cached} RDDs still pinned after release"


def test_fuzzy_join_hot_bucket_guard(spark):
    """A variant bucket above the cap is dropped (degenerate duplicate
    flood); distinct names keep matching."""
    left = _df_names(
        spark, [(i, "dupe") for i in range(20)] + [(100, "unique")], "lid", "lname"
    )
    right = _df_names(spark, [(1, "dupe"), (2, "uniqux")], "rid", "rname")
    out = fuzzy_join(
        left, right, "lid", "lname", "rid", "rname", 1, max_bucket_size=5
    ).collect()
    pairs = {(r["lid"], r["rid"]) for r in out}
    assert (100, 2) in pairs  # distinct name still resolves
    assert not any(r == 1 for _, r in pairs)  # flooded 'dupe' bucket dropped
    # and with the guard off the flood comes back
    full = fuzzy_join(
        left, right, "lid", "lname", "rid", "rname", 1, max_bucket_size=None
    ).count()
    assert full == 21


# ---------------------------------------------------------------- hierarchy
def test_hierarchy_flatten_reference(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        hierarchy_flatten,
    )

    # two trees: 1->2->3->4 chain (parent pointers up) and root 10
    rows = [(1, None), (2, 1), (3, 2), (4, 3), (10, None), (11, 10)]
    nodes = spark.createDataFrame(rows, "node long, parent long")
    got = {(r["node"], r["root"], r["depth"]) for r in hierarchy_flatten(nodes).collect()}
    assert got == {(1, 1, 0), (2, 1, 1), (3, 1, 2), (4, 1, 3), (10, 10, 0), (11, 10, 1)}


# ------------------------------------------------------------------ privacy
def test_k_anonymize_semantics(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.privacy import (
        k_anonymize,
    )

    rows = [(1, "A"), (2, "A"), (3, "A"), (4, "B")]  # B group size 1 -> risky
    df = spark.createDataFrame(rows, "id long, seg string")
    out = {r["id_h"]: r for r in k_anonymize(df, "id", ["seg"], k=2, salt="s").collect()}
    import hashlib

    h4 = hashlib.sha256(b"s:4").hexdigest()
    assert out[h4]["seg"] is None and out[h4]["suppressed"] == 1
    h1 = hashlib.sha256(b"s:1").hexdigest()
    assert out[h1]["seg"] == "A" and out[h1]["suppressed"] == 0
    assert len(out) == 4  # no rows dropped


# ------------------------------------------------------------------- mining
def test_frequent_pairs_reference(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.mining import (
        frequent_pairs,
    )

    # baskets: (1,2) x3, (1,3) x1, item 4 infrequent
    rows = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 2),
        (13, 1), (13, 3),
        (14, 4),
    ]
    df = spark.createDataFrame(rows, "basket long, item long")
    out = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["lift"])
        for r in frequent_pairs(df, "basket", "item", min_support=2).collect()
    }
    # N=5 baskets, n_1=4, n_2=3, n_12=3 -> lift = 3*5/12 = 1.25
    assert out == {(1, 2): (3, 4, 3, 1.25)}


def test_frequent_pairs_apriori_prunes_infrequent_items(spark):
    """An item below support can never appear in a pair, even if the
    pair count would pass (impossible by downward closure) -- and the
    pruning keeps the pair join small."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.mining import (
        frequent_pairs,
    )

    rows = [(1, 1), (1, 9), (2, 1), (2, 8)]  # items 8,9 appear once each
    df = spark.createDataFrame(rows, "basket long, item long")
    assert frequent_pairs(df, "basket", "item", min_support=2).count() == 0


def test_frequent_pairs_basket_cap(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.mining import (
        frequent_pairs,
    )

    rows = [(b, i) for b in (1, 2) for i in range(6)]  # two identical baskets
    df = spark.createDataFrame(rows, "basket long, item long")
    capped = frequent_pairs(df, "basket", "item", 2, max_basket_items=3)
    # only items 0,1,2 survive the deterministic cap -> C(3,2)=3 pairs
    assert capped.count() == 3


# --------------------------------------------- review-finding regressions
def test_pagerank_keeps_indegree_zero_nodes(spark):
    """Directed graph with a source node (in-degree 0): the node keeps
    its teleport-rank row every round and keeps pushing mass -- matches
    the documented recurrence replayed in Python over ALL nodes."""
    from collections import defaultdict

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        SCALE,
        pagerank_fixedpoint,
    )

    raw = [(1, 2), (2, 3), (3, 2)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in pagerank_fixedpoint(edges, 3).collect()}

    out = defaultdict(list)
    for a, b in raw:
        out[a].append(b)
    ranks = {n: SCALE for n in out}
    for _ in range(3):
        sums = {n: 0 for n in out}
        for u, vs in out.items():
            c = ranks[u] // len(vs)
            for v in vs:
                if v in sums:
                    sums[v] += c
        ranks = {v: 15 * SCALE // 100 + (85 * s) // 100 for v, s in sums.items()}
    assert got == ranks
    assert 1 in got  # the source node never vanishes


def test_cross_operator_pinned_results_coexist(spark):
    """pagerank's returned frame stays usable after hierarchy_flatten
    runs (per-operator pinning keys; a shared slot used to kill it)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        hierarchy_flatten,
        pagerank_fixedpoint,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    pr = pagerank_fixedpoint(edges, 2)
    before = sorted(pr.collect())
    nodes = spark.createDataFrame([(1, None), (2, 1)], "node long, parent long")
    hierarchy_flatten(nodes).collect()
    assert sorted(pr.collect()) == before  # still alive, same values


def test_hierarchy_dangling_parent_becomes_root(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        hierarchy_flatten,
    )

    nodes = spark.createDataFrame(
        [(1, None), (2, 1), (3, 99)], "node long, parent long"
    )
    got = {(r["node"], r["root"], r["depth"]) for r in hierarchy_flatten(nodes).collect()}
    assert got == {(1, 1, 0), (2, 1, 1), (3, 99, 1)}  # 3 kept, rooted at 99


def test_k_anonymize_null_quasi_suppressed_not_dropped(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.privacy import (
        k_anonymize,
    )

    rows = [(1, "A"), (2, "A"), (3, None), (4, "B")]
    df = spark.createDataFrame(rows, "id long, seg string")
    out = k_anonymize(df, "id", ["seg"], k=2, salt="s").collect()
    assert len(out) == 4  # the NULL-quasi row is exported (suppressed), not dropped
    assert sum(r["suppressed"] for r in out) == 2  # NULL group + 'B' group


def test_frequent_pairs_cap_none_and_zero(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.mining import (
        frequent_pairs,
    )

    rows = [(b, i) for b in (1, 2) for i in range(4)]
    df = spark.createDataFrame(rows, "basket long, item long")
    assert frequent_pairs(df, "basket", "item", 2, max_basket_items=None).count() == 6
    assert frequent_pairs(df, "basket", "item", 2, max_basket_items=0).count() == 0


def test_bloom_build_ignores_null_keys(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    df = spark.createDataFrame([(1,), (2,), (None,)], "k long")
    words = bloom_build(df, "k", 1 << 12, 3)  # must not crash
    ok = spark.createDataFrame([(1,), (2,)], "k long")
    assert ok.filter(bloom_might_contain(F.col("k"), words, 1 << 12, 3)).count() == 2


def test_sketch_ignores_nulls_like_count_distinct(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
        distinct_sketch,
    )

    with_null = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", None)], "g string, v long"
    )
    without = spark.createDataFrame([("g", 1), ("g", 2)], "g string, v long")
    est_n = distinct_sketch(with_null, ["g"], "v").first()["est"]
    est_w = distinct_sketch(without, ["g"], "v").first()["est"]
    assert est_n == est_w


def test_hierarchy_cycle_raises_not_silently_wrong(spark):
    import pytest as _pytest

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        hierarchy_flatten,
    )

    # even cycle: pointer doubling self-converges -> post-check fires
    nodes = spark.createDataFrame([(1, 2), (2, 1)], "node long, parent long")
    with _pytest.raises(RuntimeError, match="cycle"):
        hierarchy_flatten(nodes, max_iter=4)
    # odd cycle: pointers never stabilize -> non-convergence guard fires
    odd = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "node long, parent long")
    with _pytest.raises(RuntimeError):
        hierarchy_flatten(odd, max_iter=4)


def test_triangle_count_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        triangle_count,
    )

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (0 new)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "lo long, hi long")
    r = triangle_count(df).first()
    assert r["n_edges"] == 7
    assert r["n_triangles"] == 4


# ---------------------------------------------------------- cusum / skyline
def test_cusum_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.timeseries import (
        cusum_positive,
    )

    df = spark.createDataFrame(
        [("k", i, d) for i, d in enumerate([5, -3, -9, 4, 6, -2])],
        "k string, i long, d long",
    )
    got = [r["cusum"] for r in cusum_positive(df, "k", "i", "d").orderBy("i").collect()]
    # S_i = max(0, S_{i-1} + d_i)
    want, s = [], 0
    for d in [5, -3, -9, 4, 6, -2]:
        s = max(0, s + d)
        want.append(s)
    assert got == want


def test_skyline_matches_bruteforce(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.skyline import (
        skyline_2d,
    )

    import random

    rng = random.Random(7)
    pts = [(rng.randrange(100), rng.randrange(100)) for _ in range(300)]
    df = spark.createDataFrame(pts, "mx long, mn long")
    got = {(r["mx"], r["mn"]) for r in skyline_2d(df, "mx", "mn", num_partitions=5).collect()}
    distinct = set(pts)
    want = {
        (x, y)
        for (x, y) in distinct
        if not any(
            (qx >= x and qy <= y and (qx > x or qy < y)) for (qx, qy) in distinct
        )
    }
    assert got == want


def test_allocation_sums_exactly_and_is_proportional(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry.queries()["allocate_fleet_largest_remainder"](spark, sf_dir)
    rows = df.collect()
    assert sum(r["allocated"] for r in rows) == 1000  # exact, always
    tw = sum(r["weight"] for r in rows)
    for r in rows:  # within 1 of the exact proportional share
        assert abs(r["allocated"] - r["weight"] * 1000 / tw) < 1


def test_cumulative_reach_semantics(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry.queries()["cumulative_user_reach"](spark, sf_dir)
    rows = sorted(df.collect(), key=lambda r: r["day"])
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    total_users = e.select("user_id").distinct().count()
    assert rows[-1]["reach"] == total_users  # final reach = all users ever
    assert all(a["reach"] <= b["reach"] for a, b in zip(rows, rows[1:]))  # monotone


def test_hierarchy_depth_at_doubling_boundary_converges(spark):
    """Depth exactly 2^max_iter must flatten (the detection round is
    extra, not part of the coverage budget)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        hierarchy_flatten,
    )

    depth = 8  # 2^3
    rows = [(0, None)] + [(i, i - 1) for i in range(1, depth + 1)]
    nodes = spark.createDataFrame(rows, "node long, parent long")
    got = {r["node"]: (r["root"], r["depth"]) for r in hierarchy_flatten(nodes, max_iter=3).collect()}
    assert got[depth] == (0, depth)


def test_pagerank_rejects_dangling_destinations(spark):
    import pytest as _pytest

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        pagerank_fixedpoint,
    )

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")  # 2 never a src
    with _pytest.raises(ValueError, match="dangling"):
        pagerank_fixedpoint(edges, 2)


def test_fifo_match_conservation(spark, sf_dir):
    """Every demand line is fully allocated and every lot fully consumed
    (supply == demand per part by construction here)."""
    import __spark_entry__ as entry

    alloc = entry.queries()["fifo_match_demand_to_suppliers"](spark, sf_dir)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    per_line = alloc.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("qty_alloc").alias("got")
    )
    # (orderkey, linenumber) is not unique in the fixture -- aggregate
    # the demand side to the same grain before comparing.
    want = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("want")
    )
    bad = per_line.join(want, ["l_orderkey", "l_linenumber"]).filter(
        F.col("got") != F.col("want")
    )
    assert bad.count() == 0
    assert alloc.filter(F.col("qty_alloc") <= 0).count() == 0


def test_prefix_filter_lossless_and_smaller(spark, sf_dir):
    """Prefix-filtered exact Jaccard == naive shared-shingle Jaccard
    (lossless), with a strictly smaller-or-equal candidate set."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
        prefix_filter_candidates,
        shingle_sets,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    naive = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    pref = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_pairs_prefix(docs, "doc_id", "text", 0.5).collect()
    }
    assert pref == naive
    # candidate economics: prefix candidates <= all shared-shingle pairs
    sh = shingle_sets(docs, "doc_id", "text")
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .select("a.doc", "b.doc")
        .distinct()
        .count()
    )
    n_pref = prefix_filter_candidates(docs, "doc_id", "text", 0.5).count()
    assert n_pref <= shared


def test_counter_repair_hand_case(spark):
    """Readings 10, 25, 5 (reset), 8 -> cumulative 10, 25, 30, 33 --
    exercised through the PRODUCTION operator (the registered query
    wraps the same function), not a private re-implementation."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.timeseries import (
        counter_repair,
    )

    rows = [(1, i, v) for i, v in enumerate([10, 25, 5, 8])]
    df = spark.createDataFrame(rows, "k long, i long, raw long")
    out = counter_repair(df, "k", ["i"], "raw").orderBy("i").collect()
    assert [r["true_cumulative"] for r in out] == [10, 25, 30, 33]
    assert [r["was_reset"] for r in out] == [0, 0, 1, 0]


def test_revenue_bridge_reconciles(spark, sf_dir):
    """Per-segment deltas sum exactly to total revenue movement."""
    import __spark_entry__ as entry

    br = entry.queries()["revenue_bridge_h1_vs_h2"](spark, sf_dir).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    t1 = o.filter(F.col("o_orderdate") < cut).agg(F.sum(cents)).first()[0] or 0
    t2 = o.filter(F.col("o_orderdate") >= cut).agg(F.sum(cents)).first()[0] or 0
    assert sum(r["bridge_cents"] for r in br) == t2 - t1
