"""Operator-level tests for the round-8 widening batch: bounded BFS,
sorted-neighborhood blocking, fixed-point Gram, key-skew audit, Gini.

Each operator gets a HAND-COMPUTABLE case (the oracle queries prove
fixture-scale parity; these prove the semantics a fixture might dodge --
unreachable nodes, window edges, negative components, skew tails)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
    sorted_neighborhood_pairs,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
    bfs_distances,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
    gram_fixedpoint,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.skew import (
    key_skew_profile,
)


# ------------------------------------------------------------------ BFS
def test_bfs_hand_case_chain_and_unreachable(spark):
    # 1 -> 2 -> 3 -> 4 -> 5, plus isolated 9; seeds {1}: depth 3 reaches 4.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_depth=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond depth, 9 unreachable


def test_bfs_multi_source_takes_min(spark):
    # seeds {1, 5} on the chain: node 3 is 2 hops from either side.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 4), (4, 3), (3, 2), (2, 1)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_depth=10).collect()
    }
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_early_exit_matches_full_depth(spark):
    # a 3-node cycle converges in 2 rounds; max_depth 20 must early-exit
    # to the same answer (fixpoint == bounded answer).
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    a = sorted(bfs_distances(edges, seeds, max_depth=20).collect())
    b = sorted(bfs_distances(edges, seeds, max_depth=3).collect())
    assert a == b == [(1, 0), (2, 1), (3, 2)]


# ------------------------------------------------- sorted neighborhood
def test_snb_matches_bruteforce_rank_window(spark):
    """The two-phase distributed rank must produce EXACTLY the single
    ROW_NUMBER pair set, including across range-bucket boundaries."""
    rows = [(i, f"name {chr(97 + i % 23)}{i:04d}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in sorted_neighborhood_pairs(df, "id", "key", window=4, max_dist=5).collect()
    }
    # brute force: rank in Python, same total order (lower(trim(key)), id)
    ranked = sorted(rows, key=lambda r: (r[1].lower().strip(), r[0]))
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = set()
    for x in range(len(ranked)):
        for y in range(x + 1, min(x + 5, len(ranked))):
            d = lev(ranked[x][1].lower(), ranked[y][1].lower())
            if d <= 5:
                want.add((ranked[x][0], ranked[y][0], d))
    assert got == want


def test_snb_no_single_partition_window(spark, sf_dir):
    """The global rank must never plan a SinglePartition window -- that
    is the whole point of the two-phase scheme."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("key")
    )
    out = sorted_neighborhood_pairs(sup, "id", "key", window=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


# ------------------------------------------------------------- gram
def test_gram_matches_numpy(spark):
    import numpy as np

    rng = [[(-1) ** (i + j) * ((i * 7 + j * 3) % 11) / 11.0 for j in range(5)]
           for i in range(40)]
    df = spark.createDataFrame([(r,) for r in rng], "embedding array<float>")
    got = {(r["i"], r["j"]): r["gram_fp"] for r in gram_fixedpoint(df, scale=1000).collect()}
    x = np.array(rng, dtype=np.float32).astype(np.float64)
    xf = np.floor(x * 1000 + 0.5).astype(np.int64)
    g = xf.T @ xf
    want = {(i, j): int(g[i, j]) for i in range(5) for j in range(i, 5)}
    assert got == want


def test_gram_single_aggregate_no_join(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = gram_fixedpoint(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "gram must be an aggregate, never a self-join"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------- skew
def test_key_skew_profile_hand_case(spark):
    # key a x1 (bucket 0), b x2, c x3 (bucket 1), d x8 (bucket 3)
    rows = [("a",)] + [("b",)] * 2 + [("c",)] * 3 + [("d",)] * 8
    df = spark.createDataFrame(rows, "k string")
    got = {r["bucket"]: (r["n_keys"], r["n_rows"], r["rows_share"])
           for r in key_skew_profile(df, "k").collect()}
    assert got[0] == (1, 1, round(1 / 14, 6))
    assert got[1] == (2, 5, round(5 / 14, 6))
    assert got[3] == (1, 8, round(8 / 14, 6))
    assert set(got) == {0, 1, 3}


# ------------------------------------------------------- bigram LM
def test_bigram_logprob_hand_case(spark):
    """2-doc corpus, hand-computed add-one bigram LM."""
    import math

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        bigram_logprob,
    )

    # doc1: "a b a b" -> bigrams (a,b) (b,a) (a,b); doc2: "a b" -> (a,b)
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
           for r in bigram_logprob(df, "doc_id", "text").collect()}
    V = 2  # vocab {a, b}
    # contexts: a appears as w1 3x, b 1x; bigram counts: (a,b)=3, (b,a)=1
    p_ab = (3 + 1) / (3 + V)
    p_ba = (1 + 1) / (1 + V)
    fp = lambda p: math.floor(-math.log(p) * 1e9 + 0.5)
    exp1 = math.floor(((fp(p_ab) * 2 + fp(p_ba)) / (3 * 1e9)) * 1e6 + 0.5) / 1e6
    exp2 = math.floor((fp(p_ab) / 1e9) * 1e6 + 0.5) / 1e6
    assert got[1] == (3, exp1)
    assert got[2] == (1, exp2)


def test_bigram_logprob_short_docs_dropped(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        bigram_logprob,
    )

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words here")], "doc_id long, text string"
    )
    got = bigram_logprob(df, "doc_id", "text").collect()
    assert {r["doc_id"] for r in got} == {2}  # 1-token doc has no bigram


# ------------------------------------------------------- repetition
def test_repetition_profile_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        repetition_profile,
    )

    # "x y z x y z x y z" -> 7 trigram instances, "x y z" occurs 3x
    df = spark.createDataFrame(
        [(1, "x y z x y z x y z"), (2, "a b c d e")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_grams"], r["top_count"], r["rep_ratio"], r["is_repetitive"])
           for r in repetition_profile(df, "doc_id", "text", flag_ratio=0.4).collect()}
    assert got[1] == (7, 3, 0.428571, 1)  # floor(3/7 * 1e6 + 0.5) / 1e6
    assert got[2] == (3, 1, 0.333333, 0)


# ------------------------------------------------------- weighted sample
def test_weighted_sample_deterministic_and_filtered(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(100)] + [(1000, 0), (1001, -5)],
        "doc_id long, w long",
    )
    a = [tuple(r) for r in weighted_sample(df, "doc_id", "w", k=10).collect()]
    b = [tuple(r) for r in weighted_sample(df, "doc_id", "w", k=10).collect()]
    assert a == b  # reproducible
    assert len(a) == 10
    assert all(r[1] > 0 for r in a)  # non-positive weights excluded
    # priorities are sorted ascending with id tie-break
    ps = [(r[2], r[0]) for r in a]
    assert ps == sorted(ps)


def test_weighted_sample_bias_toward_heavy(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        weighted_sample,
    )

    # half the ids have weight 100, half weight 1: the heavy half should
    # dominate a k=100 sample from 1000 candidates.
    df = spark.createDataFrame(
        [(i, 100 if i % 2 == 0 else 1) for i in range(1000)], "doc_id long, w long"
    )
    got = weighted_sample(df, "doc_id", "w", k=100).collect()
    heavy = sum(1 for r in got if r["w"] == 100)
    assert heavy > 80


# ------------------------------------------------- r8 review regressions
def test_bfs_pins_the_checkpoint_frame_itself(spark):
    """The pinned final must be the bare LogicalRDD checkpoint, not a
    projection over it -- otherwise release is a silent no-op and every
    round leaks (r8 review finding 1)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators import (
        dedup as dmod,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    bfs_distances(edges, seeds, max_depth=2).count()
    pinned = dmod._pinned_finals.get("graph.bfs")
    assert pinned is not None
    plan = pinned._jdf.queryExecution().analyzed()
    assert plan.getClass().getSimpleName() == "LogicalRDD", (
        "graph.bfs pins a non-checkpoint frame; _unpersist_checkpoint "
        "cannot release it"
    )
    dmod.release_caches()
    assert "graph.bfs" not in dmod._pinned_finals


def test_weighted_sample_fractional_weights_excluded(spark):
    """Weights in (0,1) truncate to 0 on the long cast and must be
    EXCLUDED, not divide-to-NULL and sort first (r8 review finding 2)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 0.4), (2, 0.9), (3, 5.0), (4, 2.0)], "doc_id long, w double"
    )
    got = weighted_sample(df, "doc_id", "w", k=10).collect()
    assert {r["doc_id"] for r in got} == {3, 4}
    assert all(r["priority"] is not None for r in got)


def test_gram_empty_and_null_raise_cleanly(spark):
    empty = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError, match="dim"):
        gram_fixedpoint(empty)
    # explicit dim makes the empty table a valid (0-row) result
    assert gram_fixedpoint(empty, dim=3).count() == 0


def test_key_skew_single_scan(spark, sf_dir):
    """The row total must come from the cached bucket rollup, not a
    second scan of the audited table (r8 review finding 6): both the
    output branch and the total branch must read InMemoryTableScan (the
    FileScan strings in the plan sit inside the InMemoryRelation's
    cached-plan description -- the file is scanned once, when the cache
    materializes)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = key_skew_profile(li, "l_partkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2, (
        "bucket rollup is not shared via cache; the fact table would be "
        "scanned once per consumer"
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        release_caches,
    )

    out.count()
    release_caches()


# ------------------------------------------------------- power iteration
def test_power_iteration_matches_numpy_integer_replay(spark):
    """Replay the exact integer recurrence in numpy and compare every
    component; also sanity-check convergence toward numpy's float
    dominant eigenvector."""
    import numpy as np

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        gram_fixedpoint,
        power_iteration_topvec,
    )

    rows = [[((i * 13 + j * 7) % 17 - 8) / 17.0 for j in range(6)] for i in range(50)]
    df = spark.createDataFrame([(r,) for r in rows], "embedding array<float>")
    cells = gram_fixedpoint(df, scale=10_000, dim=6)
    got = {
        r["node"]: r["eigvec_fp"]
        for r in power_iteration_topvec(
            cells, iterations=5, gram_div=100, vec_scale=10_000
        ).collect()
    }
    # integer replay -- python ints with TRUNC division throughout
    # (numpy's // floors, which diverges from Spark's div on negatives)
    x = np.array(rows, dtype=np.float32).astype(np.float64)
    xf = np.floor(x * 10_000 + 0.5).astype(np.int64)
    Gp = [[int(v) for v in row] for row in ((xf.T @ xf)).tolist()]
    trunc = lambda a, b: int(a / b) if (a < 0) != (b < 0) else a // b
    Gt = [[trunc(v, 100) for v in row] for row in Gp]
    v = [10_000] * 6
    for _ in range(5):
        w = [sum(Gt[i][j] * v[j] for j in range(6)) for i in range(6)]
        m = max(1, (max(abs(c) for c in w) + 9_999) // 10_000)  # ceil div
        v = [trunc(c, m) for c in w]
    assert all(abs(c) <= 10_000 for c in v)  # the renorm invariant
    assert got == {i: v[i] for i in range(6)}
    # direction sanity vs float eigensolver
    evals, evecs = np.linalg.eigh(np.array(Gt, dtype=np.float64))
    top = evecs[:, np.argmax(evals)]
    mine = np.array([v[i] for i in range(6)], dtype=np.float64)
    cos = abs(top @ mine) / (np.linalg.norm(top) * np.linalg.norm(mine))
    assert cos > 0.99


def test_power_iteration_releases_checkpoints(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators import (
        dedup as dmod,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        gram_fixedpoint,
        power_iteration_topvec,
    )

    rows = [[(i + j) / 10.0 for j in range(4)] for i in range(10)]
    df = spark.createDataFrame([(r,) for r in rows], "embedding array<float>")
    power_iteration_topvec(gram_fixedpoint(df, scale=100, dim=4), iterations=3).count()
    pinned = dmod._pinned_finals.get("similarity.power")
    assert pinned is not None
    assert pinned._jdf.queryExecution().analyzed().getClass().getSimpleName() == "LogicalRDD"
    dmod.release_caches()
    assert "similarity.power" not in dmod._pinned_finals


# ------------------------------------------------------- multimodal r8
def test_frame_sampler_fanout_and_determinism(spark):
    """Variable fanout: duration 1200ms at 500ms ticks -> frames at
    0/500/1000; NULL duration rows (images) produce no frames; repeat
    runs produce identical frame digests."""
    import hashlib

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.multimodal import (
        DECODED_SCHEMA,
        sample_video_frames,
    )

    rows = [
        (1, "video/fake", 10, "aaaa1111", None, None, None, None, 1200, "ok"),
        (2, "image/fake", 10, "bbbb2222", 64, 64, None, None, None, "ok"),
    ]
    decoded = spark.createDataFrame(rows, DECODED_SCHEMA)
    got = sorted(
        (r["doc_id"], r["frame_idx"], r["ts_ms"], r["frame_sha8"])
        for r in sample_video_frames(decoded, every_ms=500).collect()
    )
    want = [
        (1, i, i * 500, hashlib.sha256(f"aaaa1111:{i}".encode()).hexdigest()[:8])
        for i in range(3)
    ]
    assert got == want
    assert got == sorted(
        (r["doc_id"], r["frame_idx"], r["ts_ms"], r["frame_sha8"])
        for r in sample_video_frames(decoded, every_ms=500).collect()
    )


def test_resize_plan_hand_cases(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.multimodal import (
        DECODED_SCHEMA,
        plan_image_resize,
    )

    rows = [
        (1, "image/fake", 10, "x", 200, 100, None, None, None, "ok"),  # resize
        (2, "image/fake", 10, "x", 50, 96, None, None, None, "ok"),    # keep
        (3, "image/fake", 10, "x", 1000, 3, None, None, None, "ok"),   # min 1px? -> 96, 0->1
        (4, "audio/wav", 10, "x", None, None, 1, 8000, 100, "ok"),     # no dims
    ]
    decoded = spark.createDataFrame(rows, DECODED_SCHEMA)
    got = {r["doc_id"]: (r["out_width"], r["out_height"], r["status"])
           for r in plan_image_resize(decoded, max_side=96).collect()}
    assert got[1] == (96, 48, "resize")
    assert got[2] == (50, 96, "keep")
    assert got[3] == (96, 1, "resize")  # floor((3*96)/1000)=0 clamps to 1
    assert got[4] == (None, None, "no_dims")


def test_decode_media_null_payload_status_row(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.multimodal import (
        decode_media,
    )

    df = spark.createDataFrame(
        [(1, "image/fake", bytearray(b"x")), (2, "image/fake", None)],
        "doc_id long, mime string, content binary",
    )
    got = {r["doc_id"]: r["status"] for r in decode_media(df).collect()}
    assert got == {1: "ok", 2: "null_payload"}


# --------------------------------------------- temporal reachability
def test_temporal_reachability_respects_time(spark):
    """The defining case: an edge that departs BEFORE the walker arrives
    at its source must not carry it -- static BFS would."""
    import datetime as dt

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        temporal_reachability,
    )

    d = lambda s: dt.date.fromisoformat(s)
    # 1 -(avail 2024-01-05 / arr 01-06)-> 2 -(avail 01-03 / arr 01-04)-> 3
    # seed at 1 on 01-01: reaches 2 at 01-06, but 2->3 left on 01-03 < 01-06
    # so 3 is NOT reachable; a later 2->3 edge (02-01) does carry it.
    edges = spark.createDataFrame(
        [
            (1, 2, d("2024-01-05"), d("2024-01-06")),
            (2, 3, d("2024-01-03"), d("2024-01-04")),
            (2, 3, d("2024-02-01"), d("2024-02-02")),
        ],
        "src long, dst long, avail date, arr date",
    )
    seeds = spark.createDataFrame([(1, d("2024-01-01"))], "node long, d date")
    got = {r["node"]: str(r["d"]) for r in temporal_reachability(edges, seeds, 3).collect()}
    assert got == {1: "2024-01-01", 2: "2024-01-06", 3: "2024-02-02"}


def test_temporal_reachability_takes_earliest_arrival(spark):
    import datetime as dt

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        temporal_reachability,
    )

    d = lambda s: dt.date.fromisoformat(s)
    # two usable routes to 2: arrivals 01-10 and 01-03 -> keep 01-03
    edges = spark.createDataFrame(
        [(1, 2, d("2024-01-08"), d("2024-01-10")), (1, 2, d("2024-01-02"), d("2024-01-03"))],
        "src long, dst long, avail date, arr date",
    )
    seeds = spark.createDataFrame([(1, d("2024-01-01"))], "node long, d date")
    got = {r["node"]: str(r["d"]) for r in temporal_reachability(edges, seeds, 1).collect()}
    assert got[2] == "2024-01-03"


# --------------------------------------------- containment
def test_containment_asymmetric_vs_jaccard(spark):
    """A short doc fully inside a long one: containment 1.0 while
    Jaccard is small -- the case the operator exists for."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    short = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    longd = spark.createDataFrame(
        [(2, "zero one two alpha beta gamma delta three four five six seven eight nine")],
        "doc_id long, text string",
    )
    got = containment_pairs(short, longd, "doc_id", "text", threshold=0.9).collect()
    assert len(got) == 1 and got[0]["containment"] == 1.0
    both = short.unionByName(longd)
    jac = jaccard_pairs(both, "doc_id", "text", threshold=0.5).collect()
    assert jac == []  # Jaccard misses exactly this pair


def test_snb_multipass_catches_first_char_typo(spark):
    """The canonical multipass case: a FIRST-character typo teleports the
    record in the forward ordering (single-pass misses it) but the
    reversed-key pass still co-locates the pair."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        sorted_neighborhood_multipass,
        sorted_neighborhood_pairs,
    )

    # many spacer rows ensure 'zcme corp 0001' sorts FAR from 'acme corp 0001'
    rows = [(1, "acme corp 0001"), (2, "zcme corp 0001")] + [
        (10 + i, f"m{i:03d} spacer {i:04d}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    single = sorted_neighborhood_pairs(df, "id", "name", window=3, max_dist=2)
    assert not [r for r in single.collect() if {r["id_a"], r["id_b"]} == {1, 2}]
    multi = sorted_neighborhood_multipass(
        df, "id", [F.col("name"), F.reverse(F.col("name"))], window=3, max_dist=2
    )
    hits = [r for r in multi.collect() if {r["id_a"], r["id_b"]} == {1, 2}]
    assert len(hits) == 1 and hits[0]["dist"] == 1


def test_weighted_sample_per_group_quota(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        weighted_sample_per_group,
    )

    rows = [(i, (i % 5) + 1, f"src{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, w long, src string")
    got = weighted_sample_per_group(df, "doc_id", "w", "src", k_per_group=7).collect()
    from collections import Counter

    per = Counter(r["src"] for r in got)
    assert per == {"src0": 7, "src1": 7, "src2": 7}
    # rank within each group follows (priority, id)
    for s in per:
        grp = sorted((r["rk"], r["priority"], r["doc_id"]) for r in got if r["src"] == s)
        assert [g[0] for g in grp] == list(range(1, 8))
        assert [(g[1], g[2]) for g in grp] == sorted((g[1], g[2]) for g in grp)


# ------------------------------------------- r9 advice-fix regressions
def test_snb_multipass_normalizes_verify_column(spark):
    """r8 advice (medium): multipass verified levenshtein on the RAW
    column while single-pass (and the SQL oracle) verify on
    lower(trim(...)).  Mixed-case + padded input must yield the
    NORMALIZED distance."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        sorted_neighborhood_multipass,
    )

    rows = [(1, "  ACME Corp  "), (2, "acme corq")] + [
        (10 + i, f"m{i:03d} spacer") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted_neighborhood_multipass(
        df, "id", [F.col("name"), F.reverse(F.col("name"))], window=4, max_dist=3
    )
    hits = [r for r in got.collect() if {r["id_a"], r["id_b"]} == {1, 2}]
    # lower(trim): 'acme corp' vs 'acme corq' -> dist 1.  The raw
    # distance ('  ACME Corp  ' vs 'acme corq') is 9 -- over max_dist,
    # so the un-normalized operator dropped the pair entirely.
    assert len(hits) == 1 and hits[0]["dist"] == 1


def test_snb_pairs_multibyte_keys_rank_correctly(spark):
    """r8 advice (low): the 7-char rank proxy overflowed conv for
    multibyte UTF-8 keys.  The byte-sliced proxy must rank arbitrary
    UTF-8 exactly like binary-collation ORDER BY."""
    greek = "αβγδεζηθικλμ"
    rows = [(i, f"{greek[i]}row{i:02d}") for i in range(len(greek))]
    # shuffle ids relative to sort order so ranking actually matters
    rows = rows[::2] + rows[1::2]
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted_neighborhood_pairs(
        df, "id", "name", window=2, max_dist=10**9, num_partitions=4
    )
    got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    order = [i for i, _ in sorted(rows, key=lambda r: r[1].encode("utf-8"))]
    want = {
        (order[a], order[a + k])
        for a in range(len(order))
        for k in (1, 2)
        if a + k < len(order)
    }
    assert got_pairs == want


def test_gram_fixedpoint_ragged_vector_raises(spark):
    """r8 advice (low): a vector shorter than dim silently dropped
    NULL products from the Gram cells; it must now fail loudly."""
    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3]), (2, [0.4, 0.5])], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="gram_fixedpoint"):
        gram_fixedpoint(df, scale=1000, dim=3).collect()
    nulls = spark.createDataFrame(
        [(1, [0.1, None, 0.3])], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="gram_fixedpoint"):
        gram_fixedpoint(nulls, scale=1000, dim=3).collect()
