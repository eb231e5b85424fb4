"""Operator-level tests for the round-9 widening batch: fixed-point
k-means, bounded weighted shortest paths, and the rest of the r9
additions.  Each operator gets a HAND-COMPUTABLE case (oracle queries
prove fixture-scale parity; these prove semantics a fixture might
dodge -- empty clusters, tie-breaks, relaxation improving a distance
in a later round)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.clustering import (
    kmeans_lloyd_fixedpoint,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
    shortest_paths_bounded,
)


# --------------------------------------------------------------- k-means
def test_kmeans_hand_case_two_clusters(spark):
    # scale 10: vf = [0,0],[2,0],[10,10],[8,10]; init c0=[0,0], c1=[2,0].
    # iter1: assign {1}->c0, {2,3,4}->c1; c1 -> [20//3, 20//3] = [6,6]
    # iter2: assign {1,2}->c0, {3,4}->c1; c0 -> [1,0], c1 -> [9,10];
    # inertia: c0 = 0+4, c1 = 32+20.
    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [0.2, 0.0]),
            (3, [1.0, 1.0]),
            (4, [0.8, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["cluster"], r["i"]): (r["c_fp"], r["n_pts"], r["inertia_fp"])
        for r in kmeans_lloyd_fixedpoint(
            df, k=2, iterations=2, dim=2, scale=10
        ).collect()
    }
    assert got == {
        (0, 0): (1, 2, 4),
        (0, 1): (0, 2, 4),
        (1, 0): (9, 2, 52),
        (1, 1): (10, 2, 52),
    }


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # Duplicate seed vectors: every point ties to cluster 0 (lowest
    # index wins), cluster 1 goes empty and must KEEP its init centroid
    # with n_pts = 0, inertia = 0.
    df = spark.createDataFrame(
        [(i, [0.5, 0.5]) for i in (1, 2, 3)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["cluster"], r["i"]): (r["c_fp"], r["n_pts"], r["inertia_fp"])
        for r in kmeans_lloyd_fixedpoint(
            df, k=2, iterations=1, dim=2, scale=10
        ).collect()
    }
    assert got == {
        (0, 0): (5, 3, 0),
        (0, 1): (5, 3, 0),
        (1, 0): (5, 0, 0),
        (1, 1): (5, 0, 0),
    }


def test_kmeans_rejects_ragged_and_tiny_inputs(spark):
    ragged = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.3])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="kmeans_lloyd_fixedpoint"):
        kmeans_lloyd_fixedpoint(ragged, k=2, iterations=1, dim=2).collect()
    tiny = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_lloyd_fixedpoint(tiny, k=2, iterations=1, dim=2)


# --------------------------------------------- weighted shortest paths
def test_sssp_hand_case_relaxation_improves_later(spark):
    # 1 -2-> 2 -2-> 3 -2-> 4 plus direct 1 -9-> 4: round 1 sees 9,
    # round 3 improves to 6.  Node 99 unreachable.
    edges = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 2), (3, 4, 2), (1, 4, 9), (98, 99, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    one = {
        r["node"]: r["dist"]
        for r in shortest_paths_bounded(edges, seeds, rounds=1).collect()
    }
    assert one == {1: 0, 2: 2, 4: 9}
    three = {
        r["node"]: r["dist"]
        for r in shortest_paths_bounded(edges, seeds, rounds=3).collect()
    }
    assert three == {1: 0, 2: 2, 3: 4, 4: 6}


def test_sssp_early_exit_at_fixpoint(spark):
    # Chain exhausts after 2 rounds; rounds=50 must early-exit with the
    # same exact answer (monotone min-plus fixpoint).
    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 4)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths_bounded(edges, seeds, rounds=50).collect()
    }
    assert got == {1: 0, 2: 3, 3: 7}


# ------------------------------------------------------- count-min sketch
def _py_cms_estimate(corpus, probes, depth, width):
    """Pure-Python CMS twin (same sha256 params, same md5 base hash) --
    the hand oracle for the Spark operator at ANY geometry."""
    import hashlib
    from collections import Counter

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
        CMS_P,
        cms_params,
    )

    params = cms_params(depth)
    regs = [Counter() for _ in range(depth)]

    def h0(item):
        return int(hashlib.md5(item.encode()).hexdigest()[1:16], 16) % CMS_P

    for item in corpus:
        h = h0(item)
        for r, (a, b) in enumerate(params):
            regs[r][((a * h + b) % CMS_P) % width] += 1
    out = {}
    for item in probes:
        h = h0(item)
        out[item] = min(
            regs[r].get(((a * h + b) % CMS_P) % width, 0)
            for r, (a, b) in enumerate(params)
        )
    return out


def test_cms_mergeability_exact(spark):
    """merge(sketch(A), sketch(B)) == sketch(A UNION ALL B), cell for
    cell -- the contract that lets per-partition / per-day sketches
    combine without touching raw data again."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
        cms_merge,
        cms_registers,
    )

    a_items = ["x", "y", "x", "z", "q"]
    b_items = ["y", "y", "w", "x"]
    dfa = spark.createDataFrame([(i,) for i in a_items], "item string")
    dfb = spark.createDataFrame([(i,) for i in b_items], "item string")
    both = spark.createDataFrame([(i,) for i in a_items + b_items], "item string")
    merged = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            [cms_registers(dfa, "item"), cms_registers(dfb, "item")]
        ).collect()
    }
    direct = {
        (r["r"], r["bucket"]): r["cnt"]
        for r in cms_registers(both, "item").collect()
    }
    assert merged == direct


def test_cms_estimate_unseen_probe_is_exact_zero(spark):
    """r9 advice (medium): an inner probe-register join dropped absent
    cells, so unseen items vanished (or overestimated off collided
    cells).  The left-join + coalesce contract: absent cell == exact 0,
    unseen probe == n_cms 0; every seen probe is an upper bound."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
        cms_estimate,
        cms_registers,
    )

    corpus = ["alpha", "alpha", "beta", "gamma", "alpha", "beta"]
    df = spark.createDataFrame([(i,) for i in corpus], "item string")
    regs = cms_registers(df, "item")
    probes = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("zzz_unseen",)], "item string"
    )
    got = {r["item"]: r["n_cms"] for r in cms_estimate(regs, probes, "item").collect()}
    assert set(got) == {"alpha", "beta", "gamma", "zzz_unseen"}
    assert got["zzz_unseen"] == 0
    exact = {"alpha": 3, "beta": 2, "gamma": 1}
    for item, n in exact.items():
        assert got[item] >= n
    # And bit-exact vs the pure-Python twin (collisions included).
    assert got == _py_cms_estimate(
        corpus, ["alpha", "beta", "gamma", "zzz_unseen"], 4, 512
    )


@pytest.mark.parametrize("depth,width", [(4, 512), (5, 2**14), (6, 2**16)])
def test_cms_production_width_geometries(spark, depth, width):
    """The demo query runs 4x512 for oracle readability; production runs
    2^14+ over the SAME code path.  Register-frame size math: the frame
    holds min(depth * n_distinct, depth * width) rows -- at depth 6 x
    width 2^16 that is <= 393,216 cells REGARDLESS of corpus row count
    (cells are count-merged map-side), i.e. a broadcast-sized sketch of
    a 100 TB corpus.  At 2^14+ over ~40 distinct items every estimate
    here is collision-free, hence exact; the 4x512 row cross-checks the
    pure-Python twin so collisions (if any) match bit-for-bit."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
        cms_estimate,
        cms_registers,
    )

    corpus = [f"tok{i % 40}" for i in range(200)]  # 40 distinct, 5 each
    df = spark.createDataFrame([(i,) for i in corpus], "item string")
    regs = cms_registers(df, "item", depth=depth, width=width)
    reg_rows = regs.collect()
    assert len(reg_rows) <= depth * min(40, width)
    # Every register row sums to the total occurrence count.
    per_r = {}
    for row in reg_rows:
        per_r[row["r"]] = per_r.get(row["r"], 0) + row["cnt"]
    assert per_r == {r: len(corpus) for r in range(depth)}
    probes = spark.createDataFrame(
        [(f"tok{i}",) for i in range(40)] + [("absent",)], "item string"
    )
    got = {
        r["item"]: r["n_cms"]
        for r in cms_estimate(regs, probes, "item", depth=depth, width=width).collect()
    }
    assert got == _py_cms_estimate(
        corpus, [f"tok{i}" for i in range(40)] + ["absent"], depth, width
    )
    if width >= 2**14:
        assert all(got[f"tok{i}"] == 5 for i in range(40))
    assert got["absent"] == 0


# ------------------------------------------------- vocab OOV boundary
def test_vocab_oov_boundary_tie_is_deterministic(spark):
    """Count-tie exactly AT rank vocab_size: 'bb' and 'cc' both occur
    twice with vocab_size=2 leaving one slot after 'aa' -- the (count
    desc, token asc) total order must admit 'bb' and exile 'cc' on
    EVERY run (a bare top-K by count alone would flap)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        vocab_oov_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "aa aa aa bb cc"),
            (2, "bb cc aa"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], float(r["oov_rate"]))
        for r in vocab_oov_stats(df, "doc_id", "text", vocab_size=2).collect()
    }
    # vocab = {aa(4), bb(2)}; cc(2) loses the tie on token asc.
    assert got == {1: (5, 1, 0.2), 2: (3, 1, 0.333333)}


# ------------------------------------------------- compaction planner
def _plan_rows(df, part_col="part"):
    return {
        (r[part_col], r["bin"]): (
            r["n_files"],
            r["bin_bytes"],
            r["first_key"],
            r["last_key"],
        )
        for r in df.collect()
    }


def test_compaction_bins_key_contiguity_and_fill(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.layout import (
        compaction_bins,
    )

    files = spark.createDataFrame(
        [
            ("p1", 1, 40),
            ("p1", 2, 40),
            ("p1", 3, 40),   # before=80 -> bin 0 (80 div 100)
            ("p1", 4, 40),   # before=120 -> bin 1
            ("p1", 5, 500),  # before=160 -> bin 1
            ("p2", 1, 10),
        ],
        "part string, key long, size long",
    )
    got = _plan_rows(compaction_bins(files, "part", "key", "size", 100))
    assert got == {
        ("p1", 0): (3, 120, 1, 3),
        ("p1", 1): (2, 540, 4, 5),
        ("p2", 0): (1, 10, 1, 1),
    }
    # Contiguity: within a partition, bins in order have disjoint,
    # increasing key ranges (compaction must preserve sort pruning).
    p1 = sorted((b, fk, lk) for (p, b), (_, _, fk, lk) in got.items() if p == "p1")
    for (b0, _, lk0), (b1, fk1, _) in zip(p1, p1[1:]):
        assert b1 == b0 + 1 and fk1 > lk0
    # Fill: every bin except a partition's last holds >= target bytes.
    assert got[("p1", 0)][1] >= 100


def test_compaction_bins_idempotent_replan_after_partial_run(spark):
    """Execute bin 0 of p1 (its 3 files become ONE compacted file of
    the bin's total size), replan over the new inventory: the compacted
    file re-bins alone as bin 0 (already >= target -- the executor
    skips n_files=1 bins) and every REMAINING bin reproduces exactly,
    because the running-sum 'before' of the surviving files is
    unchanged by construction."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.layout import (
        compaction_bins,
    )

    inv0 = spark.createDataFrame(
        [
            ("p1", 1, 40),
            ("p1", 2, 40),
            ("p1", 3, 40),
            ("p1", 4, 40),
            ("p1", 5, 500),
        ],
        "part string, key long, size long",
    )
    first = _plan_rows(compaction_bins(inv0, "part", "key", "size", 100))
    inv1 = spark.createDataFrame(
        [
            ("p1", 1, 120),  # bin 0 executed: one file, keys 1..3
            ("p1", 4, 40),
            ("p1", 5, 500),
        ],
        "part string, key long, size long",
    )
    second = _plan_rows(compaction_bins(inv1, "part", "key", "size", 100))
    assert second[("p1", 0)] == (1, 120, 1, 1)  # done, executor skips
    assert second[("p1", 1)] == first[("p1", 1)]  # identical remaining work


# --------------------------------------------- Fellegi-Sunter decision
def test_fs_band_edges_inclusive(spark):
    """score == upper classifies 'link' and score == lower classifies
    'nonlink' (both bounds INCLUSIVE); only the open interval between
    is clerical-review 'possible'."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        fellegi_sunter_scores,
    )

    pairs = spark.createDataFrame(
        [(1, "a", "a"), (2, "a", "b"), (3, "a", "a")],
        "pid long, fa string, fb string",
    )
    # One field, wa=+7, wd=-3: agree -> 7, disagree -> -3.
    out = fellegi_sunter_scores(
        pairs.filter(F.col("pid") == 1),
        [("ag_f", F.col("fa") == F.col("fb"))],
        [(7, -3)],
        upper=7,
        lower=-3,
    ).collect()[0]
    assert (out["score"], out["decision"]) == (7, "link")
    out = fellegi_sunter_scores(
        pairs.filter(F.col("pid") == 2),
        [("ag_f", F.col("fa") == F.col("fb"))],
        [(7, -3)],
        upper=7,
        lower=-3,
    ).collect()[0]
    assert (out["score"], out["decision"]) == (-3, "nonlink")
    out = fellegi_sunter_scores(
        pairs.filter(F.col("pid") == 3),
        [("ag_f", F.col("fa") == F.col("fb"))],
        [(7, -3)],
        upper=8,
        lower=-4,
    ).collect()[0]
    assert (out["score"], out["decision"]) == (7, "possible")


def test_fs_null_field_counts_as_disagreement(spark):
    """r9 advice (low): a NULL field made the materialized agreement
    column NULL instead of 0.  NULL comparison == disagreement: the
    column is 0 and the score takes the disagree weight."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        fellegi_sunter_scores,
    )

    pairs = spark.createDataFrame(
        [(1, None, "a"), (2, "a", "a")], "pid long, fa string, fb string"
    )
    got = {
        r["pid"]: (r["ag_f"], r["score"])
        for r in fellegi_sunter_scores(
            pairs,
            [("ag_f", F.col("fa") == F.col("fb"))],
            [(5, -2)],
            upper=5,
            lower=-2,
        ).collect()
    }
    assert got == {1: (0, -2), 2: (1, 5)}


def test_fs_weights_domain_validation_and_mismatch(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        fellegi_sunter_scores,
        fs_weights,
    )

    # Agree weight positive, disagree negative for any 0 < u < m < 1.
    (wa, wd), = fs_weights([(0.9, 0.1)])
    assert wa > 0 > wd
    for bad in [(0.1, 0.9), (0.5, 0.5), (0.0, 0.1), (0.9, 1.0)]:
        with pytest.raises(ValueError, match="fs_weights"):
            fs_weights([bad])
    df = spark.createDataFrame([(1, "a")], "pid long, fa string")
    with pytest.raises(ValueError, match="agreement exprs"):
        fellegi_sunter_scores(
            df, [("x", F.lit(True))], [(1, -1), (2, -2)], upper=1, lower=-1
        )


# --------------------------------- branched ragged-guard messages (r9 advice)
def test_guard_messages_distinguish_ragged_from_null(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        gram_fixedpoint,
    )

    ragged = spark.createDataFrame(
        [(1, [0.1, 0.2])], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="got size 2"):
        gram_fixedpoint(ragged, scale=1000, dim=3).collect()
    nulls = spark.createDataFrame(
        [(1, [0.1, None, 0.3])], "id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="contains NULL component"):
        gram_fixedpoint(nulls, scale=1000, dim=3).collect()
    kn = spark.createDataFrame(
        [(1, [0.1, None]), (2, [0.3, 0.4]), (3, [0.5, 0.6])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="contains NULL component"):
        kmeans_lloyd_fixedpoint(kn, k=2, iterations=1, dim=2).collect()


# ------------------------------------------ Fellegi-Sunter EM estimation
def _py_fs_em(pattern_counts, mu0, p0, scale=1_000_000):
    """Pure-Python integer twin of fs_estimate_mu (same truncating
    renormalization, same round-half-up divisions)."""
    import math

    k = len(mu0)
    m0 = [math.floor(m * scale + 0.5) for m, _ in mu0]
    u0 = [math.floor(u * scale + 0.5) for _, u in mu0]
    p0f = math.floor(p0 * scale + 0.5)

    def rhu(num, den):
        return None if den == 0 else (2 * num + den) // (2 * den)

    W = V = N = 0
    Wa = [0] * k
    Va = [0] * k
    for pat, n in pattern_counts.items():
        a, b = p0f, scale - p0f
        for j in range(k):
            a = (a * (m0[j] if pat[j] else scale - m0[j])) // scale
            b = (b * (u0[j] if pat[j] else scale - u0[j])) // scale
        w = rhu(a * scale, a + b)
        W += n * w
        V += n * (scale - w)
        N += n
        for j in range(k):
            if pat[j]:
                Wa[j] += n * w
                Va[j] += n * (scale - w)
    return {
        j: (m0[j], u0[j], rhu(Wa[j] * scale, W), rhu(Va[j] * scale, V), rhu(W, N))
        for j in range(k)
    }


def test_fs_em_matches_python_twin_and_flips_a_decision(spark):
    """Field A's prior says it is the strong discriminator (m=.9/u=.1 ~
    3.17 agree-bits vs B's 1.0); the DATA says A agrees all over the
    non-matching mass (300 A-only pairs vs 30 match-heavy both-agree).
    One EM round must (a) reproduce the pure-Python integer twin
    exactly, (b) raise u_A far above its prior, and (c) FLIP the
    decision for an A-only pair: prior weights score it 'link'
    (2.36 bits >= 2), posterior weights score it 'possible'
    (~1.6 bits < 2)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        fellegi_sunter_scores,
        fs_estimate_mu,
        fs_weights,
    )

    counts = {(1, 0): 300, (0, 1): 30, (1, 1): 30, (0, 0): 640}
    rows = [
        (ga, gb)
        for (ga, gb), n in counts.items()
        for _ in range(n)
    ]
    pairs = spark.createDataFrame(rows, "agree_a long, agree_b long")
    mu0 = [(0.9, 0.1), (0.6, 0.3)]
    got = {
        r["field"]: (
            r["m_prior_fp"], r["u_prior_fp"],
            r["m_post_fp"], r["u_post_fp"], r["p_post_fp"],
        )
        for r in fs_estimate_mu(pairs, ["agree_a", "agree_b"], mu0, 0.05).collect()
    }
    want = _py_fs_em(counts, mu0, 0.05)
    assert got == {"agree_a": want[0], "agree_b": want[1]}

    m_a, u_a = got["agree_a"][2] / 1e6, got["agree_a"][3] / 1e6
    m_b, u_b = got["agree_b"][2] / 1e6, got["agree_b"][3] / 1e6
    assert u_a > 0.25 > 0.1  # A's u blew up: it was never that strong
    assert 0 < u_a < m_a < 1 and 0 < u_b < m_b < 1

    upper, lower = 2_000_000, -2_000_000  # 2 bits in micro-log2 units
    a_only = spark.createDataFrame([(1, 0)], "agree_a long, agree_b long")
    exprs = [
        ("ag_a", F.col("agree_a") == 1),
        ("ag_b", F.col("agree_b") == 1),
    ]
    prior = fellegi_sunter_scores(
        a_only, exprs, fs_weights(mu0), upper=upper, lower=lower
    ).collect()[0]
    post = fellegi_sunter_scores(
        a_only, exprs, fs_weights([(m_a, u_a), (m_b, u_b)]),
        upper=upper, lower=lower,
    ).collect()[0]
    assert prior["decision"] == "link"
    assert post["decision"] == "possible"
    assert post["score"] < prior["score"]


def test_fs_em_validates_domain(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        fs_estimate_mu,
    )

    df = spark.createDataFrame([(1,)], "agree_a long")
    with pytest.raises(ValueError, match="0 < p0 < 1"):
        fs_estimate_mu(df, ["agree_a"], [(0.9, 0.1)], 1.0)
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_estimate_mu(df, ["agree_a"], [(0.1, 0.9)], 0.05)
    with pytest.raises(ValueError, match="agreement cols"):
        fs_estimate_mu(df, ["agree_a"], [(0.9, 0.1), (0.8, 0.2)], 0.05)


# ------------------------------------------------ winnowing fingerprints
def _py_winnow(text, k=3, w=4):
    """Pure-Python winnowing twin (same md5-slice hash, rightmost-min
    selection, whole-doc fallback for short docs)."""
    import hashlib

    def ph(s):
        return int(hashlib.md5(s.encode()).hexdigest()[1:16], 16)

    toks = text.lower().strip().split()
    n = len(toks)
    hs = [ph(" ".join(toks[i : i + k])) for i in range(0, max(n - k, 0) + 1)]
    nsh = len(hs)
    selected = set()
    for s in range(0, max(nsh - w, 0) + 1):
        win = range(s, min(s + w, nsh))
        mh = min(hs[p] for p in win)
        selected.add((mh, max(p for p in win if hs[p] == mh)))
    agg = {}
    for h, p in selected:
        c, fp = agg.get(h, (0, 10**9))
        agg[h] = (c + 1, min(fp, p))
    return agg


def test_winnow_matches_python_twin(spark):
    """Hand cases a fixture might dodge: a straight run (two window
    minima), a periodic doc (ONE fingerprint despite 4 repeats -- the
    rightmost-tie rule collapses identical shingles), a single-shingle
    doc, and a doc SHORTER than k tokens (whole-doc fallback)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        winnow_fingerprints,
    )

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "x y z x y z x y z x y z"),
        (3, "a b c"),
        (4, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect():
        got.setdefault(r["doc_id"], {})[r["fp"]] = (r["n_positions"], r["first_pos"])
    for did, text in rows:
        assert got.get(did) == _py_winnow(text), did
    assert len(got[2]) == 1  # periodic text collapses
    assert len(got[4]) == 1  # short-doc fallback still fingerprints


def test_winnow_guarantee_shared_run_forces_shared_fp(spark):
    """The winnowing guarantee: two docs sharing a token run of length
    >= w + k - 1 (here 6) MUST share a fingerprint, whatever the
    surrounding context."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        winnow_fingerprints,
    )

    shared = "p q r s t u"  # 6 tokens = w + k - 1
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"one two three {shared} four"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "shared run must force a shared fingerprint"


# ------------------------------------------------------- BPE training
def test_bpe_matches_python_reference(spark):
    """Hand corpus exercising the knife edges: overlapping same-symbol
    runs ('aaa'/'aaaa' -- greedy left-to-right merges alternate
    positions), count ties broken by lexicographic (x, y), multi-char
    merged symbols merging again, and the end-of-word marker merging
    into a final symbol."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        bpe_learn_merges,
    )

    def py_bpe(texts, rounds, marker="</w>"):
        from collections import Counter

        words = Counter()
        for t in texts:
            for w in t.lower().strip().split():
                words[w] += 1
        seqs = {w: [*w, marker] for w in words}
        merges = []
        for r in range(1, rounds + 1):
            pc = Counter()
            for w, seq in seqs.items():
                for i in range(len(seq) - 1):
                    pc[(seq[i], seq[i + 1])] += words[w]
            if not pc:
                break
            (x, y), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((r, x, y, cnt))
            for w, seq in seqs.items():
                out, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == x and seq[i + 1] == y:
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seqs[w] = out
        return merges

    texts = [
        "aaa aaaa abab low lower lowest",
        "low low low lower newest newest widest",
        "aaa abab abab banana bandana",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_learn_merges(df, "text", rounds=8)
    assert got == py_bpe(texts, 8)
    # Greedy run semantics pinned explicitly: 'aaaa' + marker after
    # round 1 ((a,a) merged at positions 0 and 2) contributes 'aa','aa'
    # -- so round 1's count over {aaa x2, aaa? ...} reflects overlaps.
    assert got[0][1:3] == ("a", "a")


# ------------------------------------------------------- survivorship
def test_golden_records_mode_ties_and_nulls(spark):
    """Consensus semantics a fixture dodges: a count tie resolves to
    the ASCENDING value, NULLs never win (non-null minority beats NULL
    majority), an all-NULL attribute yields NULL gold, and a singleton
    cluster survives as itself."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.fuzzyjoin import (
        golden_records,
    )

    rows = [
        # cluster 1: name tie (2x 'acme', 2x 'acme co') -> 'acme';
        # city: one non-null among nulls -> 'nyc'; zip all NULL -> NULL
        (1, "acme", None, None),
        (1, "acme", "nyc", None),
        (1, "acme co", None, None),
        (1, "acme co", None, None),
        # cluster 2: singleton
        (2, "solo", "la", "90001"),
    ]
    df = spark.createDataFrame(rows, "canonical long, name string, city string, zip string")
    got = {
        r["canonical"]: (
            r["n_members"], r["name_gold"], r["city_gold"], r["zip_gold"]
        )
        for r in golden_records(df, "canonical", ["name", "city", "zip"]).collect()
    }
    assert got == {
        1: (4, "acme", "nyc", None),
        2: (1, "solo", "la", "90001"),
    }


# ------------------------------------------------------------- BM25
def test_bm25_hand_case(spark):
    """Three-doc corpus, hand-computed BM25 (k1=1.2, b=0.75): the doc
    with two 'cat' hits outranks the longer doc with one; a doc with no
    query terms never appears; n_hit_terms counts matched TERMS, not
    occurrences."""
    import math

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        bm25_topk,
    )

    rows = [
        (1, "cat cat dog"),
        (2, "cat bird bird bird bird bird"),
        (3, "fish fish fish"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["doc_id"], r["score_fp"], r["n_hit_terms"])
        for r in bm25_topk(df, "doc_id", "text", ["cat", "dog"], topn=10).collect()
    ]

    def term_fp(tf, df_t, dl, n=3, total=12, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        s = idf * (tf * (k1 + 1.0)) / (
            tf + (k1 * (1.0 - b)) + (k1 * b) * dl / (total / n)
        )
        return math.floor(s * 1e6 + 0.5)

    want = [
        (1, term_fp(2, 2, 3) + term_fp(1, 1, 3), 2),
        (2, term_fp(1, 2, 6), 1),
    ]
    want.sort(key=lambda t: (-t[1], t[0]))
    assert got == want
    assert got[0][0] == 1  # two hits + shorter doc wins
    with pytest.raises(ValueError, match="at least one"):
        bm25_topk(df, "doc_id", "text", [])


def test_guard_message_for_wholly_null_vector(spark):
    """r10 review finding: size(NULL) is NULL, so the ragged branch's
    concat produced raise_error(NULL) -- a diagnostic that literally
    said 'null'.  A wholly-NULL vector must name the operator and
    column."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        gram_fixedpoint,
    )

    null_vec = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="gram_fixedpoint: embedding is NULL"):
        gram_fixedpoint(null_vec, scale=1000, dim=2).collect()
    with pytest.raises(Exception, match="kmeans_lloyd_fixedpoint: embedding is NULL"):
        kmeans_lloyd_fixedpoint(null_vec, k=1, iterations=1, dim=2).collect()


# ------------------------------------------------------- KL source drift
def test_kl_source_drift_hand_case(spark):
    """A source whose token mix equals the corpus mix has KL == 0
    exactly; a skewed source is strictly positive and matches the
    pure-Python twin (same nano fixed-point per-term rounding)."""
    import math

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        kl_source_drift,
    )

    rows = [
        ("balanced", "a a b b"),
        ("balanced2", "a a b b"),
        ("skewed", "a a a b"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r["source"]: (r["n_tokens"], r["n_terms"], r["kl_nano"])
        for r in kl_source_drift(df, "source", "text").collect()
    }

    def kl_nano(counts, corpus):
        n_s = sum(counts.values())
        n = sum(corpus.values())
        return sum(
            math.floor(
                (c / n_s) * math.log((c / n_s) / (corpus[t] / n)) * 1e9 + 0.5
            )
            for t, c in counts.items()
        )

    corpus = {"a": 7, "b": 5}
    assert got["balanced"] == (4, 2, kl_nano({"a": 2, "b": 2}, corpus))
    assert got["skewed"] == (4, 2, kl_nano({"a": 3, "b": 1}, corpus))
    assert got["skewed"][2] > 0
    # The two balanced sources have identical mixes and identical KL.
    assert got["balanced"] == got["balanced2"]
    # And a uniform corpus: every source == corpus mix -> KL 0 exactly.
    uni = spark.createDataFrame(
        [("s1", "x y"), ("s2", "x y")], "source string, text string"
    )
    for r in kl_source_drift(uni, "source", "text").collect():
        assert r["kl_nano"] == 0


# ------------------------------------------------------------ k-core
def test_kcore_hand_case_cascade_and_fixpoint(spark):
    """A triangle (1,2,3) plus a tail 3-4-5: at k=2 the tail peels in
    CASCADE (5 first, then 4) while the triangle survives with degree
    2 each; at k=3 everything dies (empty core, not an error); a large
    round budget early-exits at the fixpoint with identical output."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        kcore_bounded,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {
        r["node"]: r["deg"] for r in kcore_bounded(edges, k=2, rounds=5).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    got50 = {
        r["node"]: r["deg"] for r in kcore_bounded(edges, k=2, rounds=50).collect()
    }
    assert got50 == got
    assert kcore_bounded(edges, k=3, rounds=5).count() == 0


# ----------------------------------------------------- k-center greedy
def test_kcenter_hand_case(spark):
    """2-D points on a line (scale 10): seed = lowest id (at 0.0);
    round 2 must take the FARTHEST point (at 1.0, dist 200), round 3
    the midpoint (at 0.5, dist 50 to both ends); radius sequence is
    non-increasing after selection."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.clustering import (
        kcenter_greedy_fixedpoint,
    )

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [0.5, 0.5]),
            (3, [1.0, 1.0]),
            (4, [0.1, 0.1]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r["rank"], r["vec_id"], r["radius_fp"])
        for r in kcenter_greedy_fixedpoint(df, k=3, dim=2, scale=10)
        .orderBy("rank")
        .collect()
    ]
    # fp vectors: [0,0],[5,5],[10,10],[1,1]; d(1,3)=200, d(1,2)=50,
    # d(2,3)=50, d(1,4)=2.
    assert got == [(1, 1, 0), (2, 3, 200), (3, 2, 50)]


def test_kcenter_batched_identical(spark):
    """Certified-batch Gonzalez must reproduce the sequential selection
    EXACTLY for every batch size -- including t=1 (pure certification
    overhead), t covering the whole k in one pass, and a clustered
    geometry where the top-t candidates are near-duplicates of each
    other (the case naive batch selection gets wrong: picking both ends
    of one tight cluster instead of re-ranking after the first pick)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.clustering import (
        kcenter_batched_fixedpoint,
        kcenter_greedy_fixedpoint,
    )

    # two tight clusters + two isolated points: after picking one end of
    # the far cluster, its near-twin (still top-2 by stale distance)
    # must NOT be picked next.
    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [0.02, 0.0]),
            (3, [10.0, 10.0]),
            (4, [10.02, 10.0]),
            (5, [0.0, 9.0]),
            (6, [9.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    want = [
        (r["rank"], r["vec_id"], r["radius_fp"])
        for r in kcenter_greedy_fixedpoint(df, k=5, dim=2, scale=100)
        .orderBy("rank")
        .collect()
    ]
    for t in (1, 2, 3, 5):
        got = [
            (r["rank"], r["vec_id"], r["radius_fp"])
            for r in kcenter_batched_fixedpoint(df, k=5, dim=2, scale=100, batch=t)
            .orderBy("rank")
            .collect()
        ]
        assert got == want, f"batch={t}: {got} != {want}"


def test_kcenter_batched_exhaustion(spark):
    """All-duplicate corpus: selection stops after the seed (radius 0
    everywhere), same early-stop as the sequential operator."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.clustering import (
        kcenter_batched_fixedpoint,
    )

    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(1, 5)],
        "vec_id long, embedding array<double>",
    )
    rows = kcenter_batched_fixedpoint(df, k=3, dim=2, scale=10, batch=2).collect()
    assert [(r["rank"], r["vec_id"], r["radius_fp"]) for r in rows] == [(1, 1, 0)]


def test_kcenter_validates(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.clustering import (
        kcenter_greedy_fixedpoint,
    )

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty input"):
        kcenter_greedy_fixedpoint(df, k=2, dim=2)
    with pytest.raises(ValueError, match="k >= 1"):
        kcenter_greedy_fixedpoint(df, k=0, dim=2)


# --------------------------------------------------- IVM delta algebra
def test_ivm_join_delta_terms_product_rule(spark):
    """Stored state + the three delta terms equals the direct join of
    the merged sides (the product rule), the base term is NOT among
    the operator's output (IVM never rescans it), and the
    delta-with-delta row a naive 'delta join old' maintenance drops is
    present."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.maintenance import (
        ivm_join_delta_terms,
    )

    a0 = spark.createDataFrame([(1, "o1"), (2, "o2")], "k long, o string")
    da = spark.createDataFrame([(2, "o3"), (9, "o9")], "k long, o string")
    b0 = spark.createDataFrame([(1, "c1"), (2, "c2")], "k long, c string")
    db = spark.createDataFrame([(9, "c9")], "k long, c string")
    delta = sorted(
        (r["k"], r["o"], r["c"])
        for r in ivm_join_delta_terms(a0, da, b0, db, "k").collect()
    )
    state = sorted((r["k"], r["o"], r["c"]) for r in a0.join(b0, "k").collect())
    direct = sorted(
        (r["k"], r["o"], r["c"])
        for r in a0.unionByName(da).join(b0.unionByName(db), "k").collect()
    )
    assert sorted(state + delta) == direct
    assert (9, "o9", "c9") in delta  # the delta-with-delta term
    assert (1, "o1", "c1") not in delta  # base term stays in state


# --------------------------------------------- join cardinality audit
def test_join_cardinality_estimate_hand_case(spark):
    """topn=2 over a skewed key set exercises all four terms: head x
    head (k=1), head-A x tail-B containment (k=2 in A's head only),
    tail x tail uniform, and the exact actual; the audit must be exact
    when topn covers every key."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.skew import (
        join_cardinality_estimate,
    )

    # A freqs: 1->3, 2->2, 3->1, 4->1 ; B freqs: 1->2, 3->2, 5->1
    a = spark.createDataFrame([(1,)] * 3 + [(2,)] * 2 + [(3,)] + [(4,)], "jk long")
    b = spark.createDataFrame([(1,)] * 2 + [(3,)] * 2 + [(5,)], "jk long")
    row = join_cardinality_estimate(a, b, "jk", topn=2).collect()[0]
    # actual = f(1): 3*2 + f(3): 1*2 = 8
    assert row["actual_rows"] == 8
    # heads: TA={1:3,2:2}, TB={1:2,3:2}; rest A={3:1,4:1} rows2 keys2,
    # rest B={5:1} rows1 keys1.
    # t1 = 3*2 = 6; t2 (k=2): 2*(1//1)=2; t3 (k=3): 2*(2//2)=2;
    # t4 = 2*1 // 2 = 1 -> est 11, err = |11-8|*10000//8 = 3750
    assert (row["est_rows"], row["err_bp"]) == (11, 3750)
    # Full-coverage histogram -> estimate is exact.
    exact = join_cardinality_estimate(a, b, "jk", topn=10).collect()[0]
    assert exact["est_rows"] == exact["actual_rows"] == 8
    assert exact["err_bp"] == 0


# ------------------------------------------------------- phrase search
def test_phrase_search_hand_case(spark):
    """Overlapping occurrences count individually ('a a a' matches
    'a a' at positions 0 AND 1), longer chains require full adjacency
    (no match for 'a b c' when only 'a b' and 'b c' appear apart), and
    documents without the phrase are absent."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        phrase_search,
    )

    df = spark.createDataFrame(
        [
            (1, "a a a"),
            (2, "a b x b c"),
            (3, "a b c"),
            (4, "z z z"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["phrase"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "doc_id", "text", ["a a", "a b c"]).collect()
    }
    assert got == {
        ("a a", 1): (2, 0),
        ("a b c", 3): (1, 0),
    }
    with pytest.raises(ValueError, match="at least one"):
        phrase_search(df, "doc_id", "text", [])


# ------------------------------------------------------------ FD audit
def test_fd_violations_hand_case(spark):
    """X=1 maps to two Ys (violating, 2 images), X=2 to one, X=3 to
    one (duplicated rows collapse); 1 of 3 determinants violate ->
    3333 bp."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.skew import (
        fd_violations,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (3, "c"), (3, "c")],
        "x long, y string",
    )
    row = fd_violations(df, ["x"], "y").collect()[0]
    assert (
        row["n_determinants"], row["n_violating"],
        row["max_images"], row["violation_bp"],
    ) == (3, 1, 2, 3333)
    # A real key: zero violations, zero bp.
    key = fd_violations(df.select("x", "y").distinct().withColumn(
        "rid", F.monotonically_increasing_id()), ["rid"], "y").collect()[0]
    assert (key["n_violating"], key["violation_bp"]) == (0, 0)


# --------------------------------------------------- audio chunk plan
def test_audio_chunk_windows_hand_case(spark):
    """Window arithmetic a fixture might dodge: a stream shorter than
    the window yields NO chunks (tail dropped, not padded), an exact
    2-window stream yields exactly 2, and sample offsets follow the
    stream's own rate."""
    import pandas as pd

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.multimodal import (
        AUDIO_CHUNK_SCHEMA,
        chunk_audio_windows,
    )

    decoded = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "duration_ms": [1500, 3000, None],
                "sample_rate": [16000, 8000, 8000],
                "sha256_8": ["aaaaaaaa", "bbbbbbbb", "cccccccc"],
            }
        )
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["start_ms"], r["start_sample"], r["n_samples"]
        )
        for r in chunk_audio_windows(decoded, win_ms=2000, hop_ms=1000).collect()
    }
    # doc 1 (1.5s < 2s window): none; doc 3 (NULL duration): none.
    # doc 2 (3s at 8kHz): chunks at 0ms and 1000ms, 16000 samples each.
    assert got == {
        (2, 0): (0, 0, 16000),
        (2, 1): (1000, 8000, 16000),
    }


# ------------------------------------------------- mutual information
def test_mutual_information_independent_is_zero(spark):
    # 2x2 uniform: every cell matches independence exactly, ln(1) = 0.
    df = spark.createDataFrame(
        [(x, y) for x in ("a", "b") for y in (0, 1)],
        "x string, y long",
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        mutual_information,
    )

    [r] = mutual_information(df, [("x", "y")]).collect()
    assert (r["feature"], r["label"]) == ("x", "y")
    assert (r["n_rows"], r["n_cells"], r["mi_nano"]) == (4, 4, 0)


def test_mutual_information_perfect_dependence(spark):
    # y == x over a uniform binary x: MI = ln 2, split over two cells,
    # each rounded half-up to nano BEFORE the sum (the order-stable
    # fixed-point contract).
    import math

    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 1), ("b", 1)], "x string, y long"
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        mutual_information,
    )

    [r] = mutual_information(df, [("x", "y")]).collect()
    cell = math.floor(0.5 * math.log(2.0) * 1e9 + 0.5)
    assert (r["n_rows"], r["n_cells"], r["mi_nano"]) == (4, 2, 2 * cell)


def test_mutual_information_multi_pair_and_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [("a", 0, "u"), ("b", 1, "u")], "x string, y long, z string"
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        mutual_information,
    )

    rows = {
        (r["feature"], r["label"]): r["mi_nano"]
        for r in mutual_information(df, [("x", "y"), ("z", "y")]).collect()
    }
    # z is constant: knowing z says nothing about y -> MI exactly 0;
    # x determines y -> MI = ln 2 in per-cell nano rounding.
    import math

    cell = math.floor(0.5 * math.log(2.0) * 1e9 + 0.5)
    assert rows[("z", "y")] == 0
    assert rows[("x", "y")] == 2 * cell
    with _pytest.raises(ValueError):
        mutual_information(df, [])


# ------------------------------------------------ position attribution
def _ev(spark, rows):
    from datetime import datetime

    return spark.createDataFrame(
        [
            (uid, eid, datetime(2024, 1, 1, 0, mi), et, v)
            for (uid, eid, mi, et, v) in rows
        ],
        "user_id long, event_id long, ts timestamp,"
        " event_type string, value double",
    )


def test_attribution_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.timeseries import (
        position_attribution,
    )

    df = _ev(
        spark,
        [
            # user 1: two touches -> 50/50 of 1000 cents.
            (1, 10, 1, "view", 0.5),
            (1, 11, 2, "click", 0.5),
            (1, 12, 3, "purchase", 10.0),
            # user 2: five touches -> 400000, 66667, 66667, 66666,
            # 400000 micro of 200 cents (remainder 2 goes one micro
            # each to the earliest two middles); trailing view after
            # the purchase attributes nothing.
            (2, 20, 1, "view", 0.1),
            (2, 21, 2, "view", 0.1),
            (2, 22, 3, "click", 0.1),
            (2, 23, 4, "error", 0.1),
            (2, 24, 5, "signup", 0.1),
            (2, 25, 6, "purchase", 2.0),
            (2, 26, 7, "view", 0.1),
            # user 3: purchase with no prior touch -> nothing.
            (3, 30, 1, "purchase", 99.0),
        ],
    )
    got = {
        r["event_type"]: (r["n_touches"], r["attributed_microcents"])
        for r in position_attribution(df).collect()
    }
    assert got == {
        "view": (3, 1000 * 500000 + 200 * (400000 + 66667)),
        "click": (2, 1000 * 500000 + 200 * 66667),
        "error": (1, 200 * 66666),
        "signup": (1, 200 * 400000),
    }


def test_attribution_path_sums_are_exact(spark):
    # For every path length 1..8 the weights sum to exactly 1,000,000:
    # total attributed == cents * 1e6 with no rounding drift.
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.timeseries import (
        position_attribution,
    )

    rows = []
    for n in range(1, 9):
        uid = 100 + n
        for p in range(n):
            rows.append((uid, uid * 100 + p, p + 1, "view", 0.1))
        rows.append((uid, uid * 100 + 99, 50, "purchase", 1.23))
    out = position_attribution(_ev(spark, rows)).collect()
    assert sum(r["attributed_microcents"] for r in out) == 8 * 123 * 1000000
    assert sum(r["n_touches"] for r in out) == sum(range(1, 9))


def test_attribution_paths_reset_between_conversions(spark):
    # touch A, purchase 1, touch B, purchase 2: each purchase is
    # attributed only to ITS preceding touch (single-touch -> 100%).
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.timeseries import (
        position_attribution,
    )

    df = _ev(
        spark,
        [
            (7, 1, 1, "view", 0.1),
            (7, 2, 2, "purchase", 1.0),
            (7, 3, 3, "click", 0.1),
            (7, 4, 4, "purchase", 3.0),
        ],
    )
    got = {
        r["event_type"]: r["attributed_microcents"]
        for r in position_attribution(df).collect()
    }
    assert got == {"view": 100 * 1000000, "click": 300 * 1000000}


# ---------------------------------------------------- shapley / abtest
def test_shapley_hand_case_and_efficiency(spark):
    # Paths: {a} x3, {b} x1, {a,b} x2 conversions.  v(a)=3, v(b)=1,
    # v(ab)=6.  phi_a*2! = (v(a)-v(0)) + (v(ab)-v(b)) = 3+5 = 8;
    # phi_b*2! = 1+3 = 4; efficiency: sum == 2! * v(ab) = 12.
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        shapley_channel_attribution,
    )

    rows, eid = [], 0

    def path(uid, types):
        nonlocal eid
        for i, t in enumerate(types):
            eid += 1
            rows.append((uid, eid, i + 1, t, 1.0))

    for u in (1, 2, 3):
        path(u, ["a", "purchase"])
    path(4, ["b", "purchase"])
    for u in (5, 6):
        path(u, ["a", "b", "purchase"])
    df = _ev(spark, rows)
    got = {
        r["channel"]: r["phi_xnfact"]
        for r in shapley_channel_attribution(df, ["a", "b"]).collect()
    }
    assert got == {"a": 8, "b": 4}
    assert sum(got.values()) == 2 * 6  # efficiency: n! * v(all)

    # Dummy axiom: adding a never-touched channel c gives it exactly 0
    # and rescales the others by 3!/2!.
    got3 = {
        r["channel"]: r["phi_xnfact"]
        for r in shapley_channel_attribution(df, ["a", "b", "c"]).collect()
    }
    assert got3 == {"a": 24, "b": 12, "c": 0}


def test_shapley_validates(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        shapley_channel_attribution,
    )

    df = _ev(spark, [(1, 1, 1, "a", 1.0)])
    with pytest.raises(ValueError):
        shapley_channel_attribution(df, [])
    with pytest.raises(ValueError):
        shapley_channel_attribution(df, ["a", "a"])
    with pytest.raises(ValueError):
        shapley_channel_attribution(df, ["a", "purchase"])
    with pytest.raises(ValueError):
        shapley_channel_attribution(df, [f"c{i}" for i in range(9)])


def test_two_proportion_ztest_hand_case(spark):
    import math

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        two_proportion_ztest,
    )

    rows = [(0, 1), (0, 0), (0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (1, 0)]
    df = spark.createDataFrame(rows, "variant long, converted long")
    [r] = two_proportion_ztest(df, "variant", "converted").collect()
    assert (r["n_ctl"], r["conv_ctl"], r["n_trt"], r["conv_trt"]) == (
        4, 1, 4, 3,
    )
    p = 4.0 / 8.0
    z = (0.75 - 0.25) / math.sqrt(p * (1.0 - p) * (1.0 / 4.0 + 1.0 / 4.0))
    assert r["z_micro"] == math.floor(z * 1e6 + 0.5)
    assert r["lift_micro"] == 500000


def test_two_proportion_ztest_degenerate_pool_is_null(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        two_proportion_ztest,
    )

    df = spark.createDataFrame(
        [(0, 1), (1, 1)], "variant long, converted long"
    )
    [r] = two_proportion_ztest(df, "variant", "converted").collect()
    assert r["z_micro"] is None
    assert r["lift_micro"] == 0
