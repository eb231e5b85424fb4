"""Hand cases for the r11 operator batch: substring-span dedup,
SemDeDup, hard-negative mining, interval coalescing, z-value
interleave."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
    substring_duplicate_spans,
    substring_duplicate_stats,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
    hard_negative_topk,
    semantic_dedup,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.windows import (
    coalesce_intervals,
)


# --------------------------------------------------------------------------
# substring_duplicate_spans / _stats
# --------------------------------------------------------------------------

_SHARED = "alpha bravo charlie delta echo foxtrot"  # one shared 6-gram


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_spans_hand_case(spark):
    # doc 1 and 2 share the 6-token run at different offsets; doc 3 is
    # unique; doc 4 is too short to carry any 6-gram.
    df = _docs(
        spark,
        [
            (1, f"{_SHARED} golf hotel"),
            (2, f"zero one {_SHARED}"),
            (3, "nothing here repeats with anything else at all"),
            (4, "way too short"),
        ],
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in substring_duplicate_spans(df, "doc_id", "text", length=6).collect()
    }
    # doc 1: the shared run starts at 0 -> span [0, 5]
    assert out[1] == (0, 5, 6)
    # doc 2: shared run starts at token 2 -> span [2, 7]
    assert out[2] == (2, 7, 6)
    assert 3 not in out and 4 not in out


def test_substring_spans_merge_overlap_and_adjacency(spark):
    # Two docs share TWO 6-gram starts 0 and 1 (a 7-token shared run):
    # covered intervals [0,5] and [1,6] overlap -> ONE span [0,6].
    run = "a b c d e f g"
    df = _docs(spark, [(1, run + " tail1"), (2, run + " tail2")])
    spans = substring_duplicate_spans(df, "doc_id", "text", length=6).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert per_doc[1] == [(0, 6)]
    assert per_doc[2] == [(0, 6)]


def test_substring_stats_fraction(spark):
    run = "a b c d e f"
    # doc 1: 12 tokens, 6 duplicated -> 5000 bp exactly.
    df = _docs(
        spark,
        [(1, run + " u1 u2 u3 u4 u5 u6"), (2, run + " v1 v2 v3 v4 v5 v6")],
    )
    stats = {
        r["doc_id"]: r
        for r in substring_duplicate_stats(df, "doc_id", "text", length=6).collect()
    }
    assert stats[1]["n_tokens"] == 12
    assert stats[1]["dup_tokens"] == 6
    assert stats[1]["n_spans"] == 1
    assert stats[1]["dup_frac_bp"] == 5000


# --------------------------------------------------------------------------
# semantic_dedup
# --------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_semantic_dedup_chain_keeps_lowest_id(spark):
    # All vectors land in one cluster (n_clusters=1).  Chain: 0~1 and
    # 1~2 are near (cos >= thr) but 0~2 is not; the keep rule drops
    # BOTH 1 (sees 0) and 2 (sees 1) -- exactly the documented
    # single-pass chain semantics.
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)] + [0.0] * 2

    rows = [
        (0, unit(0.0), 0),
        (1, unit(0.5), 0),   # cos(0.5) ~ 0.878 to v0
        (2, unit(1.0), 0),   # cos(0.5) to v1, cos(1.0) ~ 0.540 to v0
    ]
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _emb(spark, rows), "vec_id", "embedding", n_clusters=1, threshold=0.8
        ).collect()
    }
    assert out[0]["is_kept"] == 1 and out[0]["dup_of"] == -1
    assert out[1]["is_kept"] == 0 and out[1]["dup_of"] == 0
    assert out[2]["is_kept"] == 0 and out[2]["dup_of"] == 1


def test_semantic_dedup_cross_cluster_pairs_never_compared(spark):
    # Identical vectors in DIFFERENT clusters survive: with
    # n_clusters=2 the two centroid seeds are the two distinct
    # vectors, each point joins its own seed, and the near-identical
    # pair (0, 2) lands apart -- SemDeDup compares within clusters
    # only, so both are kept.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 0),
        (2, [1.0, 0.001, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.001, 0.0], 0),
    ]
    out = semantic_dedup(
        _emb(spark, rows), "vec_id", "embedding", n_clusters=4, threshold=0.99
    )
    kept = sorted(r["vec_id"] for r in out.filter("is_kept = 1").collect())
    # 4 clusters, 4 vectors: every vector is its own centroid ->
    # singleton clusters -> nothing dropped.
    assert kept == [0, 1, 2, 3]


# --------------------------------------------------------------------------
# hard_negative_topk
# --------------------------------------------------------------------------


def test_hard_negative_excludes_same_label(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.999, 0.04], 0),   # same label: must NOT appear
        (2, [0.98, 0.2], 1),     # different label, closest negative
        (3, [0.0, 1.0], 1),      # different label, far
    ]
    emb = _emb(spark, rows)
    anchors = emb.filter(F.col("vec_id") == 0)
    out = hard_negative_topk(
        emb, anchors, "vec_id", "embedding", "label", k=2
    ).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(2, 1), (3, 2)]
    assert all(r["neg_label"] == 1 for r in out)


# --------------------------------------------------------------------------
# coalesce_intervals
# --------------------------------------------------------------------------


def test_coalesce_intervals_unique_starts_equivalent(spark):
    # With unique (key, start) input, the pre-aggregate-skipping fast
    # path must produce byte-identical spans to the general path.
    rows = [("A", 0, 6), ("A", 3, 9), ("A", 9, 12), ("A", 20, 22), ("B", 5, 8)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    slow = sorted(map(tuple, coalesce_intervals(df, "k", "s", "e").collect()))
    fast = sorted(
        map(tuple, coalesce_intervals(df, "k", "s", "e", unique_starts=True).collect())
    )
    assert slow == fast == [("A", 0, 12, 3), ("A", 20, 22, 1), ("B", 5, 8, 1)]


def test_coalesce_intervals_hand_case(spark):
    df = spark.createDataFrame(
        [
            # key A: [0,10) + [5,15) overlap; [15,20) touches -> one span
            ("A", 0, 10),
            ("A", 5, 15),
            ("A", 15, 20),
            # gap, then a lone interval
            ("A", 30, 35),
            # key B: duplicates on the same start collapse first
            ("B", 1, 4),
            ("B", 1, 6),
        ],
        "k string, s long, e long",
    )
    out = sorted(
        (r["k"], r["span_start"], r["span_end"], r["n_rows"])
        for r in coalesce_intervals(df, "k", "s", "e").collect()
    )
    assert out == [("A", 0, 20, 3), ("A", 30, 35, 1), ("B", 1, 6, 2)]


# --------------------------------------------------------------------------
# z-value interleave
# --------------------------------------------------------------------------


def test_zvalue_expr_matches_python_interleave(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.coverage6 import (
        _zvalue_expr,
    )

    def z_ref(a, b, w):
        out = 0
        for i in range(w):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = [(a, b) for a in (0, 1, 5, 4095) for b in (0, 2, 7, 4095)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", F.expr(_zvalue_expr("a", "b", 12, "div"))
    )
    for r in df.collect():
        assert r["z"] == z_ref(r["a"], r["b"], 12), (r["a"], r["b"])


def test_zvalue_expr_matches_morton_key(spark):
    # The oracle-replayable text builder and the Column-based write-path
    # builder must encode the SAME curve (first operand in even bits).
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.layout import (
        morton_key,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.coverage6 import (
        _zvalue_expr,
    )

    rows = [(a, b) for a in (0, 1, 3, 100, 4095) for b in (0, 2, 63, 4095)]
    df = (
        spark.createDataFrame(rows, "a long, b long")
        .withColumn("z_text", F.expr(_zvalue_expr("a", "b", 12, "div")))
        .withColumn("z_col", morton_key(F.col("a"), F.col("b"), bits=12))
    )
    assert df.filter("z_text <> z_col").count() == 0


def test_zvalue_locality_beats_linear_on_cross_dimension(spark):
    # The audit's premise in miniature: sort 16x16 grid points by
    # z-value into 32-point files; a band predicate on EITHER
    # dimension must touch < 40% of files (linear sort on a touches
    # 100% of files for a b-band).
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.coverage6 import (
        _zvalue_expr,
    )

    pts = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], "a long, b long"
    ).withColumn("z", F.expr(_zvalue_expr("a", "b", 4, "div")))
    from pyspark.sql import Window

    files = pts.withColumn(
        "f", ((F.row_number().over(Window.orderBy("z", "a", "b")) - 1) / 32).cast("long")
    ).groupBy("f").agg(
        F.min("a").alias("mna"), F.max("a").alias("mxa"),
        F.min("b").alias("mnb"), F.max("b").alias("mxb"),
    )
    zf = files.collect()
    total = len(zf)
    hit_b = sum(1 for r in zf if r["mnb"] <= 5 and 4 <= r["mxb"])
    assert total == 8
    assert hit_b <= 3  # z-order: b-band [4,5] touches a minority of files
