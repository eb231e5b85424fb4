"""Operator-level tests for the round-10 logistics-KPI batch:
distributed global prefix sums, item-item CF, and the weekday
convention the seasonal decomposition depends on.  Hand-computable
cases per the coverage4/5 discipline (oracle parity proves
fixture-scale equivalence; these prove semantics a fixture might
dodge -- cross-partition offsets, cosine tie-breaks, dow base)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.mining import (
    itemcf_topk,
)
from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.windows import (
    global_cumsum,
)


# ----------------------------------------------------- global_cumsum
def test_global_cumsum_matches_single_window(spark):
    # 40 rows, deterministic values with repeats; force MANY range
    # partitions so per-partition cumsums + offsets must compose
    # exactly across boundaries.
    rows = [(i, ((i * 7) % 13) + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in global_cumsum(
            df,
            order_by=[F.desc("v"), F.asc("k")],
            range_col="v",
            value_col="v",
            range_desc=True,
            num_partitions=8,
        ).collect()
    }
    ordered = sorted(rows, key=lambda t: (-t[1], t[0]))
    acc, want = 0, {}
    for k, v in ordered:
        acc += v
        want[k] = acc
    assert got == want


def test_global_cumsum_single_value_ties(spark):
    # All range_col values equal: one range partition takes everything;
    # the order_by tiebreak still yields a strict prefix sum.
    df = spark.createDataFrame([(i, 5) for i in range(6)], "k long, v long")
    got = {
        r["k"]: r["cum"]
        for r in global_cumsum(
            df,
            order_by=[F.desc("v"), F.asc("k")],
            range_col="v",
            value_col="v",
            range_desc=True,
            num_partitions=4,
        ).collect()
    }
    assert got == {i: 5 * (i + 1) for i in range(6)}


# ----------------------------------------------------------- item CF
def test_itemcf_hand_case(spark):
    import math

    # baskets: {a,b} x2, {a,c}, {a,b,c}: n_a=4 n_b=3 n_c=2,
    # ab=3 ac=2 bc=1; support 2 keeps ab, ac.
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "a"), (4, "b"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item"], r["rank"]): (r["neighbor"], r["n_ab"], r["cos_micro"])
        for r in itemcf_topk(df, "basket", "item", min_support=2, k=5).collect()
    }
    cos_ab = math.floor(3.0 / math.sqrt(4.0 * 3.0) * 1e6 + 0.5)
    cos_ac = math.floor(2.0 / math.sqrt(4.0 * 2.0) * 1e6 + 0.5)
    assert got == {
        ("a", 1): ("b", 3, cos_ab),
        ("a", 2): ("c", 2, cos_ac),
        ("b", 1): ("a", 3, cos_ab),
        ("c", 1): ("a", 2, cos_ac),
    }


def test_itemcf_tie_breaks_on_neighbor(spark):
    # Two neighbors with identical cosine: rank must order by neighbor
    # ascending, deterministically.
    rows = [
        (1, "x"), (1, "m"),
        (2, "x"), (2, "z"),
        (3, "x"), (3, "m"),
        (4, "x"), (4, "z"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = [
        (r["rank"], r["neighbor"])
        for r in itemcf_topk(df, "basket", "item", min_support=2, k=5)
        .filter(F.col("item") == "x")
        .collect()
    ]
    assert sorted(got) == [(1, "m"), (2, "z")]


# -------------------------------------------------- weekday convention
def test_weekday_is_monday_zero(spark):
    # seasonal_decompose relies on Spark weekday() == 0 for Monday and
    # on DuckDB (dayofweek+6)%7 matching it; pin the Spark side to
    # Python's date.weekday() (2024-01-01 was a Monday).
    import duckdb

    rows = spark.sql(
        "SELECT weekday(DATE'2024-01-01') AS mon,"
        " weekday(DATE'2024-01-07') AS sun"
    ).collect()[0]
    assert (rows["mon"], rows["sun"]) == (0, 6)
    d = duckdb.connect().execute(
        "SELECT (dayofweek(DATE '2024-01-01') + 6) % 7,"
        " (dayofweek(DATE '2024-01-07') + 6) % 7"
    ).fetchone()
    assert d == (0, 6)


def test_two_proportion_ztest_empty_variant_is_null(spark):
    # Every unit in one arm: ANSI Spark would throw on the unguarded
    # 0-division while DuckDB returns NULL -- both lift and z must be
    # NULL instead (r10 review finding).
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.experiments import (
        two_proportion_ztest,
    )

    df = spark.createDataFrame(
        [(1, 1), (1, 0)], "variant long, converted long"
    )
    [r] = two_proportion_ztest(df, "variant", "converted").collect()
    assert (r["n_ctl"], r["n_trt"]) == (0, 2)
    assert r["lift_micro"] is None and r["z_micro"] is None


def test_ql_dirichlet_rejects_nonpositive_mu(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.retrieval import (
        ql_dirichlet_topk,
    )

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ql_dirichlet_topk(df, "doc_id", "text", ["a"], mu=0.0)


# -------------------------------------------------------- geofence / dp
def test_point_in_polygon_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.spatial import (
        point_in_polygon_counts,
    )

    # Concave "L" polygon plus a disjoint triangle; points chosen to
    # exercise inside, outside, the concave notch, and both fences.
    fences = {
        "ell": [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)],
        "tri": [(10, 10), (14, 10), (12, 14)],
    }
    pts = spark.createDataFrame(
        [
            (1, 1, 1),    # inside ell (lower arm)
            (2, 3, 1),    # inside ell (right arm)
            (3, 3, 3),    # in the notch -> outside ell
            (4, 1, 3),    # inside ell (upper arm)
            (5, 12, 11),  # inside tri
            (6, 20, 20),  # outside everything
        ],
        "pid long, x long, y long",
    )
    got = {
        r["fence_id"]: r["n_inside"]
        for r in point_in_polygon_counts(pts, fences, "pid").collect()
    }
    assert got == {"ell": 3, "tri": 1}


def test_point_in_polygon_validates(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.spatial import (
        point_in_polygon_counts,
    )

    pts = spark.createDataFrame([(1, 0, 0)], "pid long, x long, y long")
    with pytest.raises(ValueError):
        point_in_polygon_counts(pts, {}, "pid")
    with pytest.raises(ValueError):
        point_in_polygon_counts(pts, {"bad": [(0, 0), (1, 1)]}, "pid")


def test_dp_noisy_counts_matches_closed_form(spark):
    import hashlib
    import math

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.privacy import (
        dp_noisy_counts,
    )

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [(None,)] * 3, "grp string"
    )
    got = {
        r["grp"]: (r["n_exact"], r["noisy_count_nano"])
        for r in dp_noisy_counts(df, ["grp"], epsilon=2.0, salt="s").collect()
    }

    def expect(key, n):
        h = int(hashlib.md5(f"s\x1f{key}".encode()).hexdigest()[1:16], 16)
        hh = h % (1 << 52)
        u = (hh + 0.5) / float(1 << 52)
        sign = 1.0 if hh >= (1 << 51) else -1.0
        noise = -0.5 * sign * math.log(1.0 - 2.0 * abs(u - 0.5))
        return n * 1000000000 + math.floor(noise * 1e9 + 0.5)

    # NULL keys hash via the explicit sentinel, never collapse onto the
    # bare salt (r10 review finding).
    assert got == {
        "a": (5, expect("a", 5)),
        "b": (2, expect("b", 2)),
        None: (3, expect("\x00null", 3)),
    }


def test_dp_noisy_counts_validates(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.privacy import (
        dp_noisy_counts,
    )

    df = spark.createDataFrame([("a",)], "grp string")
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["grp"], epsilon=0.0, salt="s")
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["grp"], epsilon=1.0, salt="s", sensitivity=0)


# ------------------------------------------- quantization / business days
def test_scalar_quantization_hand_case(spark):
    import math

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        scalar_quantization_audit,
    )

    # dim0 spans [0,1] with a midpoint; dim1 is constant (degenerate:
    # code 0, zero error, min == max).
    df = spark.createDataFrame(
        [(1, [0.0, 7.0]), (2, [1.0, 7.0]), (3, [0.5, 7.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["dim"]: (r["n_vecs"], r["min_nano"], r["max_nano"], r["sq_err_nano"])
        for r in scalar_quantization_audit(df, "vec_id", "embedding").collect()
    }
    # v=0.5 -> q=floor(0.5*255+0.5)=128, recon=128/255, per-dim err
    # rounds half-up to nano BEFORE the sum.
    e = 0.5 - 128.0 * 1.0 / 255.0
    mid_err = math.floor(e * e * 1e9 + 0.5)
    assert got == {
        0: (3, 0, 10**9, mid_err),
        1: (3, 7 * 10**9, 7 * 10**9, 0),
    }
    with pytest.raises(ValueError):
        scalar_quantization_audit(df, "vec_id", "embedding", levels=1)


def test_business_days_closed_form_matches_calendar(spark):
    from datetime import date, timedelta

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.timeseries import (
        sql_business_days,
    )

    # Closed form vs literal calendar count for every day across three
    # weeks straddling month ends, on BOTH engines.
    import duckdb

    epoch = date(1992, 1, 6)  # Monday
    days = [date(1995, 12, 25) + timedelta(d) for d in range(21)]

    def calendar_bd(d):
        return sum(
            1
            for i in range((d - epoch).days + 1)
            if (epoch + timedelta(i)).weekday() < 5
        )

    exprs = ", ".join(
        sql_business_days(f"DATE '{d}'", engine="spark") for d in days
    )
    spark_got = list(spark.sql(f"SELECT {exprs}").collect()[0])
    duck_exprs = ", ".join(
        sql_business_days(f"DATE '{d}'", engine="duckdb") for d in days
    )
    duck_got = list(duckdb.connect().execute(f"SELECT {duck_exprs}").fetchone())
    want = [calendar_bd(d) for d in days]
    assert spark_got == want
    assert duck_got == want


# ------------------------------------------------- rake / pruning audit
def test_rake_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        rake_keywords,
    )

    # "big data pipeline the data": phrases "big data pipeline" (len 3)
    # and "data" (len 1).  freq/deg: big 1/3, pipeline 1/3, data 2/4.
    df = spark.createDataFrame(
        [(1, "big data pipeline the data")], "doc_id long, text string"
    )
    got = {
        r["phrase"]: (r["n_words"], r["n_occurrences"], r["score_micro"])
        for r in rake_keywords(df, "doc_id", "text", ["the"]).collect()
    }
    assert got == {
        "big data pipeline": (3, 1, 3000000 + 2000000 + 3000000),
        "data": (1, 1, 2000000),
    }
    with pytest.raises(ValueError):
        rake_keywords(df, "doc_id", "text", [])


def test_rake_identical_phrases_merge(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.textstats import (
        rake_keywords,
    )

    df = spark.createDataFrame(
        [(1, "fast scan the fast scan"), (2, "fast scan")],
        "doc_id long, text string",
    )
    [r] = rake_keywords(df, "doc_id", "text", ["the"]).collect()
    # freq fast=3, deg=6 -> 2e6; scan identical; phrase occurs 3x.
    assert (r["phrase"], r["n_occurrences"], r["score_micro"]) == (
        "fast scan", 3, 4000000,
    )


def test_pruning_audit_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.layout import (
        pruning_audit,
    )

    # 8 rows; v interleaves so sorting by id leaves v spread across all
    # files, sorting by v isolates the probe range in one file.
    rows = [(i, [10, 90, 20, 80, 30, 70, 40, 60][i]) for i in range(8)]
    df = spark.createDataFrame(rows, "rid long, v long")
    got = {
        (r["layout"], r["pred_id"]): (r["files_total"], r["files_scanned"])
        for r in pruning_audit(
            df,
            "rid",
            {"by_id": "rid", "by_v": "v"},
            ["v"],
            [("lowv", "v", 10, 30)],
            rows_per_file=2,
        ).collect()
    }
    # by_v files: {10,20},{30,40},{60,70},{80,90} -> ranges [10,30]
    # overlap files 1 and 2.  by_id files: {10,90},{20,80},{30,70},
    # {40,60} -> first three overlap [10,30].
    assert got == {("by_v", "lowv"): (4, 2), ("by_id", "lowv"): (4, 3)}
    with pytest.raises(ValueError):
        pruning_audit(df, "rid", {"a": "rid"}, ["v"], [("p", "w", 0, 1)])
    with pytest.raises(ValueError):
        pruning_audit(
            df, "rid", {"a": "rid"}, ["v"], [("p", "v", 0, 1)],
            rows_per_file=0,
        )


# --------------------------------------------------------------- HDR
def test_hdr_bucket_bounds_cover_all_values(spark):
    # Every v in [0, 2048): the bucket's [lo, hi] must contain v, ids
    # must be monotone in v, and width/lo <= 1/16 for v >= 16.
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
        hdr_bounds_sql,
        hdr_bucket_sql,
    )

    b = hdr_bucket_sql("v", div="div")
    lo, hi = hdr_bounds_sql(f"({b})", div="div")
    rows = spark.range(0, 2048).selectExpr(
        "id AS v", f"{b} AS bucket", f"{lo} AS lo", f"{hi} AS hi"
    ).collect()
    prev_bucket = -1
    for r in sorted(rows, key=lambda r: r["v"]):
        assert r["lo"] <= r["v"] <= r["hi"], r
        assert r["bucket"] >= prev_bucket
        prev_bucket = r["bucket"]
        if r["v"] >= 16:
            assert (r["hi"] - r["lo"]) * 16 <= r["lo"]


def test_hdr_merge_equals_whole_corpus_sketch(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
        hdr_merge,
        hdr_registers,
    )

    df = spark.createDataFrame(
        [(d, (i * 37) % 500 + 1) for d in (1, 2, 3) for i in range(50)],
        "day long, v long",
    )
    merged = {
        r["bucket"]: r["cnt"]
        for r in hdr_merge(hdr_registers(df, ["day"], "v"), []).collect()
    }
    whole = {
        r["bucket"]: r["cnt"]
        for r in hdr_registers(df, [], "v").collect()
    }
    assert merged == whole


def test_hdr_quantiles_exact_rank_semantics(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.sketches import (
        hdr_quantiles,
        hdr_registers,
    )

    # values 1..10 (each its own bucket, < 16): p50 -> rank ceil(5) ->
    # value 5 exactly; p90 -> rank 9; p100 -> rank 10.
    df = spark.createDataFrame([(v,) for v in range(1, 11)], "v long")
    regs = hdr_registers(df, [], "v")
    got = {
        r["q_label"]: (r["bucket"], r["est_lo"], r["est_hi"])
        for r in hdr_quantiles(
            regs, [("p50", 1, 2), ("p90", 9, 10), ("p100", 1, 1)]
        ).collect()
    }
    assert got == {
        "p50": (5, 5, 5), "p90": (9, 9, 9), "p100": (10, 10, 10),
    }
    with pytest.raises(ValueError):
        hdr_quantiles(regs, [])
    with pytest.raises(ValueError):
        hdr_quantiles(regs, [("bad", 3, 2)])


# ------------------------------------------------------------- bitmaps
def test_bitmap_word_boundaries_and_dups(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.bloom import (
        bitmap_cardinality,
        bitmap_registers,
    )

    # ids straddle the 32-bit word boundary; duplicates count once.
    df = spark.createDataFrame(
        [("g", i) for i in (0, 31, 31, 32, 63, 64, 64)],
        "grp string, uid long",
    )
    regs = bitmap_registers(df, ["grp"], "uid")
    words = {r["word"]: r["bm"] for r in regs.collect()}
    assert words == {0: (1 << 0) | (1 << 31), 1: (1 << 0) | (1 << 31), 2: 1}
    [c] = bitmap_cardinality(regs, ["grp"]).collect()
    assert c["n_distinct"] == 5


def test_bitmap_registers_merge_exactly(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.bloom import (
        bitmap_registers,
    )
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        [(d, (i * 13) % 100) for d in (1, 2) for i in range(40)],
        "day long, uid long",
    )
    per_day = bitmap_registers(df, ["day"], "uid")
    merged = {
        r["word"]: r["bm"]
        for r in per_day.groupBy("word")
        .agg(F2.bit_or("bm").alias("bm"))
        .collect()
    }
    whole = {
        r["word"]: r["bm"]
        for r in bitmap_registers(df.select("uid"), [], "uid").collect()
    }
    assert merged == whole


def test_bitmap_pair_overlap_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.bloom import (
        bitmap_pair_overlap,
        bitmap_registers,
    )

    # A = {1,2,3,40}, B = {3,40,50}, C = {99} (disjoint from both).
    rows = [("A", u) for u in (1, 2, 3, 40)] + [
        ("B", u) for u in (3, 40, 50)
    ] + [("C", 99)]
    df = spark.createDataFrame(rows, "k string, uid long")
    regs = bitmap_registers(df, ["k"], "uid")
    got = {
        (r["k_a"], r["k_b"]): (r["n_both"], r["n_union"], r["jaccard_fp"])
        for r in bitmap_pair_overlap(regs, "k").collect()
    }
    assert got == {
        ("A", "B"): (2, 5, 400000),
        ("A", "C"): (0, 5, 0),
        ("B", "C"): (0, 4, 0),
    }


# ----------------------------------------------------------------- HITS
def test_hits_hand_case(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        hits_fixedpoint,
    )

    # 1->10, 2->10, 2->20 at scale 100, 2 rounds:
    # a1r: 10=200, 20=100 -> a1: 100, 50
    # h1r: 1=100, 2=150   -> h1: 66, 100
    # a2r: 10=166, 20=100 -> a2: 100, 60
    # h2r: 1=100, 2=160   -> h2: 62, 100
    e = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 20)], "src long, dst long"
    )
    hubs, auths = hits_fixedpoint(e, iterations=2, scale=100)
    assert {r["node"]: r["score_fp"] for r in hubs.collect()} == {
        1: 62, 2: 100,
    }
    assert {r["node"]: r["score_fp"] for r in auths.collect()} == {
        10: 100, 20: 60,
    }


def test_hits_validates(spark):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.graph import (
        hits_fixedpoint,
    )

    e = spark.createDataFrame([(1, 10)], "src long, dst long")
    with pytest.raises(ValueError):
        hits_fixedpoint(e, iterations=0)
    empty = e.filter("src < 0")
    with pytest.raises(ValueError):
        hits_fixedpoint(empty, iterations=1)


def test_theilsen_slope_rounding_is_half_up_both_signs(spark):
    # The (dy*1000 + sign*dx div 2) div dx formula must equal
    # round-half-up(dy*1000/dx) for positive AND negative dy.
    from pyspark.sql import functions as F2

    rows = [(3, 5), (3, -5), (7, 10), (7, -10), (4, 6), (4, -6)]
    df = spark.createDataFrame(rows, "dx long, dy long")
    got = df.select(
        F2.expr(
            "CAST((dy * 1000"
            " + (CASE WHEN dy >= 0 THEN 1 ELSE -1 END) * dx DIV 2)"
            " DIV dx AS BIGINT)"
        ).alias("s")
    ).collect()
    import math

    def half_up(x):
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    want = [half_up(dy * 1000 / dx) for dx, dy in rows]
    assert [r["s"] for r in got] == want


# ---------------------------------------------------------------- HRW
def test_hrw_minimal_disruption_property(spark):
    # Growing from N to N+1 shards: a key may move ONLY into the new
    # shard (HRW's defining property -- the old shards' weights are
    # unchanged, so a reassignment means the new shard won).
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.skew import (
        hrw_assignments,
    )

    keys = spark.range(0, 500).selectExpr("id AS k")
    a3 = {r["k"]: r["shard"] for r in hrw_assignments(keys, "k", 3).collect()}
    a4 = {r["k"]: r["shard"] for r in hrw_assignments(keys, "k", 4).collect()}
    moved = [k for k in a3 if a3[k] != a4[k]]
    assert moved, "some keys must move when a shard is added"
    assert all(a4[k] == 3 for k in moved)
    # and roughly 1/4 of the keys land on the new shard
    assert 500 // 8 < len(moved) < 500 // 2
    with pytest.raises(ValueError):
        hrw_assignments(keys, "k", 9)
