"""Z-order clustering + compaction: the layout ops must demonstrably
tighten per-file min/max spans on BOTH clustered columns (that's the
entire point -- a lexicographic sort only prunes the lead column)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.layout import (
    compact_path,
    zorder_write,
)


def _file_spans(spark, path, col):
    """(max-min) per parquet file for a column, as fraction of the full range."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    spans = (
        df.groupBy("__f")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .collect()
    )
    full = df.agg(F.max(col) - F.min(col)).first()[0]
    return [r.span / full for r in spans]


def test_zorder_tightens_both_columns(spark, tmp_path):
    # 64x64 uniform grid -> 4096 points, written as 16 z-ordered files
    pts = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath = str(tmp_path / "z")
    zorder_write(pts, zpath, "x", "y", n_files=16)

    # baseline: lexicographic (x, y) sort into the same file count
    lpath = str(tmp_path / "lex")
    pts.repartitionByRange(16, "x", "y").sortWithinPartitions("x", "y").write.parquet(lpath)

    zx, zy = _file_spans(spark, zpath, "x"), _file_spans(spark, zpath, "y")
    lx, ly = _file_spans(spark, lpath, "x"), _file_spans(spark, lpath, "y")
    # lexicographic: x prunes well but y spans ~the whole range per file
    assert sum(ly) / len(ly) > 0.9
    # z-order: BOTH columns' average span is bounded well below full range
    assert sum(zx) / len(zx) < 0.5, f"x spans too wide: {sorted(zx)[-3:]}"
    assert sum(zy) / len(zy) < 0.5, f"y spans too wide: {sorted(zy)[-3:]}"
    # and no rows were lost or duplicated
    assert spark.read.parquet(zpath).count() == 64 * 64


def test_compact_path_bounds_file_count(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(1000).repartition(37).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*.parquet")) == 37
    n = compact_path(spark, path, target_file_rows=500)
    assert n == 2
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == 2
    assert spark.read.parquet(path).count() == 1000


def test_compact_path_no_staging_leftovers(spark, tmp_path):
    path = str(tmp_path / "clean")
    spark.range(100).write.parquet(path)
    compact_path(spark, path, target_file_rows=1000)
    assert glob.glob(f"{path}.__compact_*") == []
    assert spark.read.parquet(path).count() == 100


def test_compact_path_crash_window_recoverable(spark, tmp_path, monkeypatch):
    """A crash at ANY point of the swap must leave a complete copy of the
    data on disk.  Simulate the worst case -- dying during the final
    cleanup -- and check the promoted table is live and the original
    still exists under the recovery name (the pre-fix rmtree-then-move
    ordering had already destroyed the only copy at this point)."""
    import shutil

    path = str(tmp_path / "crashy")
    spark.range(500).repartition(9).write.parquet(path)

    real_rmtree = shutil.rmtree

    def dying_rmtree(p, *a, **kw):
        raise OSError("simulated crash during old-copy cleanup")

    monkeypatch.setattr(shutil, "rmtree", dying_rmtree)
    try:
        compact_path(spark, path, target_file_rows=500)
    except OSError:
        pass
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    # Promoted table is live and complete...
    assert spark.read.parquet(path).count() == 500
    # ...and the original survives under the recovery name.
    assert spark.read.parquet(f"{path}.__compact_old").count() == 500


def test_compact_path_refuses_stale_old_sweeps_stale_tmp(spark, tmp_path):
    """Leftovers of a crashed run must be resolved at entry: a stale
    __compact_old may be the only copy (refuse loudly); a stale
    __compact_tmp never is (sweep it and proceed)."""
    import os

    import pytest

    path = str(tmp_path / "t")
    spark.range(100).write.parquet(path)

    # Stale tmp: swept, compact proceeds normally.
    os.makedirs(path + ".__compact_tmp/junk")
    assert compact_path(spark, path, target_file_rows=50) == 2
    assert not os.path.exists(path + ".__compact_tmp")
    assert spark.read.parquet(path).count() == 100

    # Stale old: refuse before touching anything.
    os.makedirs(path + ".__compact_old")
    with pytest.raises(RuntimeError, match="__compact_old"):
        compact_path(spark, path, target_file_rows=50)
    assert spark.read.parquet(path).count() == 100


def test_scd2_apply_versioning_rules(spark):
    """Multi-update batches: latest-per-key wins; no-op updates create no
    version; changed keys close at the update ts; history passes through
    untouched; new keys open their first interval."""
    from pyspark.sql import functions as F

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.maintenance import (
        scd2_apply,
    )

    dim = spark.createDataFrame(
        [
            # k=1: one closed + one open version
            (1, "A", "2022-01-01 00:00:00", "2023-01-01 00:00:00", False),
            (1, "B", "2023-01-01 00:00:00", None, True),
            # k=2: open only
            (2, "X", "2023-01-01 00:00:00", None, True),
        ],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "k", "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )
    updates = spark.createDataFrame(
        [
            (1, "C", "2024-01-01 00:00:00"),   # superseded by the later B->D
            (1, "D", "2024-06-01 00:00:00"),   # latest per key wins
            (2, "X", "2024-06-01 00:00:00"),   # no-op: same attr
            (3, "N", "2024-06-01 00:00:00"),   # new key
        ],
        "k long, attr string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = scd2_apply(dim, updates, key="k", attrs=["attr"], ts_col="ts")
    rows = {(r.k, r.attr, bool(r.is_current)): r for r in out.collect()}
    assert len(rows) == 5
    # history untouched
    assert (1, "A", False) in rows
    # k=1 open B closed at the LATEST update's ts, new open D
    closed = rows[(1, "B", False)]
    assert str(closed.valid_to) == "2024-06-01 00:00:00"
    assert (1, "D", True) in rows and rows[(1, "D", True)].valid_to is None
    # k=2 no-op: still exactly one open X with the ORIGINAL valid_from
    assert str(rows[(2, "X", True)].valid_from) == "2023-01-01 00:00:00"
    # new key opens
    assert (3, "N", True) in rows


def test_merge_agg_state_multiple_folds(spark):
    """Folding three batches one at a time equals one aggregate over the
    union (mergeability), including a batch introducing a NEW key."""
    from pyspark.sql import functions as F

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.maintenance import (
        merge_agg_state,
    )

    batches = [
        [("a", 10), ("a", 2), ("b", 5)],
        [("a", 7)],
        [("c", 1), ("b", -3)],
    ]
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")  # noqa: E731
    state = mk([]).groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("v").alias("total"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    for rows in batches:
        state = merge_agg_state(state, mk(rows), keys=["k"], value_col="v")
    got = {(r.k): (r.cnt, r.total, r.vmin, r.vmax) for r in state.collect()}
    assert got == {
        "a": (3, 19, 2, 10),
        "b": (2, 2, -3, 5),
        "c": (1, 1, 1, 1),
    }


def test_table_diff_null_and_boundary_semantics(spark):
    """NULL vs 'x' column swaps are CHANGED (sentinel separates them),
    concat boundaries don't collide ('a','bc' vs 'ab','c'), equal rows
    are excluded by default and included on request."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.maintenance import (
        table_diff,
    )

    a = spark.createDataFrame(
        [(1, None, "x"), (2, "a", "bc"), (3, "same", "same"), (4, "gone", "gone")],
        "k long, c1 string, c2 string",
    )
    b = spark.createDataFrame(
        [(1, "x", None), (2, "ab", "c"), (3, "same", "same"), (5, "new", "new")],
        "k long, c1 string, c2 string",
    )
    out = {r.k: r.diff_status for r in table_diff(a, b, "k", ["c1", "c2"]).collect()}
    assert out == {1: "changed", 2: "changed", 4: "only_in_a", 5: "only_in_b"}
    full = {
        r.k: r.diff_status
        for r in table_diff(a, b, "k", ["c1", "c2"], include_equal=True).collect()
    }
    assert full[3] == "equal" and len(full) == 5


def test_apply_changes_delete_and_tie_semantics(spark):
    """Latest change per key wins; same-timestamp delete+update resolves
    to DELETE (op precedence); inserts for existing keys behave as
    upserts; unchanged keys pass through."""
    from pyspark.sql import functions as F

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.maintenance import (
        apply_changes,
    )

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", "U", "2024-01-02 00:00:00"),  # plain update
            (2, None, "D", "2024-01-02 00:00:00"),  # delete
            (2, "zzz", "U", "2024-01-02 00:00:00"), # SAME ts: D must win
            (3, "c1", "U", "2024-01-01 00:00:00"),  # superseded...
            (3, "c2", "U", "2024-01-03 00:00:00"),  # ...by this one
            (5, "e", "I", "2024-01-02 00:00:00"),   # new key
        ],
        "k long, v string, op string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.k: r.v for r in apply_changes(target, changes, key="k").collect()}
    assert got == {1: "a2", 3: "c2", 4: "d", 5: "e"}
