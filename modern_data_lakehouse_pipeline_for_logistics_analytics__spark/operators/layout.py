"""Data-layout maintenance (the OPTIMIZE / ZORDER analogs a 100 TB
lakehouse needs; SURVEY.md section 4 scale posture).

Z-ordering: multi-dimensional clustering so parquet min/max row-group
stats prune on EVERY clustered column, not just the lead sort key -- a
plain (x, y) sort gives perfect x-skipping and zero y-skipping; the
interleaved Morton key gives both columns ~sqrt(files) span reduction.

Compaction: streaming ingest and per-date overwrites leave small files;
read cost at scale is dominated by file-open overhead once file count
explodes.  ``compact_path`` rewrites to a bounded file count.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def morton_key(x_bucket: Column, y_bucket: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative int buckets into a
    single Morton (Z-curve) key -- pure bitwise expressions, fully
    codegen, no UDF."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key.bitwiseOR(
                F.shiftleft(F.shiftright(x_bucket, i).bitwiseAND(F.lit(1)), 2 * i)
            ).bitwiseOR(
                F.shiftleft(F.shiftright(y_bucket, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return key


def zorder_by(df: DataFrame, col_x: str, col_y: str, bits: int = 16) -> DataFrame:
    """Return ``df`` sorted by the Morton interleaving of the two columns'
    equi-width buckets (bucket bounds from one cheap min/max agg at
    plan-build time).  ``repartitionByRange`` on the key then
    ``sortWithinPartitions`` writes files whose min/max stats are tight
    on BOTH columns -- range-partition boundaries only affect file
    sizing, never correctness, so per-job sampling is harmless here
    (contrast global_ntile, where ranks must be exact)."""
    stats = df.agg(
        F.min(col_x).alias("xmin"),
        F.max(col_x).alias("xmax"),
        F.min(col_y).alias("ymin"),
        F.max(col_y).alias("ymax"),
    ).first()
    n = (1 << bits) - 1

    def bucket(c: str, lo, hi) -> Column:
        span = (hi - lo) or 1
        return F.least(
            F.lit(n),
            F.floor((F.col(c) - F.lit(lo)) / F.lit(span) * n).cast("long"),
        )

    key = morton_key(
        bucket(col_x, stats["xmin"], stats["xmax"]),
        bucket(col_y, stats["ymin"], stats["ymax"]),
        bits,
    )
    return df.withColumn("__z", key).sortWithinPartitions("__z")


def zorder_write(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` Z-ordered into ``n_files`` parquet files: range
    partition on the Morton key (so files tile the Z-curve), sort within
    partitions, drop the key."""
    z = zorder_by(df, col_x, col_y, bits)
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_rows: int = 1_000_000,
    sort_within: list[str] | None = None,
) -> int:
    """Rewrite a parquet path into ceil(rows / target_file_rows) files
    (staged sibling + swap).  Returns the output file count.  At scale run
    per partition directory.

    Swap order is crash-safe: write the compacted copy to a staging
    sibling, RENAME the live table aside, promote the staging copy, then
    delete the old copy.  There is no instant with no table at ``path``
    whose data exists nowhere else: a crash before the promote leaves the
    original (at ``path`` or at ``path.__compact_old``), a crash after it
    leaves the compacted table plus a stale ``.__compact_old`` to sweep.
    (The earlier rmtree-then-move ordering had a window where the only
    copy was the tmp dir under a non-table name.)  Local-fs rename
    semantics; on an object store use the table format's transactional
    OPTIMIZE instead -- documented limitation, not a scale path."""
    import os
    import shutil

    tmp = path.rstrip("/") + ".__compact_tmp"
    old = path.rstrip("/") + ".__compact_old"
    # Start from a clean state: leftovers of a prior crashed run must be
    # resolved BEFORE the rename-aside, or move(path, old) would NEST the
    # live table inside the stale dir and the final rmtree would delete
    # the recovery copy.  A stale tmp is always safe to discard (the live
    # table never moved); a stale old means a prior run crashed between
    # rename-aside and promote -- that copy may be the ONLY copy, so
    # refuse and make the operator decide.
    if os.path.exists(old):
        raise RuntimeError(
            f"stale {old} exists (prior compact crashed mid-swap); "
            "verify/restore the table at the live path, then remove it"
        )
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_file_rows))
    out = df.repartition(n_files)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode("overwrite").parquet(tmp)
    shutil.move(path, old)   # original intact under a recoverable name
    shutil.move(tmp, path)   # promote the compacted copy
    shutil.rmtree(old)       # only now is the original deleted
    return n_files


def compaction_bins(
    files: DataFrame,
    part_col: str,
    key_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """PLAN a small-file compaction (the OPTIMIZE planner half of
    ``compact_path``'s executor half): within each partition, walk files
    in ``key_col`` order and pack them into target-sized bins --
    ``bin = (running size BEFORE this file) div target`` -- so every bin
    except a partition's last holds >= target bytes and key ranges stay
    CONTIGUOUS per bin (compaction must not interleave sort ranges, or
    it destroys the min/max pruning the layout bought).

    Output per bin: ``part, bin, n_files, bin_bytes, first_key,
    last_key``.  Deterministic integer arithmetic end to end (running
    sum + truncating div), so the plan itself is oracle-verifiable --
    and idempotent: replanning after a partial run reproduces the same
    remaining bins.

    Scale shape: ONE window (running sum partitioned by the partition
    column -- file-inventory rows, millions at most, never data rows)
    plus one map-side-combinable groupBy.  The planner reads the
    inventory only; the executor moves the bytes."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    binned = files.withColumn("__before", before).withColumn(
        "bin", F.expr(f"__before div {target_bytes}").cast("long")
    )
    return (
        binned.groupBy(part_col, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(size_col).cast("long").alias("bin_bytes"),
            F.min(key_col).alias("first_key"),
            F.max(key_col).alias("last_key"),
        )
    )


def pruning_audit(
    df: DataFrame,
    id_col: str,
    layouts: dict[str, str],
    probe_cols: list[str],
    probes: list[tuple[str, str, int, int]],
    rows_per_file: int = 1000,
) -> DataFrame:
    """Sort-key selection audit: for each candidate layout (a LONG sort
    column), simulate writing the table in ``rows_per_file`` files
    sorted by that key, record each file's min/max zone map per probe
    column, and report how many files each workload predicate (``(id,
    col, lo, hi)`` closed ranges) would have to scan -- the measurement
    behind "should this table be clustered by custkey or by date", made
    BEFORE rewriting a single byte.

    Exactness: file assignment comes from an exact global rank
    (``windows.global_cumsum`` of ones -- the two-phase scheme, no
    single-task sort); zone maps and overlap tests are BIGINT
    comparisons; the scan share is half-up micro by integer div.

    Scale shape: one value-ranged shuffle per candidate layout (the
    rank), a map-side-combinable file aggregate (rows/1000 output
    rows), then everything downstream operates on file-count-sized
    frames (stack + broadcast probe join).  The audit never rewrites
    data.

    Output: ``layout, pred_id, files_total, files_scanned,
    scan_share_micro``.
    """
    from functools import reduce

    from .windows import global_cumsum

    if rows_per_file < 1:
        raise ValueError(f"rows_per_file must be >= 1, got {rows_per_file}")
    bad = [c for _, c, _, _ in probes if c not in probe_cols]
    if bad:
        raise ValueError(f"probes reference non-probe columns: {bad}")
    spark = df.sparkSession
    # Each layout's global rank runs the split probe, the offsets
    # collect, AND the file aggregate over the input (~3 jobs x
    # len(layouts) consumers) -- cache the projected input HERE so a
    # direct caller is not re-scanned ~9 times (r10 review finding).
    from .dedup import _cache_aged

    needed = sorted({id_col, *layouts.values(), *probe_cols})
    df = _cache_aged("layout.pruning_audit", df.select(*needed))
    probe_df = spark.createDataFrame(
        [(pid, c, int(lo), int(hi)) for pid, c, lo, hi in probes],
        "pred_id string, col string, lo long, hi long",
    )
    stack_args = ", ".join(
        f"'{c}', __mn_{c}, __mx_{c}" for c in probe_cols
    )
    outs = []
    for lname, scol in layouts.items():
        ranked = global_cumsum(
            df.withColumn("__one", F.lit(1)),
            order_by=[F.asc(scol), F.asc(id_col)],
            range_col=scol,
            value_col="__one",
            alias="__rk",
        )
        files = (
            ranked.withColumn(
                "__file", F.expr(f"(__rk - 1) div {int(rows_per_file)}")
            )
            .groupBy("__file")
            .agg(
                *[
                    f
                    for c in probe_cols
                    for f in (
                        F.min(c).cast("long").alias(f"__mn_{c}"),
                        F.max(c).cast("long").alias(f"__mx_{c}"),
                    )
                ]
            )
        )
        long_files = files.select(
            "__file",
            F.expr(
                f"stack({len(probe_cols)}, {stack_args}) AS (col, mn, mx)"
            ),
        )
        res = (
            long_files.join(F.broadcast(probe_df), "col")
            .groupBy("pred_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("files_total"),
                F.sum(
                    F.when(
                        (F.col("lo") <= F.col("mx"))
                        & (F.col("hi") >= F.col("mn")),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("files_scanned"),
            )
            .select(
                F.lit(lname).alias("layout"),
                "pred_id",
                "files_total",
                "files_scanned",
                F.expr(
                    "CAST((2 * files_scanned * 1000000 + files_total)"
                    " DIV (2 * files_total) AS BIGINT)"
                ).alias("scan_share_micro"),
            )
        )
        outs.append(res)
    return reduce(lambda a, b: a.unionByName(b), outs)
