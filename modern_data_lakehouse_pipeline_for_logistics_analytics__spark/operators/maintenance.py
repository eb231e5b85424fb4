"""Lakehouse maintenance operators: upsert (MERGE) and SCD2 dimension
building.

The reference's only update mechanism is whole-partition overwrite
(`Silver_tranformation.py:121`, SURVEY.md T4).  Real lakehouse tables need
row-level upsert and history tracking; with Delta/Iceberg these map to
``MERGE INTO`` -- here they are expressed as pure DataFrame plans so they
run on any storage, and swap to the native MERGE where a table format is
available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE semantics: update matched keys with the update row, keep
    unmatched target rows, insert unmatched update rows.

    Columns must be identical between the two frames.  Implemented as a
    full-outer join on the key with per-column COALESCE(update, target)
    -- one shuffle; at scale, pre-bucket both sides on the key.
    """
    if set(target.columns) != set(updates.columns):
        raise ValueError("merge_upsert requires identical columns")
    cols = [c for c in target.columns if c != key]
    t = target.select(F.col(key).alias("__tk"), *[F.col(c).alias(f"__t_{c}") for c in cols])
    u = updates.select(F.col(key).alias("__uk"), *[F.col(c).alias(f"__u_{c}") for c in cols])
    j = t.join(u, t["__tk"] == u["__uk"], "full_outer")
    return j.select(
        F.coalesce(F.col("__uk"), F.col("__tk")).alias(key),
        *[
            F.when(F.col("__uk").isNotNull(), F.col(f"__u_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in cols
        ],
    )


def scd2_from_events(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an event history:
    one validity interval per (key, consecutive run of equal ``attr``).

    Output: ``<key>, <attr>, valid_from, valid_to, is_current`` --
    ``valid_to`` is null on the open interval.  One shuffle on the key;
    runs collapse via the lag-change-flag + running-sum island pattern.
    """
    w = Window.partitionBy(key).orderBy(ts)
    changed = (
        F.lag(F.col(attr)).over(w).isNull()
        | (F.col(attr) != F.lag(F.col(attr)).over(w))
    ).cast("int")
    runs = (
        df.select(key, attr, ts)
        .withColumn("__chg", changed)
        .withColumn("__run", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    intervals = runs.groupBy(key, "__run", attr).agg(F.min(ts).alias("valid_from"))
    w2 = Window.partitionBy(key).orderBy("valid_from")
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, attr, "valid_from", "valid_to", "is_current")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str,
) -> DataFrame:
    """Incremental SCD2 MERGE: apply one batch of attribute updates to a
    live type-2 dimension (the other half of ``scd2_from_events``, which
    REBUILDS from full history -- this maintains an existing dim without
    reprocessing it).

    ``dim`` carries ``key, attrs..., valid_from, valid_to, is_current``;
    ``updates`` carries ``key, attrs..., <ts_col>``.  Per key the LATEST
    update wins (id tie-break); an update whose tracked attrs equal the
    open row's is a no-op (no spurious version).  Changed keys close the
    open row at the update timestamp and insert a new open row; unseen
    keys insert their first open row.

    Scale shape: closed history passes through UNTOUCHED (no shuffle --
    at scale that's almost the whole dim), and only the open slice joins
    the update batch (typically small -> broadcast-eligible).  Output:
    same schema as ``dim``.
    """
    w = Window.partitionBy(key).orderBy(F.desc(ts_col), F.desc(key))
    latest = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key, *attrs, F.col(ts_col).alias("__uts"))
    )
    history = dim.filter(~F.col("is_current"))
    open_rows = dim.filter(F.col("is_current"))

    u_cols = {c: f"__u_{c}" for c in attrs}
    u = latest.select(
        F.col(key), F.col("__uts"), *[F.col(c).alias(a) for c, a in u_cols.items()]
    )
    j = open_rows.join(u, key, "full_outer")
    same = F.struct(*[F.col(c) for c in attrs]).eqNullSafe(
        F.struct(*[F.col(a) for a in u_cols.values()])
    )
    has_open = F.col("valid_from").isNotNull()
    has_upd = F.col("__uts").isNotNull()

    unchanged_open = j.filter(has_open & (~has_upd | same)).select(
        key, *attrs, "valid_from", "valid_to", F.lit(True).alias("is_current")
    )
    closed_out = j.filter(has_open & has_upd & ~same).select(
        key,
        *attrs,
        "valid_from",
        F.col("__uts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    new_open = j.filter(has_upd & (~has_open | ~same)).select(
        key,
        *[F.col(a).alias(c) for c, a in u_cols.items()],
        F.col("__uts").alias("valid_from"),
        F.lit(None).cast(dict(dim.dtypes)["valid_to"]).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out_cols = [key, *attrs, "valid_from", "valid_to", "is_current"]
    return (
        history.select(*out_cols)
        .unionByName(unchanged_open)
        .unionByName(closed_out)
        .unionByName(new_open)
    )


def merge_agg_state(
    state: DataFrame,
    batch: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Incremental aggregate maintenance: fold a new batch into a
    persisted per-key aggregate STATE table (count / sum / min / max)
    without reprocessing history -- the gold-layer pattern when full
    recompute over years of data is off the table.

    Works because these aggregates are MERGEABLE: the state row and the
    batch's partial aggregate combine exactly (count+count, sum+sum,
    min(min), max(max)).  AVG derives as sum/count at read time -- never
    store it, it does not merge.  The batch aggregates partial map-side
    first, so the union-aggregate shuffles one row per touched key, not
    per event.  State schema: ``keys..., cnt, total, vmin, vmax``.
    """
    batch_agg = batch.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col(value_col)).alias("total"),
        F.min(F.col(value_col)).alias("vmin"),
        F.max(F.col(value_col)).alias("vmax"),
    )
    return (
        state.select(*keys, "cnt", "total", "vmin", "vmax")
        .unionByName(batch_agg)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    compare_cols: list[str],
    include_equal: bool = False,
) -> DataFrame:
    """Row-level reconciliation of two tables (migration validation,
    replica drift detection): per key, ``only_in_a`` / ``only_in_b`` /
    ``changed`` (and ``equal`` when ``include_equal``).

    Each side collapses to ``(key, md5(compared columns))`` map-side
    BEFORE the full-outer join, so the shuffle carries a digest per row,
    never the row payload -- at 100 TB that is the difference between
    shuffling keys+32-byte hashes and shuffling two whole tables.  The
    digest uses an explicit NULL sentinel and a field separator, so
    ``(NULL, 'x')`` vs ``('x', NULL)`` and ``('a','bc')`` vs ``('ab','c')``
    are distinct.  Cross-engine exact (md5 of the same canonical string).
    ``key`` must be unique on each side (a reconciliation key by
    definition) -- duplicate keys would cross-product in the full-outer
    join and over-report.  Output: ``<key>, diff_status``.
    """
    def canon(df: DataFrame, side: str) -> DataFrame:
        digest = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in compare_cols
                ],
            )
        )
        return df.select(F.col(key).alias(f"{side}_k"), digest.alias(f"{side}_h"))

    j = canon(a, "a").join(
        canon(b, "b"), F.col("a_k") == F.col("b_k"), "full_outer"
    )
    status = (
        F.when(F.col("b_k").isNull(), "only_in_a")
        .when(F.col("a_k").isNull(), "only_in_b")
        .when(F.col("a_h") != F.col("b_h"), "changed")
        .otherwise("equal")
    )
    out = j.select(
        F.coalesce(F.col("a_k"), F.col("b_k")).alias(key),
        status.alias("diff_status"),
    )
    return out if include_equal else out.filter(F.col("diff_status") != "equal")


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    ts_col: str = "ts",
) -> DataFrame:
    """Apply a CDC change feed (Debezium/DMS shape) to a snapshot:
    ``changes`` carries the target's columns plus ``op`` in
    ``('I','U','D')`` and an event timestamp.  The LATEST change per key
    wins (ts order; ties break D > U > I so a same-timestamp
    delete+update pair resolves deterministically); a winning D removes
    the key, a winning I/U upserts its payload -- the delete path
    ``merge_upsert`` alone cannot express.

    One window over the (small) change batch + the ``merge_upsert``
    full-outer join + an anti join for deletes; the target never scans
    twice.  Output: the new snapshot, same schema as ``target``.
    """
    op_rank = (
        F.when(F.col(op_col) == "D", 3)
        .when(F.col(op_col) == "U", 2)
        .otherwise(1)
    )
    # Final tie-break over the payload columns: two changes with equal
    # (ts, op) must still resolve identically on every run -- row_number
    # over an incomplete ordering would pick per-run arbitrarily.
    payload_tb = [
        F.desc(c) for c in changes.columns if c not in (key, op_col, ts_col)
    ]
    w = Window.partitionBy(key).orderBy(F.desc(ts_col), op_rank.desc(), *payload_tb)
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    payload_cols = [c for c in target.columns]
    deletes = latest.filter(F.col(op_col) == "D").select(F.col(key))
    upserts = latest.filter(F.col(op_col) != "D").select(*payload_cols)
    survived = target.join(deletes, key, "left_anti")
    return merge_upsert(survived, upserts, key)


def state_asof(
    target: DataFrame,
    changes: DataFrame,
    asof_ts,
    key: str,
    op_col: str = "op",
    ts_col: str = "ts",
) -> DataFrame:
    """Time travel over a CDC feed: reconstruct the snapshot AS OF
    ``asof_ts`` by applying only the changes at or before it -- the
    query engines call this ``VERSION AS OF`` / ``TIMESTAMP AS OF``;
    with a base snapshot plus retained change feed it is one filtered
    ``apply_changes``, no stored versions needed.  The filter prunes the
    feed BEFORE the window/merge, so cost scales with the changes up to
    the cutoff, never the full feed."""
    from pyspark.sql import functions as F

    return apply_changes(
        target,
        changes.filter(F.col(ts_col) <= asof_ts),
        key=key,
        op_col=op_col,
        ts_col=ts_col,
    )


def ivm_join_delta_terms(
    a0: DataFrame,
    da: DataFrame,
    b0: DataFrame,
    db: DataFrame,
    on: str | list[str],
) -> DataFrame:
    """Incremental view maintenance for an inner-join view under
    INSERTS on both sides: the product rule

        (A0 ∪ ΔA) ⋈ (B0 ∪ ΔB)
          = A0⋈B0  ∪  ΔA⋈B0  ∪  A0⋈ΔB  ∪  ΔA⋈ΔB

    returns ONLY the three delta terms -- the rows a materialized
    join view GAINS from the new batch.  The A0⋈B0 base term is the
    view's existing stored state and is deliberately NOT recomputed
    here (an earlier draft unioned it in, contradicting the IVM
    contract -- r10 review finding): at 100 TB the whole point is that
    ΔA⋈B0 and A0⋈ΔB each probe one full side with a small delta
    (broadcast when small; AQE reads the delta's runtime size) and
    ΔA⋈ΔB is delta-by-delta.  A downstream aggregate view folds these
    term rows into its running state (see ``merge_agg_state``).

    Inserts only (the lakehouse append path); updates/deletes compose
    this with ``apply_changes``'s keyed CDC instead."""
    return (
        da.join(b0, on)
        .unionByName(a0.join(db, on))
        .unionByName(da.join(db, on))
    )
