"""Apache Iceberg integration (SURVEY.md section 1.4; BASELINE approach
"Spark SQL over Delta/Iceberg" -- the Iceberg half, twin of
``sources/delta.py``).

Import-gated the same way Delta is: every entry point works without the
``iceberg-spark-runtime`` jar by falling back to the plain-parquet
equivalent, so the engine runs identically in this sandbox (no Iceberg
jar) and on a cluster with Iceberg, where it gains:

  - snapshot-isolated overwrites and time travel via the metadata tree
    (``metadata/*.metadata.json`` + manifest lists);
  - native ``MERGE INTO`` row-level upsert (copy-on-write or
    merge-on-read per table property) replacing the staged full-rewrite
    fallback shared with Delta;
  - hidden partitioning (partition transforms live in metadata, so
    writers/readers never hand-maintain partition columns).

Availability differs from Delta in KIND: Delta is a pip package
(``import delta``), Iceberg is a JVM jar -- so the probe inspects the
Spark jars directory / an active JVM instead of importing a Python
module.  Nothing here touches the JVM at module load.

Path-vs-identifier: the Iceberg branch addresses tables through a Hadoop
catalog (``<catalog>.<namespace>.<table>`` over a warehouse directory) --
Iceberg's SQL surface (MERGE INTO, time travel) is identifier-based.  The
fallback maps an identifier deterministically onto a parquet path under
the same warehouse directory so both branches agree on WHERE data lands.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.maintenance import merge_upsert

#: Catalog name the builder config registers (hadoop type).
DEFAULT_CATALOG = "local_iceberg"


def iceberg_available(spark: SparkSession | None = None) -> bool:
    """True when the iceberg-spark-runtime jar is usable.

    With an active session, probe the JVM classloader (authoritative --
    covers ``--packages``-provided jars).  Without one, scan the Spark
    jars directory so ``configure_builder`` can decide BEFORE a session
    exists (setting ``spark.sql.extensions`` to a missing class would
    fail session creation, the exact trap this gate exists to avoid).
    """
    if spark is None:
        spark = SparkSession.getActiveSession()
    if spark is not None:
        try:
            spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
            return True
        except Exception:
            return False
    try:
        from pyspark.find_spark_home import _find_spark_home

        return bool(
            glob.glob(os.path.join(_find_spark_home(), "jars", "iceberg-spark-runtime*.jar"))
        )
    except Exception:
        return False


def configure_builder(builder, warehouse: str, catalog: str = DEFAULT_CATALOG):
    """Apply the Iceberg SQL extension + a Hadoop catalog over
    ``warehouse`` to a SparkSession builder.  No-op without the runtime
    jar (the session then reads/writes parquet through the fallbacks)."""
    if not iceberg_available():
        return builder
    return (
        builder.config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config(f"spark.sql.catalog.{catalog}", "org.apache.iceberg.spark.SparkCatalog")
        .config(f"spark.sql.catalog.{catalog}.type", "hadoop")
        .config(f"spark.sql.catalog.{catalog}.warehouse", warehouse)
    )


def _fallback_path(warehouse: str, identifier: str) -> str:
    """Deterministic parquet location for ``ns.table`` under the
    warehouse dir -- the same layout a hadoop catalog would use."""
    return os.path.join(warehouse, *identifier.split("."))


def write_table(
    df: DataFrame,
    warehouse: str,
    identifier: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    catalog: str = DEFAULT_CATALOG,
) -> str:
    """Write ``ns.table``: Iceberg when available (snapshot-isolated
    ``createOrReplace``/``append`` through the catalog), partitioned
    parquet under the identical warehouse-relative path otherwise.
    Returns the format used ('iceberg' or 'parquet') so callers/tests can
    assert the active path."""
    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(f"{catalog}.{identifier}")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return "iceberg"
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(_fallback_path(warehouse, identifier))
    return "parquet"


def read_table(
    spark: SparkSession,
    warehouse: str,
    identifier: str,
    catalog: str = DEFAULT_CATALOG,
) -> DataFrame:
    """Read a table written by ``write_table``.

    Format detection asks the CATALOG (``tableExists`` resolves through
    the configured hadoop catalog, which understands s3a/hdfs warehouse
    paths), never the local filesystem -- an ``os.path.isdir`` probe is
    always False for a remote warehouse and would silently fall through
    to a raw parquet read of the table directory, returning dead
    snapshot files as live rows."""
    if iceberg_available(spark):
        try:
            if spark.catalog.tableExists(f"{catalog}.{identifier}"):
                return spark.read.table(f"{catalog}.{identifier}")
        except Exception:
            pass  # catalog not configured on this session -> fallback
    return spark.read.parquet(_fallback_path(warehouse, identifier))


def merge_into(
    spark: SparkSession,
    warehouse: str,
    identifier: str,
    updates: DataFrame,
    key: str,
    catalog: str = DEFAULT_CATALOG,
) -> str:
    """Row-level upsert into ``ns.table``.

    Iceberg path: native SQL ``MERGE INTO`` (WHEN MATCHED UPDATE SET * /
    WHEN NOT MATCHED INSERT *) -- snapshot-atomic, rewrites only data
    files containing matched keys (copy-on-write) or stages deletes
    (merge-on-read).  Parquet path: the pure-plan ``merge_upsert``
    full-outer join + staged rewrite-and-swap shared with
    ``sources/delta.py`` -- same rows, coarser atomicity (exactly what a
    format-less lakehouse loses).  Returns the path used
    ('iceberg-merge' or 'parquet-rewrite').
    """
    if iceberg_available(spark):
        updates.createOrReplaceTempView("__iceberg_merge_updates")
        try:
            spark.sql(
                f"MERGE INTO {catalog}.{identifier} t "
                f"USING __iceberg_merge_updates u ON t.{key} = u.{key} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            spark.catalog.dropTempView("__iceberg_merge_updates")
        return "iceberg-merge"
    import shutil

    path = _fallback_path(warehouse, identifier)
    target = spark.read.parquet(path)
    merged = merge_upsert(target, updates, key)
    # Stage to a sibling path, then swap (see delta.py: overwriting the
    # path being read would truncate the input under the lazy plan).
    tmp = path.rstrip("/") + ".__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return "parquet-rewrite"
