"""SparkSession factory.

The reference builds a near-identical session in five places
(`Silver_layer/Silver_tranformation.py:27-39`, `Gold_layer/starschema.py:24-36`,
`Snowflake/snowflake_connection.py:33-43`, `MLOPS/prediction.py:31-43`,
`API/pastapi.py:46-57`), each hardcoding `spark.sql.shuffle.partitions=8` and
an S3A endpoint.  This factory centralizes that, defaults to AQE instead of a
fixed shuffle-partition count (which would be wrong at 100 TB), and keeps the
S3A block optional so local tests never touch object storage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def s3a_conf(s3a: dict) -> dict[str, str]:
    """The S3A config block as plain data (the testable seam: the sandbox
    ships no hadoop-aws jar or object store, so the exact key/value
    mapping is unit-tested and the live round-trip is skip-gated in
    tests/test_s3a.py).  Same knobs the reference sets
    (`Silver_tranformation.py:31-37`); endpoint/credentials always come
    from the caller -- never hardcoded."""
    return {
        "spark.hadoop.fs.s3a.endpoint": s3a["endpoint"],
        "spark.hadoop.fs.s3a.access.key": s3a["access_key"],
        "spark.hadoop.fs.s3a.secret.key": s3a["secret_key"],
        "spark.hadoop.fs.s3a.path.style.access": "true",
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    }


#: Opt-in config block for RocksDB-backed streaming state (SURVEY §4
#: scale posture): the default HDFS-backed state store holds every key in
#: executor heap -- fine for the sandbox's tests, an OOM at 100 TB of
#: dedup/session state.  RocksDB spills to local disk with changelog
#: checkpointing so state size is bounded by disk, not heap.  Kept
#: opt-in (``extra_conf=rocksdb_state_conf()``) because the provider
#: initializes per stateful query and is pure overhead for batch work.
def rocksdb_state_conf() -> dict[str, str]:
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


def build_session(
    app_name: str = "modern-data-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    s3a: dict | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession tuned for large-scale analytics.

    Scale posture (SURVEY.md section 4):
      - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
        broadcast demotion -- replaces the reference's hardcoded
        ``shuffle.partitions=8``.
      - Arrow on: every ``toPandas``/pandas-UDF boundary is columnar.
      - Dynamic partition overwrite: per-date idempotent re-runs
        (reference semantics at `Silver_tranformation.py:121`) without
        clobbering sibling partitions.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE on runtime row-level filters (bloomFilter /
        # semiJoinReduction): tempting at 100 TB, but they duplicate the
        # join's build side as an injected subquery on the probe side --
        # for this engine's self-joins over mapInPandas stages (LSH
        # banding, shingles) that re-executes the Python stage and
        # measured as a multi-minute stall at sf0.001.  Leave them at
        # Spark's defaults; enable per-query only for pure-JVM fact
        # joins.
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        builder = builder.config("spark.sql.shuffle.partitions", "32")
    if s3a:
        for k, v in s3a_conf(s3a).items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
