"""S3A object-store path (SURVEY S6 / VERDICT r3 item 9).

The sandbox ships no hadoop-aws jar, no boto3/moto, no MinIO binary, so a
live S3A round-trip is impossible here.  What IS tested: the exact conf
key/value mapping ``build_session`` applies (the only engine-side logic),
via the pure ``s3a_conf`` seam.  The round-trip test runs whenever an
environment provides the jar and an endpoint (SPARK_GRAFT_S3_ENDPOINT /
_KEY / _SECRET / _BUCKET), and is skipped -- loudly, with the reason --
otherwise."""

from __future__ import annotations

import os

import pytest

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import s3a_conf


def test_s3a_conf_mapping():
    conf = s3a_conf(
        {"endpoint": "http://minio:9000", "access_key": "ak", "secret_key": "sk"}
    )
    assert conf == {
        "spark.hadoop.fs.s3a.endpoint": "http://minio:9000",
        "spark.hadoop.fs.s3a.access.key": "ak",
        "spark.hadoop.fs.s3a.secret.key": "sk",
        "spark.hadoop.fs.s3a.path.style.access": "true",
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    }


def test_s3a_conf_no_hardcoded_credentials():
    """Every credential value must flow from the caller's dict -- the
    reference hardcodes endpoint+keys in five source files
    (`snowflake_connection.py:20-27`); the engine must never."""
    import inspect

    src = inspect.getsource(s3a_conf)
    for secret_marker in ("minio", "AKIA", "9000", "password"):
        assert secret_marker not in src


def _s3_env():
    keys = ("SPARK_GRAFT_S3_ENDPOINT", "SPARK_GRAFT_S3_KEY",
            "SPARK_GRAFT_S3_SECRET", "SPARK_GRAFT_S3_BUCKET")
    vals = [os.environ.get(k) for k in keys]
    return dict(zip(keys, vals)) if all(vals) else None


def _has_hadoop_aws():
    import glob as _glob

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars", "hadoop-aws*.jar")
    return bool(_glob.glob(jars))


@pytest.mark.skipif(
    not (_s3_env() and _has_hadoop_aws()),
    reason="no object store in this environment: requires hadoop-aws jar on the "
    "Spark classpath and SPARK_GRAFT_S3_{ENDPOINT,KEY,SECRET,BUCKET} pointing at "
    "a live endpoint (e.g. MinIO); neither ships in the build sandbox",
)
def test_s3a_roundtrip(spark):
    env = _s3_env()
    for k, v in s3a_conf(
        {"endpoint": env["SPARK_GRAFT_S3_ENDPOINT"],
         "access_key": env["SPARK_GRAFT_S3_KEY"],
         "secret_key": env["SPARK_GRAFT_S3_SECRET"]}
    ).items():
        spark.sparkContext._jsc.hadoopConfiguration().set(
            k.removeprefix("spark.hadoop."), v
        )
    path = f"s3a://{env['SPARK_GRAFT_S3_BUCKET']}/spark_graft_roundtrip"
    spark.range(100).write.mode("overwrite").parquet(path)
    assert spark.read.parquet(path).count() == 100
