"""Multimodal plan: binary-column decode plumbing (rows-only check --
the payload pipeline is not SQL-expressible in DuckDB)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_binary_payload, decode_media
from .registry import register, table_path


@register("multimodal_decode_stub")
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads through the Arrow-batched decode stage: typed
    metadata out, deterministic stub decoder in place of PIL.
    tests/test_northstar.py pins the schema and the failure-status
    contract."""
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    media = attach_binary_payload(docs, "doc_id", "text")
    return decode_media(media)
