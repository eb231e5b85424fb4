"""Projection / cleaning operators (SURVEY.md section 2.2, P1-P11; 2.8 F1-F9).

Generalizes the Silver-layer conform step
(`Silver_layer/Silver_tranformation.py:79-113`): rename + cast projections,
trim/upper normalization, null fills, membership-conditional status columns.
All built-in Column expressions -- stays inside whole-stage codegen, no
Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_code(col: str | Column) -> Column:
    """F1: trim + upper, the reference's courier/status normalization
    (`Silver_tranformation.py:81-82`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.trim(c))


def try_cast_coerce(col: str | Column, dtype: str) -> Column:
    """pandas ``to_numeric(errors="coerce")`` parity (`API/pastapi.py:208`):
    unparseable values become null instead of failing the job."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def status_flag(
    status_col: str | Column,
    success_values: list[str],
    success_label: str = "SUCCESS",
    pending_label: str = "PENDING",
) -> Column:
    """P7+P8: the reference's delivery_status rule
    (`Silver_tranformation.py:107-111`) -- membership predicate feeding a
    CASE WHEN."""
    c = F.col(status_col) if isinstance(status_col, str) else status_col
    return F.when(c.isin(*success_values), success_label).otherwise(pending_label)


def fill_defaults(df: DataFrame, defaults: dict) -> DataFrame:
    """P9: `df.fillna(dict)` (`Silver_tranformation.py:102-106`)."""
    return df.na.fill(defaults)


def drop_null_rows(df: DataFrame, subset: list[str]) -> DataFrame:
    """P10: `dropna(subset=...)` (`MLOPS/prediction.py:97`)."""
    return df.na.drop(subset=subset)


def with_audit_columns(df: DataFrame, load_date: str) -> DataFrame:
    """P11 audit columns (`Silver_tranformation.py:112-113`): constant
    partition date + ingestion timestamp.  load_timestamp is volatile --
    excluded from any hashed comparison (SURVEY.md section 7.4)."""
    return df.withColumn("load_date", F.lit(load_date)).withColumn(
        "load_timestamp", F.current_timestamp()
    )
