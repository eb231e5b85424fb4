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


def evolve_to_schema(
    df: DataFrame,
    target,
    on_extra: str = "drop",
) -> DataFrame:
    """Coerce a heterogeneous batch onto a stable target schema (the
    ingestion edge where upstream producers add, drop and re-type fields
    release by release):

    - missing target columns materialize as typed NULLs;
    - present columns ``try_cast`` to the target type (a re-typed
      upstream field degrades to NULL per row, never fails the batch --
      corrupt rows are a certainty at ingest scale);
    - column order normalizes to the target;
    - extra columns ``drop`` (default) or ``'error'`` (strict mode for
      pipelines where an unexpected field means a contract break).

    ``target`` is a StructType or DDL string.  Pure projection -- no
    shuffle, pipelines into the scan.
    """
    from pyspark.sql.types import StructType

    if isinstance(target, str):
        target = StructType.fromDDL(target)
    have = {f.lower(): f for f in df.columns}
    extras = [c for c in df.columns if c.lower() not in {f.name.lower() for f in target.fields}]
    if extras and on_extra == "error":
        raise ValueError(f"unexpected columns for target schema: {extras}")
    cols = []
    for field in target.fields:
        src = have.get(field.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(src).try_cast(field.dataType).alias(field.name))
    return df.select(*cols)
