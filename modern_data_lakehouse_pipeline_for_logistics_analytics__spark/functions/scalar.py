"""Scalar-function helpers whose semantics need pinning (SURVEY.md
section 7.3) -- thin, documented wrappers; everything else uses
``pyspark.sql.functions`` directly."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.textstats import round_half_up, sql_round_half_up  # noqa: F401


def try_to_number(col: str | Column, dtype: str = "double") -> Column:
    """pandas ``to_numeric(errors="coerce")`` parity (`API/pastapi.py:208`):
    malformed -> NULL, never a job failure (Spark 4 ANSI would throw on a
    plain cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def eta_date(avg_days: Column) -> Column:
    """`pastapi.py:210` semantics: today + ceil(average days), null-safe."""
    return F.date_add(F.current_date(), F.ceil(F.coalesce(avg_days, F.lit(0.0))).cast("int"))
