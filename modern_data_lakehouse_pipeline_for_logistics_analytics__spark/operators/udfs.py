"""Python UDF surface (SURVEY.md section 2.10, M8).

The reference has zero UDFs (all built-in expressions -- the right
default).  This module ships the three Python extension points for the
cases built-ins genuinely cannot express, all Arrow-batched -- never
row-at-a-time ``@udf``:

  - scalar ``pandas_udf``: vectorized column function (Series -> Series)
  - grouped-agg ``pandas_udf``: custom aggregate (Series -> scalar)
  - ``applyInPandas``: whole-group transforms (fit/normalize per group)

Scale notes: each incurs one Arrow serialization boundary per batch;
group-based variants shuffle on the grouping key first.  Groups must fit
in one worker's memory for applyInPandas -- use it for per-entity model
fitting, never keyed-by-nothing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def log1p_weight(col) -> F.Column:
    """Scalar vectorized UDF: numpy log1p over an Arrow batch (stand-in
    for any numpy/scipy transform with no Spark builtin).  The udf is
    built at call time -- decorating at import requires an active session
    to parse the return-type DDL."""

    @pandas_udf("double")
    def _log1p(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.log1p(v.to_numpy(dtype="float64")))

    return _log1p(col)


def weighted_mean(value_col, weight_col) -> F.Column:
    """Grouped-aggregate pandas UDF: weight-averaged value per group."""

    @pandas_udf("double")
    def _wmean(v: pd.Series, w: pd.Series) -> float:  # type: ignore[misc]
        import numpy as np

        weights = w.to_numpy(dtype="float64")
        if weights.sum() == 0:
            return float("nan")
        return float(np.average(v.to_numpy(dtype="float64"), weights=weights))

    return _wmean(value_col, weight_col)


def zscore_within_group(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """applyInPandas: per-group z-score (ddof=0).  The canonical
    whole-group transform -- anything that must see the full group
    (normalization, per-entity model fit, resampling) follows this shape.
    Output: input columns + ``zscore``."""
    out_fields = df.schema.fields
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in out_fields] + ["zscore double"]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf[value_col].to_numpy(dtype="float64")
        sd = v.std()  # ddof=0
        pdf = pdf.copy()
        pdf["zscore"] = np.round((v - v.mean()) / sd, 6) if sd > 0 else 0.0
        return pdf

    return df.groupBy(*keys).applyInPandas(per_group, schema=schema)


def pii_matches_udtf():
    """Spark 4 Python UDTF (table function): per-row PII entity extraction
    yielding ``(kind, value, pos)`` rows -- registered for LATERAL use
    (``spark.udtf.register("pii_matches", pii_matches_udtf())``).

    Honest positioning: THESE regex patterns are expressible JVM-side as
    ``regexp_extract_all`` + ``posexplode`` (and
    ``text_pii_pattern_counts`` does exactly that for counting) -- the
    UDTF exists for the shape the built-ins cannot take: per-match Python
    logic (a real NER model, contextual validation, checksum verification
    of card numbers) emitting a VARIABLE number of typed rows per input
    row.  Built lazily so importing this module never requires the UDTF
    runtime."""
    import re

    from pyspark.sql.functions import udtf

    patterns = [
        ("email", re.compile(r"[\w.+-]+@[\w-]+\.[\w.]+")),
        ("phone", re.compile(r"\+?\d[\d-]{7,}\d")),
    ]

    @udtf(returnType="kind string, value string, pos int")
    class PiiMatches:
        def eval(self, text):
            for kind, pat in patterns:
                for m in pat.finditer(text or ""):
                    yield kind, m.group(0), m.start()

    return PiiMatches
