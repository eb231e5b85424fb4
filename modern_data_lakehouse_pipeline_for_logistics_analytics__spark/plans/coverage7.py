"""Round-12 widening: corpus-scaled SemDeDup geometry (the r11 verdict's
fixed-k remedy, registered rather than left in a probe table).

Each query follows the portable-oracle recipe (shared constants, BIGINT
arithmetic, integer-ceiling k both engines compute from COUNT(*)) so the
driver hash-verifies values, not just shapes.  Reference parity: none of
these exist in the reference -- they extend the similarity family per
SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .coverage6 import _SEMDEDUP_SCALE, _SEMDEDUP_THR, semdedup_verdict_sql
from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# --------------------------------------------------------------------------
# SemDeDup at the corpus-scaled geometry: k = max(16, ceil(n / pop))
# --------------------------------------------------------------------------

# Registered demo pop of 25 exercises the ceil branch at the oracle scale
# (sf0.01: 500 vectors -> k = 20, a genuinely different geometry than the
# pinned k=16 of semdedup_portable) and gives the bench scale a bounded
# quadratic stage (sf0.1: 5000 -> k = 200, cluster pop ~ 25).  The
# OPERATOR default (target_cluster_pop=250) is the production setting;
# both run the identical code path.
_SEMDEDUP_POP = 25

# Integer ceiling (n + pop - 1) // pop: the exact arithmetic
# semantic_dedup runs in Python when n_clusters=None -- float CEIL would
# be a second, driftable formula.
_SEMDEDUP_K_EXPR = (
    f"(SELECT GREATEST(16, (COUNT(*) + {_SEMDEDUP_POP - 1}) // {_SEMDEDUP_POP})"
    " FROM embeddings)"
)


@register("semdedup_scaled", oracle=semdedup_verdict_sql(_SEMDEDUP_K_EXPR))
def q_semdedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the corpus-scaled default geometry: ``n_clusters``
    derives from the corpus count (max(16, ceil(n / 25)) here), so the
    within-cluster quadratic stage stays bounded at any scale -- the
    production shape; ``semdedup_portable`` pins k=16 as the validated
    small-scale geometry (`operators/similarity.py::semantic_dedup`)."""
    from ..operators.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        n_clusters=None,
        threshold=_SEMDEDUP_THR,
        scale=_SEMDEDUP_SCALE,
        target_cluster_pop=_SEMDEDUP_POP,
    )
