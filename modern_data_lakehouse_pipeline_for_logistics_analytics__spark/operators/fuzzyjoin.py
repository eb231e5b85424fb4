"""Fuzzy entity-resolution join: deletion-neighborhood blocking plus
exact edit-distance verify.

The all-pairs ``levenshtein(a, b) <= d`` join is O(n*m) -- dead at any
scale.  The SymSpell observation makes it linear: two strings within
edit distance 1 (insert / delete / substitute) ALWAYS share a member of
their delete-1 neighborhoods ``{s} ∪ {s minus one char}``.  So:

1. expand each side to its |s|+1 variants (a distributed ``transform``
   + ``explode``, O(n·L) rows);
2. join on the 60-bit portable hash of the variant -- the shuffle
   carries 8-byte hashes, never the strings;
3. verify surviving candidate pairs with the exact ``levenshtein``
   (built-in, JVM) -- hash collisions and distance-2 coincidences
   (e.g. "xab"/"aby" share variant "ab") are killed here, so false
   candidates never escape.

Blocking cost is Σ bucket² per shared variant, the same hot-bucket
shape as MinHash-LSH banding; variants are near-unique for real entity
strings, and the verify stage only ever sees candidates.  For distance
d>1 the same scheme uses delete-d neighborhoods (cost O(n·L^d));
this module implements the d=1 workhorse.

Reference parity: no join surface exists in the reference (SURVEY
§2.3 J0); this is engine generalization for the entity-resolution /
record-linkage workloads a logistics lakehouse actually runs
(mis-keyed courier / supplier names).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_base_hash


def delete1_variants(col: str) -> Column:
    """Array of the string itself plus every delete-one-char variant.

    Pure SQL lambda (``transform`` over ``sequence``): stays in
    whole-stage codegen, no Python.
    """
    return F.expr(
        f"concat(array({col}), "
        f"  transform(sequence(1, length({col})), "
        f"    i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))))"
    )


def delete2_variants(col: str) -> Column:
    """Delete-0/1/2 neighborhood: the string, every delete-1, and every
    delete-2 (positions i < j, built as three-segment concat).  O(L^2)
    variants per string -- the SymSpell d=2 blocking set.  Still one
    nested SQL lambda, fully codegen."""
    d2 = (
        f"flatten(transform(sequence(1, length({col}) - 1), "
        f"  i -> transform(sequence(i + 1, length({col})), "
        f"    j -> concat(substr({col}, 1, i - 1), "
        f"               substr({col}, i + 1, j - i - 1), "
        f"               substr({col}, j + 1)))))"
    )
    guard = f"CASE WHEN length({col}) >= 2 THEN {d2} ELSE array() END"
    return F.expr(
        f"concat(array({col}), "
        f"  transform(sequence(1, length({col})), "
        f"    i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))), "
        f"  {guard})"
    )


def _variant_hashes(
    df: DataFrame, id_col: str, str_col: str, block_dist: int = 1
) -> DataFrame:
    variants = delete1_variants(str_col) if block_dist == 1 else delete2_variants(str_col)
    return (
        df.select(
            F.col(id_col),
            F.col(str_col),
            F.explode(F.array_distinct(variants)).alias("__v"),
        ).select(id_col, str_col, portable_base_hash(F.col("__v")).alias("__vh"))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 1,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Pairs ``(left_id, right_id, dist)`` with edit distance <= max_dist.

    COMPLETE for ``max_dist`` in {1, 2}: blocking uses the delete-d
    neighborhood matching ``max_dist`` (two strings within edit distance
    d always share a delete-<=d variant -- each differing position is
    handled by deleting it on one or both sides), at O(L^d) variants per
    string.  ``max_dist`` above 2 raises: the candidate set would be
    silently incomplete.

    ``max_bucket_size`` is the hot-bucket guard (same failure mode and
    default as ``lsh_candidate_pairs``): a degenerate corpus -- millions
    of rows sharing one name -- floods a single variant bucket and the
    candidate join goes Σ bucket².  Variants whose LEFT-side bucket
    exceeds the cap are dropped; the recall trade only bites strings
    duplicated beyond the cap, which exact dedup catches upstream.
    Pass ``None`` to disable.
    """
    if max_dist not in (1, 2):
        raise ValueError(f"fuzzy_join blocking is complete only for max_dist 1/2, got {max_dist}")
    lv = _variant_hashes(left, left_id, left_str, block_dist=max_dist)
    rv = _variant_hashes(right, right_id, right_str, block_dist=max_dist)
    if max_bucket_size is not None:
        sizes = lv.groupBy("__vh").agg(F.count(F.lit(1)).alias("__n"))
        lv = (
            lv.join(sizes.filter(F.col("__n") <= max_bucket_size), "__vh")
            .drop("__n")
        )
    cands = (
        lv.join(rv, on="__vh")
        .select(left_id, left_str, right_id, right_str)
        .distinct()
    )
    return cands.select(
        left_id,
        right_id,
        F.levenshtein(F.col(left_str), F.col(right_str)).alias("dist"),
    ).filter(F.col("dist") <= max_dist)
