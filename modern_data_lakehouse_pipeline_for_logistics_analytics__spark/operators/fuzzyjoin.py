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


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 5,
    max_dist: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez-Stolfo): sort records by a
    blocking key, slide a window of ``window`` rows, verify each in-window
    pair with exact ``levenshtein <= max_dist``.  The SECOND classic
    entity-resolution blocking scheme next to ``fuzzy_join``'s deletion
    neighborhoods: SNB catches near-dups whose edits fall OUTSIDE a
    delete-d neighborhood (transposed words, long suffixes) as long as
    the sort key still lands them near each other.  Output:
    ``id_a, id_b, dist`` with rank(id_a) < rank(id_b).

    Scale shape -- NO single-task global sort:

      1. the global rank comes from the two-phase scheme
         (``windows.range_partition_ids``): a monotone int64 proxy of
         the key range-buckets rows as a pure function of the value,
         per-bucket ``row_number`` + broadcast bucket offsets = exact
         global rank (same scaffolding as ``global_ntile``);
      2. the proxy is the first 7 BYTES after the corpus-wide longest
         common byte prefix, big-endian (7 bytes < 2^56 keeps the sign
         bit clear; the lcp strip stops a shared literal prefix like
         'supplier#' collapsing every row into one range bucket).  The
         slice is taken on the UTF-8 BYTES (``substring`` over the
         binary cast), not characters: UTF-8 byte order equals code
         point order and Spark/DuckDB's default binary collation IS
         byte order, so the proxy is monotone for ARBITRARY keys --
         a character slice of multibyte keys would hex-expand past 14
         chars and overflow ``conv`` to NULL, silently mis-ranking
         (r8 advice finding).  lcp(min, max) == lcp of ALL rows, so it
         costs one tiny min/max agg;
      3. in-window candidates are ``window`` equi-joins on
         ``rn_b = rn_a + k`` (an explode of sequence(1, window)), so the
         candidate join shuffles (rank, id, key) rows -- never a
         single-partition window over the corpus.

    The ranking must be TOTAL for the pair set to be deterministic:
    ties on the key fall back to ``id_col``.  Rows with a NULL key are
    EXCLUDED -- a NULL blocking key cannot be meaningfully sorted next
    to anything, and engines disagree on where NULLs rank (Spark windows
    default NULLS FIRST, DuckDB ORDER BY defaults NULLS LAST), so
    including them would silently shift every downstream window pair
    (r8 review finding).
    """
    spark = df.sparkSession
    from .windows import range_partition_ids

    key = F.lower(F.trim(F.col(key_col)))
    src = df.select(F.col(id_col).alias("__id"), key.alias("__key")).filter(
        F.col("__key").isNotNull()
    )
    mm = src.agg(F.min("__key").alias("lo"), F.max("__key").alias("hi")).first()
    lo = (mm["lo"] or "").encode("utf-8")
    hi = (mm["hi"] or "").encode("utf-8")
    lcp = 0
    while lcp < min(len(lo), len(hi)) and lo[lcp] == hi[lcp]:
        lcp += 1
    # Byte-wise slice: substring over BINARY indexes bytes, rpad with
    # x'00' keeps short tails ordered before any extension of them.
    proxy = F.expr(
        f"cast(conv(hex(rpad(substring(cast(__key as binary), {lcp + 1}, 7), "
        f"7, x'00')), 16, 10) as bigint)"
    )
    P = num_partitions or spark.sparkContext.defaultParallelism
    ranged = range_partition_ids(src.withColumn("__px", proxy), "__px", P)
    counts = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    from pyspark.sql import Window

    w = Window.partitionBy("__pid").orderBy("__key", "__id")
    ranked = (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn("__rn", F.row_number().over(w) + F.col("__off"))
        .select("__rn", "__id", "__key")
    )
    # CACHED: both sides of the window join read the ranked frame.
    from .dedup import _cache_aged

    ranked = _cache_aged("snb_ranked", ranked)
    a = ranked.select(
        F.col("__rn").alias("rn_a"), F.col("__id").alias("id_a"), F.col("__key").alias("k_a")
    ).withColumn("__k", F.explode(F.sequence(F.lit(1), F.lit(window))))
    b = ranked.select(
        F.col("__rn").alias("rn_b"), F.col("__id").alias("id_b"), F.col("__key").alias("k_b")
    )
    pairs = a.join(b, F.col("rn_b") == F.col("rn_a") + F.col("__k"))
    out = pairs.select(
        "id_a", "id_b", F.levenshtein("k_a", "k_b").cast("long").alias("dist")
    )
    return out.filter(F.col("dist") <= max_dist)


def sorted_neighborhood_multipass(
    df: DataFrame,
    id_col: str,
    key_exprs: list[Column],
    window: int = 5,
    max_dist: int = 3,
    verify_col: str | None = None,
) -> DataFrame:
    """MULTI-PASS sorted neighborhood (the full Hernandez-Stolfo scheme):
    one SNB pass per blocking key, candidate pairs UNIONED and verified
    once -- a single sort key misses pairs whose difference lands in its
    prefix (e.g. a typo in the first character teleports the record far
    away in sort order), so production ER runs 2-3 complementary keys
    (name, reversed name, phonetic code) and unions the windows.

    ``key_exprs`` are the blocking keys; ``verify_col`` (default: the
    FIRST key) is what levenshtein verifies, so all passes share one
    distance semantics.  The verify column is normalized with
    ``lower(trim(...))`` EXACTLY like ``sorted_neighborhood_pairs``
    normalizes its blocking key -- without it, multipass distances
    diverge from single-pass (and from the SQL oracle) the moment the
    input has mixed case or padding (r8 advice finding; TPC-H names
    only masked it by being case-uniform).  Output: ``id_a, id_b,
    dist`` (id_a < id_b, deduped across passes).  Cost = passes x the
    single-pass cost; the verify runs once on the deduped union.
    """
    if not key_exprs:
        raise ValueError("sorted_neighborhood_multipass needs >= 1 key expr")
    verify = verify_col if verify_col is not None else "__k0"
    src = df.select(
        F.col(id_col).alias("__id"),
        *[k.alias(f"__k{i}") for i, k in enumerate(key_exprs)],
    )
    from .dedup import _cache_aged

    src = _cache_aged("snb_mp_src", src)
    cands = None
    for i in range(len(key_exprs)):
        pairs = sorted_neighborhood_pairs(
            src, "__id", f"__k{i}", window=window, max_dist=10**9
        ).select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()
    vnorm = F.lower(F.trim(F.col(verify)))
    a = src.select(F.col("__id").alias("id_a"), vnorm.alias("__va"))
    b = src.select(F.col("__id").alias("id_b"), vnorm.alias("__vb"))
    out = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b", F.levenshtein("__va", "__vb").cast("long").alias("dist")
        )
    )
    return out.filter(F.col("dist") <= max_dist)


# ---------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (decision layer over any
# blocking scheme above).
# ---------------------------------------------------------------------------


def fs_weights(mu: list[tuple[float, float]]) -> list[tuple[int, int]]:
    """Fellegi-Sunter field weights in fixed-point MICRO-LOG2 units:
    ``wa = log2(m/u), wd = log2((1-m)/(1-u))``, floor-half-up at 1e6.
    Computed ONCE in Python and inlined as integer literals into BOTH
    the Spark plan and the SQL oracle -- constants cannot drift and no
    cross-engine float arithmetic ever runs (portable playbook)."""
    import math

    out = []
    for m, u in mu:
        if not (0 < u < m < 1):
            raise ValueError(f"fs_weights needs 0 < u < m < 1, got (m={m}, u={u})")
        wa = math.floor(math.log2(m / u) * 1_000_000 + 0.5)
        wd = math.floor(math.log2((1 - m) / (1 - u)) * 1_000_000 + 0.5)
        out.append((int(wa), int(wd)))
    return out


def fellegi_sunter_scores(
    pairs: DataFrame,
    agreements: list[tuple[str, Column]],
    weights: list[tuple[int, int]],
    upper: int,
    lower: int,
) -> DataFrame:
    """Score candidate pairs with the Fellegi-Sunter log-likelihood
    decision model: each field contributes its agree/disagree weight,
    the summed score classifies ``link`` (>= upper) / ``nonlink``
    (<= lower) / ``possible`` (clerical-review band).  THE classical
    probabilistic record-linkage decision layer -- blocking (SNB,
    deletion neighborhoods, LSH) proposes, this disposes.

    Pure map-side codegen over the candidate frame (the agreement
    columns are plain expressions; weights are integer literals), so
    the decision layer adds ZERO shuffles to whatever blocking produced
    the pairs.  Output: the input columns + one 0/1 column per field +
    ``score`` + ``decision``."""
    if len(agreements) != len(weights):
        raise ValueError(
            f"fellegi_sunter_scores: {len(agreements)} agreement exprs vs "
            f"{len(weights)} weight pairs"
        )
    out = pairs
    score = F.lit(0).cast("long")
    for (name, cond), (wa, wd) in zip(agreements, weights):
        # NULL condition (e.g. a NULL field value) is a DISAGREEMENT:
        # coalesce to 0 so the materialized column honors the
        # documented 0/1 contract (r9 advice finding -- bare
        # cond.cast("long") preserved NULL).
        out = out.withColumn(name, F.coalesce(cond.cast("long"), F.lit(0)))
        score = score + F.when(F.col(name) == 1, F.lit(wa)).otherwise(F.lit(wd))
    out = out.withColumn("score", score.cast("long"))
    return out.withColumn(
        "decision",
        F.when(F.col("score") >= upper, F.lit("link"))
        .when(F.col("score") <= lower, F.lit("nonlink"))
        .otherwise(F.lit("possible")),
    )
