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


# ---------------------------------------------------------------------------
# Fellegi-Sunter parameter ESTIMATION: one EM round over the agreement
# patterns, in exact fixed-point integer arithmetic (oracle-replayable).
# ---------------------------------------------------------------------------

#: Fixed-point scale for EM probabilities.  2 * N_pairs * SCALE^2 must
#: stay under 2^63, so SCALE = 1e6 supports ~4.6e6 candidate pairs --
#: far beyond any sane post-blocking candidate set per EM shard (at
#: larger scale, run the M-step per shard and merge the integer
#: numerators/denominators before the final division).
FS_EM_SCALE = 1_000_000


def fs_em_likelihood_sql(
    agree_cols: list[str],
    m0_fp: list[int],
    u0_fp: list[int],
    p0_fp: int,
    scale: int,
    div: str,
) -> tuple[str, str]:
    """SQL fragments for the per-pattern E-step likelihoods ``(a, b)``:
    a = p * prod_j (gamma_j ? m_j : 1-m_j), b = (1-p) * prod_j
    (gamma_j ? u_j : 1-u_j), renormalized back to ``scale`` after EVERY
    multiply (``(x * term) div scale``) so intermediates never exceed
    scale^2 -- exact, deterministic, identical in Spark (``div``) and
    DuckDB (``//``).  ONE builder feeds both engines (portable
    playbook): only the integer-division token differs."""
    # Seed the chains as BIGINT: bare integer literals parse as INT32
    # in BOTH engines and the very first multiply (p0 * m0 ~ 2e10)
    # would overflow 32-bit exact arithmetic.
    a = f"CAST({p0_fp} AS BIGINT)"
    b = f"CAST({scale - p0_fp} AS BIGINT)"
    for c, m, u in zip(agree_cols, m0_fp, u0_fp):
        a = f"((({a}) * (CASE WHEN {c} = 1 THEN {m} ELSE {scale - m} END)) {div} {scale})"
        b = f"((({b}) * (CASE WHEN {c} = 1 THEN {u} ELSE {scale - u} END)) {div} {scale})"
    return a, b


def fs_estimate_mu(
    pairs: DataFrame,
    agree_cols: list[str],
    mu0: list[tuple[float, float]],
    p0: float,
    scale: int = FS_EM_SCALE,
) -> DataFrame:
    """Estimate Fellegi-Sunter ``(m_j, u_j)`` from DATA: one EM round
    over the candidate pairs' 0/1 agreement columns, starting from the
    prior ``mu0`` and match-prevalence ``p0``.  The r9 decision layer
    took hand-supplied (m, u); this is the natural completion -- the
    estimates that production ER would actually deploy.

    EM on the agreement-PATTERN histogram, not the raw pairs: with k
    fields there are at most 2^k distinct patterns, so after one
    map-side-combinable groupBy the E-step (posterior match weight per
    pattern) and M-step (weighted agreement rates) run over <= 2^k rows
    -- the pair count enters ONLY through the pattern counts, and the
    whole round costs one aggregate regardless of data size.

    All arithmetic is fixed-point BIGINT (scale 1e6) with truncating
    renormalization after each multiply and shared round-half-up final
    divisions, so a DuckDB oracle replays the round bit-for-bit
    (`fs_em_likelihood_sql` feeds both engines).  Float EM would never
    hash-match; the truncation bias is < 2^-19 per factor and identical
    everywhere.

    Output: one row per field -- ``field, m_prior_fp, u_prior_fp,
    m_post_fp, u_post_fp, p_post_fp`` (micro-units).  Degenerate
    posteriors (every pair classified match, or none) yield NULL for
    the undefined side rather than a divide-by-zero.

    Cites reference test surface: the reference pipeline has no
    parameter estimation; this extends the linkage family
    (SURVEY.md training-data pipeline additions)."""
    k = len(agree_cols)
    if k == 0 or len(mu0) != k:
        raise ValueError(
            f"fs_estimate_mu: {k} agreement cols vs {len(mu0)} (m, u) priors"
        )
    if not (0 < p0 < 1):
        raise ValueError(f"fs_estimate_mu needs 0 < p0 < 1, got {p0}")
    for m, u in mu0:
        if not (0 < u < m < 1):
            raise ValueError(
                f"fs_estimate_mu needs 0 < u < m < 1 priors, got (m={m}, u={u})"
            )
    import math

    m0_fp = [int(math.floor(m * scale + 0.5)) for m, _ in mu0]
    u0_fp = [int(math.floor(u * scale + 0.5)) for _, u in mu0]
    p0_fp = int(math.floor(p0 * scale + 0.5))

    pat = pairs.groupBy(*agree_cols).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    a_sql, b_sql = fs_em_likelihood_sql(agree_cols, m0_fp, u0_fp, p0_fp, scale, "div")
    # Posterior match weight per pattern, round-half-up in integers:
    # w = round(a * scale / (a + b)).  a, b <= scale so 2*a*scale fits
    # comfortably; a + b > 0 because priors are strictly inside (0, 1)
    # and the renormalized product of k factors >= 1 requires
    # prod(term) >= scale^(k-1); a zero can only appear if a prior is
    # within 2^-19 of 0/1, which the domain check above rejects for any
    # practical scale -- guard anyway so a pathological scale fails
    # loudly instead of dividing by zero.
    w_sql = (
        f"CASE WHEN ({a_sql}) + ({b_sql}) = 0 THEN "
        f"raise_error('fs_estimate_mu: degenerate likelihood (scale too small)') "
        f"WHEN 1=1 THEN (2 * ({a_sql}) * {scale} + (({a_sql}) + ({b_sql}))) "
        f"div (2 * (({a_sql}) + ({b_sql}))) END"
    )
    pat = pat.withColumn("__w", F.expr(w_sql).cast("long"))

    aggs = [
        F.sum(F.col("__n") * F.col("__w")).cast("long").alias("__W"),
        F.sum(F.col("__n") * (F.lit(scale) - F.col("__w"))).cast("long").alias("__V"),
        F.sum("__n").cast("long").alias("__N"),
    ]
    for j, c in enumerate(agree_cols):
        gamma = F.when(F.col(c) == 1, F.lit(1)).otherwise(F.lit(0))
        aggs.append(
            F.sum(F.col("__n") * F.col("__w") * gamma).cast("long").alias(f"__Wa{j}")
        )
        aggs.append(
            F.sum(F.col("__n") * (F.lit(scale) - F.col("__w")) * gamma)
            .cast("long")
            .alias(f"__Va{j}")
        )
    one = pat.agg(*aggs)

    def _rhu_div(num: str, den: str) -> str:
        # round-half-up(num / den) in pure BIGINT; NULL when den = 0.
        return f"CASE WHEN {den} = 0 THEN NULL ELSE (2 * {num} + {den}) div (2 * {den}) END"

    rows = []
    for j, c in enumerate(agree_cols):
        rows.append(
            f"struct('{c}' AS field, CAST({m0_fp[j]} AS BIGINT) AS m_prior_fp, "
            f"CAST({u0_fp[j]} AS BIGINT) AS u_prior_fp, "
            f"CAST({_rhu_div(f'__Wa{j} * {scale}', '__W')} AS BIGINT) AS m_post_fp, "
            f"CAST({_rhu_div(f'__Va{j} * {scale}', '__V')} AS BIGINT) AS u_post_fp, "
            f"CAST({_rhu_div('__W', '__N')} AS BIGINT) AS p_post_fp)"
        )
    return one.select(
        F.explode(F.expr(f"array({', '.join(rows)})")).alias("__r")
    ).select("__r.*")


# ---------------------------------------------------------------------------
# Survivorship: the golden record per entity cluster.
# ---------------------------------------------------------------------------


def golden_records(
    clustered: DataFrame,
    cluster_col: str,
    columns: list[str],
) -> DataFrame:
    """Collapse each entity cluster to its GOLDEN RECORD: for every
    attribute, the consensus value = most frequent NON-NULL value among
    the cluster's members, ties broken by value ascending (a total
    order, so the merged record is deterministic).  The survivorship
    step that completes the ER pipeline: blocking proposes, the
    decision layer disposes, components cluster, THIS merges.

    Input: one row per cluster MEMBER carrying ``cluster_col`` plus the
    attribute columns.  Output: one row per cluster --
    ``cluster_col, n_members, <col>_gold`` for each attribute.

    Scale shape: one count aggregate + one top-1 window PER ATTRIBUTE,
    all keyed by cluster -- map-side-combinable counts over member
    rows, never a collect; the per-attribute frames join back on the
    cluster key (clusters are tiny after any sane blocking, so these
    joins are AQE-broadcastable).  An attribute whose values are all
    NULL in a cluster yields NULL gold (no fabricated consensus).
    The member frame is CACHED at entry: each attribute pass re-reads
    it, and the upstream (blocking -> scoring -> components) is far
    too expensive to recompute once per column (r10 review finding)."""
    from pyspark.sql import Window

    from .dedup import _cache_aged

    clustered = _cache_aged("golden_members", clustered)
    base = clustered.groupBy(cluster_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    out = base
    for c in columns:
        w = Window.partitionBy(cluster_col).orderBy(
            F.desc("__cnt"), F.asc(c)
        )
        top = (
            clustered.filter(F.col(c).isNotNull())
            .groupBy(cluster_col, c)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col(cluster_col), F.col(c).alias(f"{c}_gold"))
        )
        out = out.join(top, cluster_col, "left")
    return out
