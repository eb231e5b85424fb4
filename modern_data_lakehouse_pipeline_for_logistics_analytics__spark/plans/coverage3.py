"""Round-7 engine-widening queries: runtime bloom pruning, time-series
gap fill, fuzzy entity resolution, portable cardinality sketches,
quantile discretization.

Every query here is oracle-backed: the bloom bit array, the HLL
registers, and the SymSpell blocking are all built on the portable
BIGINT hash family (``operators/dedup.py:PORTABLE_P``) precisely so
DuckDB can replay the exact arithmetic.  Hash parameters are
interpolated into the SQL from the SAME Python source the Spark
operators read -- the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import quantile_bucketize
from ..operators.bloom import bloom_build, bloom_might_contain, bloom_params
from ..operators.fuzzyjoin import fuzzy_join
from ..operators.sketches import hll_alpha, hll_estimate, hll_registers
from ..operators.textstats import sql_round_half_up
from ..operators.timeseries import resample_interpolate
from .registry import read_events, register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# --------------------------------------------------------------------------
# Bloom-filter runtime pruning
# --------------------------------------------------------------------------

_BLOOM_BITS = 4096  # 128 32-bit words: demo-sized; production sizes ~10 bits/key
_MD5H = "CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)), 2, 15)) AS BIGINT)"


def _bloom_oracle() -> str:
    (a0, b0), (a1, b1), (a2, b2) = bloom_params(3)
    nb = _BLOOM_BITS
    h_build = _MD5H.format(col="bk")
    h_probe = _MD5H.format(col="o_custkey")
    return f"""
    WITH build AS (
      SELECT DISTINCT c_custkey AS bk FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal > 9000),
    bh AS (SELECT {h_build} % 2147483647 AS h0 FROM build),
    pos AS (
      SELECT (({a0} * h0 + {b0}) % 2147483647) % {nb} AS p FROM bh
      UNION ALL SELECT (({a1} * h0 + {b1}) % 2147483647) % {nb} FROM bh
      UNION ALL SELECT (({a2} * h0 + {b2}) % 2147483647) % {nb} FROM bh),
    words AS (
      SELECT p // 32 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS word
      FROM pos GROUP BY p // 32),
    ph AS (
      SELECT o_custkey, o_totalprice, {h_probe} % 2147483647 AS h0
      FROM orders),
    probe AS (
      SELECT o_custkey, o_totalprice,
             (({a0} * h0 + {b0}) % 2147483647) % {nb} AS p0,
             (({a1} * h0 + {b1}) % 2147483647) % {nb} AS p1,
             (({a2} * h0 + {b2}) % 2147483647) % {nb} AS p2
      FROM ph),
    flags AS (
      SELECT pr.o_custkey, pr.o_totalprice,
             COALESCE((w0.word >> CAST(pr.p0 % 32 AS INTEGER)) & 1, 0) = 1
         AND COALESCE((w1.word >> CAST(pr.p1 % 32 AS INTEGER)) & 1, 0) = 1
         AND COALESCE((w2.word >> CAST(pr.p2 % 32 AS INTEGER)) & 1, 0) = 1 AS pass,
             EXISTS (SELECT 1 FROM build b WHERE b.bk = pr.o_custkey) AS hit
      FROM probe pr
      LEFT JOIN words w0 ON w0.w = pr.p0 // 32
      LEFT JOIN words w1 ON w1.w = pr.p1 // 32
      LEFT JOIN words w2 ON w2.w = pr.p2 // 32)
    SELECT CAST(COUNT(CASE WHEN pass THEN 1 END) AS BIGINT) AS bloom_candidates,
           CAST(COUNT(CASE WHEN hit THEN 1 END) AS BIGINT) AS exact_matches,
           ROUND(SUM(CASE WHEN hit THEN o_totalprice END), 2) AS matched_revenue
    FROM flags
    """


@register("bloom_prune_orders", oracle=_bloom_oracle())
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter pruning, hash-verified end to end: build a portable
    bloom filter over a selective customer subset, pre-filter the orders
    scan with it, then run the exact membership join.  The one-row output
    pins (a) the exact bloom bit arithmetic (``bloom_candidates`` counts
    filter survivors INCLUDING false positives -- DuckDB must reproduce
    the identical bit array to match) and (b) the invariant that the
    exact join result is bloom-invariant (no false negatives).

    At 100 TB the bloom predicate cuts the fact-side shuffle to ~the
    dimension predicate's selectivity before any join runs; Spark's own
    ``runtime.bloomFilter`` conf applies the same idea optimizer-side.
    """
    cust = _t(spark, sf_dir, "customer").filter(
        (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_acctbal") > 9000)
    )
    words = bloom_build(cust, "c_custkey", _BLOOM_BITS, 3)
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    bk = cust.select(F.col("c_custkey").alias("bk")).distinct()
    flagged = orders.withColumn(
        "pass", bloom_might_contain(F.col("o_custkey"), words, _BLOOM_BITS, 3)
    ).join(F.broadcast(bk), F.col("o_custkey") == F.col("bk"), "left")
    return flagged.agg(
        F.count(F.when(F.col("pass"), 1)).alias("bloom_candidates"),
        F.count(F.when(F.col("bk").isNotNull(), 1)).alias("exact_matches"),
        F.round(F.sum(F.when(F.col("bk").isNotNull(), F.col("o_totalprice"))), 2).alias(
            "matched_revenue"
        ),
    )


# --------------------------------------------------------------------------
# Time-series gap fill + interpolation
# --------------------------------------------------------------------------


_GAPFILL_CTES = """daily AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
             ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders GROUP BY 1, 2),
    bounds AS (SELECT pri, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY pri),
    spine AS (
      SELECT pri, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds),
    j AS (
      SELECT s.pri, s.day, d.rev FROM spine s
      LEFT JOIN daily d ON d.pri = s.pri AND d.day = s.day),
    f AS (
      SELECT pri, day, rev,
        LAST_VALUE(rev IGNORE NULLS) OVER
          (PARTITION BY pri ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY pri ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        FIRST_VALUE(rev IGNORE NULLS) OVER
          (PARTITION BY pri ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN rev IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY pri ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j)"""

#: the interpolation CASE over an `f` row -- shared by the standalone
#: resample oracle and the capstone pipeline so the arithmetic cannot
#: drift between them (the same single-source rule as _hll_core_ctes).
_INTERP_CASE = """CASE WHEN rev IS NOT NULL THEN rev
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) *
                           (CAST(date_diff('day', pd, day) AS DOUBLE) /
                            CAST(date_diff('day', pd, nd) AS DOUBLE))
                 END"""


def _cusum_ctes(src: str, val: str) -> str:
    """median/MAD/prefix-sum/CUSUM chain over CTE ``src(pri, day, {val})``
    -- shared by the standalone CUSUM oracle and the capstone pipeline."""
    return f"""med AS (SELECT pri, quantile_disc({val}, 0.5) AS med_v FROM {src} GROUP BY pri),
    dev AS (
      SELECT s.pri, s.day, s.{val} - m.med_v AS dev
      FROM {src} s JOIN med m ON m.pri = s.pri),
    mad AS (SELECT pri, quantile_disc(ABS(dev), 0.5) AS mad_v FROM dev GROUP BY pri),
    pre AS (
      SELECT pri, day, dev,
             SUM(dev) OVER (PARTITION BY pri ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM dev),
    cu AS (
      SELECT pri, day, p - LEAST(MIN(p) OVER (PARTITION BY pri ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cusum
      FROM pre)"""


@register(
    "resample_interpolate_daily_revenue",
    oracle=f"""
    WITH {_GAPFILL_CTES}
    SELECT pri, day,
           CAST(FLOOR(({_INTERP_CASE}) * 10000 + 0.5) AS BIGINT) / 10000.0
             AS rev_filled,
           CAST(rev IS NULL AS INTEGER) AS was_gap
    FROM f
    """,
)
def q_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue per priority, regularized onto a dense per-key date
    spine with linear interpolation in the gaps and nearest-edge fill at
    the ends.  Spine, windows, and interpolation are all JVM codegen;
    the oracle replays the identical IEEE arithmetic."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    return resample_interpolate(daily, "pri", "day", "rev")


# --------------------------------------------------------------------------
# Fuzzy entity-resolution join (SymSpell delete-1 blocking)
# --------------------------------------------------------------------------

_DEL_POS = "CAST(s_suppkey % length(s_name) AS INTEGER)"


@register(
    "fuzzy_match_suppliers",
    oracle=f"""
    WITH dirty AS (
      SELECT s_suppkey AS did,
             substr(s_name, 1, {_DEL_POS}) || substr(s_name, {_DEL_POS} + 2) AS dname
      FROM supplier),
    clean AS (SELECT s_suppkey AS sid, s_name AS cname FROM supplier),
    lv AS (
      SELECT did, dname, dname AS v FROM dirty
      UNION ALL
      SELECT did, dname, substr(dname, 1, i - 1) || substr(dname, i + 1)
      FROM dirty CROSS JOIN generate_series(1, 64) AS t(i)
      WHERE i <= length(dname)),
    rv AS (
      SELECT sid, cname, cname AS v FROM clean
      UNION ALL
      SELECT sid, cname, substr(cname, 1, i - 1) || substr(cname, i + 1)
      FROM clean CROSS JOIN generate_series(1, 64) AS t(i)
      WHERE i <= length(cname)),
    cand AS (
      SELECT DISTINCT l.did, l.dname, r.sid, r.cname
      FROM lv l JOIN rv r ON l.v = r.v)
    SELECT did, sid, CAST(levenshtein(dname, cname) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(dname, cname) <= 1
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution of deterministically-corrupted supplier names
    (one char deleted at position ``suppkey % len``) back to the clean
    dimension: delete-1 neighborhood blocking -> hashed-variant join ->
    exact levenshtein verify.  The Spark side joins on the 60-bit
    portable hash of the variant (8-byte shuffle rows); the oracle joins
    on the raw variant -- the VERIFIED outputs are provably identical
    because distance<=1 pairs always share a delete-1 variant and the
    verify kills every false candidate, hash-collision or otherwise."""
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    pos = "CAST(s_suppkey % length(s_name) AS INT)"
    dirty = sup.select(
        F.col("s_suppkey").alias("did"),
        F.expr(f"concat(substr(s_name, 1, {pos}), substr(s_name, {pos} + 2))").alias("dname"),
    )
    clean = sup.select(F.col("s_suppkey").alias("sid"), F.col("s_name").alias("cname"))
    out = fuzzy_join(dirty, clean, "did", "dname", "sid", "cname", max_dist=1)
    return out.select("did", "sid", F.col("dist").cast("long").alias("dist"))


# --------------------------------------------------------------------------
# Portable cardinality sketches (HLL registers DuckDB can replay)
# --------------------------------------------------------------------------

_SKETCH_M = 64
_H60 = "CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 2, 15)) AS BIGINT)"


def _hll_core_ctes(src_cte: str, group_alias: str) -> str:
    """Shared register->aggregate CTE chain over a CTE named ``hsrc``
    exposing ``({group_alias}, h60)``.  SINGLE source for every sketch
    oracle in this module -- the bucket/rank arithmetic and the bias
    constants exist in exactly one place, so the three sketch query
    families cannot drift from each other (or from
    ``operators/sketches.py``, whose constants are interpolated here)."""
    m = _SKETCH_M
    cap = 60 - (m.bit_length() - 1) + 1
    return f"""
    {src_cte},
    b AS (
      SELECT {group_alias}, h60 % {m} AS bucket,
             CASE WHEN h60 // {m} = 0 THEN {cap}
                  ELSE bit_count(((h60 // {m}) & -(h60 // {m})) - 1) + 1
             END AS rank
      FROM hsrc),
    regs AS (
      SELECT {group_alias}, bucket, MAX(rank) AS r
      FROM b GROUP BY {group_alias}, bucket),
    agg AS (
      SELECT {group_alias}, COUNT(*) AS nz, SUM(power(2.0, -r)) AS s
      FROM regs GROUP BY {group_alias})"""


def _hll_est_case() -> str:
    """The estimate expression over an ``agg`` row (nz, s): raw HLL with
    the small-range linear-counting branch, 4dp half-up (the repo-wide
    floor formula, mirroring ``hll_estimate``'s round_half_up -- never
    engine-native ROUND, whose binary-.5 behavior differs by engine)."""
    m = _SKETCH_M
    alpha_m2 = repr(hll_alpha(m) * m * m)
    return f"""CASE WHEN ({alpha_m2} / (s + ({m} - nz))) <= {2.5 * m} AND nz < {m}
                  THEN {sql_round_half_up(f'{float(m)} * ln({float(m)} / ({m} - nz))', 4)}
                  ELSE {sql_round_half_up(f'{alpha_m2} / (s + ({m} - nz))', 4)}
             END"""


def _sketch_sql(grain_expr: str, group_alias: str) -> str:
    """Registers -> estimate SQL, shared by the daily and merged-weekly
    oracles.  ``grain_expr`` maps a day to the output group."""
    src_cte = f"""dayd AS (
      SELECT CAST(ts AS DATE) AS day, user_id FROM events),
    hsrc AS (SELECT {grain_expr} AS {group_alias}, {_H60} AS h60 FROM dayd)"""
    return f"""
    WITH {_hll_core_ctes(src_cte, group_alias)},
    est AS (
      SELECT {group_alias}, {_hll_est_case()} AS est_users
      FROM agg),
    ex AS (
      SELECT {grain_expr} AS {group_alias},
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      FROM dayd GROUP BY {group_alias})
    SELECT e.{group_alias}, e.est_users, x.exact_users
    FROM est e JOIN ex x ON e.{group_alias} = x.{group_alias}
    """


@register("distinct_sketch_daily_users", oracle=_sketch_sql("day", "day"))
def q_sketch_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user estimate from portable HLL registers,
    hash-verified against a DuckDB replay of the identical register
    arithmetic, with the exact COUNT(DISTINCT) alongside.  The register
    pass is one map-side-combinable aggregate whose shuffle rows are
    (day, bucket, rank) -- at 100 TB that is the whole point: daily
    distincts without shuffling (day, user) pairs."""
    e = read_events(spark, sf_dir).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    regs = hll_registers(e, ["day"], "user_id", _SKETCH_M)
    est = hll_estimate(regs, ["day"], _SKETCH_M).withColumnRenamed("est", "est_users")
    exact = e.groupBy("day").agg(F.countDistinct("user_id").alias("exact_users"))
    return est.join(exact, "day")


@register(
    "distinct_sketch_weekly_merge",
    oracle=_sketch_sql("date_trunc('week', day)", "week"),
)
def q_sketch_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY: daily register tables fold into weekly
    estimates by ``max`` over registers -- the raw events are never
    re-read at the coarser grain.  The oracle computes weekly registers
    directly; max-of-daily-max == weekly max proves the merge lossless
    (also asserted in tests/test_coverage3.py)."""
    e = read_events(spark, sf_dir).select(F.to_date("ts").alias("day"), "user_id")
    daily_regs = hll_registers(e, ["day"], "user_id", _SKETCH_M)
    weekly_regs = (
        daily_regs.withColumn("week", F.to_date(F.date_trunc("week", "day")))
        .groupBy("week", "bucket")
        .agg(F.max("r").alias("r"))
    )
    est = hll_estimate(weekly_regs, ["week"], _SKETCH_M).withColumnRenamed(
        "est", "est_users"
    )
    exact = (
        e.withColumn("week", F.to_date(F.date_trunc("week", "day")))
        .groupBy("week")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return est.join(exact, "week")


# --------------------------------------------------------------------------
# Quantile discretization
# --------------------------------------------------------------------------

_DECILES = [round(0.1 * i, 1) for i in range(1, 10)]


@register(
    "quantile_bins_totalprice",
    oracle=f"""
    WITH e AS (
      SELECT {', '.join(f'quantile_disc(o_totalprice, {p}) AS e{i}' for i, p in enumerate(_DECILES))}
      FROM orders),
    binned AS (
      SELECT o_totalprice,
             CASE WHEN o_totalprice IS NULL THEN NULL ELSE
             1 + {' + '.join(f'(CASE WHEN o_totalprice > e{i} THEN 1 ELSE 0 END)' for i in range(len(_DECILES)))}
             END AS bin
      FROM orders CROSS JOIN e)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM binned GROUP BY bin
    """,
)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile discretization of order prices with EXACT percentile_disc
    edges (data values -> cross-engine-exact comparisons), then per-bin
    count and price range.  Two passes; edge row broadcast."""
    o = _t(spark, sf_dir, "orders")
    binned = quantile_bucketize(o, "o_totalprice", _DECILES)
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


# --------------------------------------------------------------------------
# Grid-blocked spatial nearest neighbor
# --------------------------------------------------------------------------

_GRID_SCALE = 1_000_000
_NN_RADIUS = 50_000


def _xy_sql(prefix: str, key: str) -> str:
    h = (
        "CAST(('0x' || substring(md5('{p}:' || CAST({k} AS VARCHAR)), 2, 15)) AS BIGINT)"
        " % {s}"
    )
    return (
        h.format(p="x", k=key, s=_GRID_SCALE) + " AS x, "
        + h.format(p="y", k=key, s=_GRID_SCALE) + " AS y"
    )


@register(
    "spatial_nearest_supplier",
    oracle=f"""
    WITH cust AS (SELECT c_custkey, {_xy_sql('x', 'c_custkey')} FROM customer),
    supp AS (SELECT s_suppkey, {_xy_sql('x', 's_suppkey')} FROM supplier),
    cands AS (
      SELECT c.c_custkey, s.s_suppkey,
             (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
      FROM cust c JOIN supp s
        ON abs((c.x // {_NN_RADIUS}) - (s.x // {_NN_RADIUS})) <= 1
       AND abs((c.y // {_NN_RADIUS}) - (s.y // {_NN_RADIUS})) <= 1
      WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
            <= {_NN_RADIUS * _NN_RADIUS})
    SELECT c_custkey, s_suppkey, dist2 FROM (
      SELECT c_custkey, s_suppkey, dist2,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY dist2, s_suppkey) AS rn
      FROM cands) t
    WHERE rn = 1
    """,
)
def q_spatial_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier site within 50k grid units of every customer
    point, on deterministic hash-derived integer coordinates: 3x3
    cell-neighborhood blocking -> exact integer squared-distance verify
    -> per-point argmin window.  All-BIGINT arithmetic, so the oracle
    replays the candidate set and the tie-break exactly."""
    from ..operators.spatial import grid_nn_join, hashed_coords

    cust = hashed_coords(
        _t(spark, sf_dir, "customer").select("c_custkey"), "c_custkey", _GRID_SCALE
    )
    supp = hashed_coords(
        _t(spark, sf_dir, "supplier").select("s_suppkey"), "s_suppkey", _GRID_SCALE
    )
    return grid_nn_join(cust, supp, "c_custkey", "s_suppkey", _NN_RADIUS)


# --------------------------------------------------------------------------
# Fixed-point PageRank (iterative, exact cross-engine replay)
# --------------------------------------------------------------------------

_PR_ITER = 5


def _pagerank_oracle(iterations: int) -> str:
    from ..operators.graph import DAMP_DEN, DAMP_NUM, SCALE

    teleport = (DAMP_DEN - DAMP_NUM) * SCALE // DAMP_DEN
    ctes = [
        """edges0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem)""",
        """edges AS (
      SELECT src, dst FROM edges0
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges0)""",
        """deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM edges GROUP BY src)""",
        f"""r0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS r FROM deg)""",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT e.dst AS node,
             {teleport} + ({DAMP_NUM} * CAST(SUM(r.r // d.deg) AS BIGINT)) // {DAMP_DEN}
               AS r
      FROM edges e
      JOIN r{i - 1} r ON r.node = e.src
      JOIN deg d ON d.node = e.src
      GROUP BY e.dst)"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, r AS rank_fp FROM r{iterations}
    ORDER BY rank_fp DESC, node LIMIT 20
    """
    )


@register("pagerank_part_supplier", oracle=_pagerank_oracle(_PR_ITER))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 damped iterations, BIGINT fixed-point) over the
    symmetrized part<->supplier co-occurrence graph from lineitem; top-20
    nodes with deterministic tie-break.  Every iteration is exact integer
    arithmetic, so DuckDB replays the full fixed point bit-for-bit --
    the first hash-verified ITERATIVE ranking in the repo (the CC family
    proved set equality; this proves a numeric fixed point)."""
    from ..operators.graph import pagerank_fixedpoint

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = li.unionByName(li.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank_fixedpoint(edges, iterations=_PR_ITER)
    return ranks.orderBy(F.col("rank_fp").desc(), "node").limit(20)


# --------------------------------------------------------------------------
# Unigram-LM surprisal (CCNet-style quality scoring)
# --------------------------------------------------------------------------


@register(
    "text_unigram_surprisal",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents),
    freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM freq),
    sc AS (SELECT f.tok, -ln(CAST(f.n AS DOUBLE) / t.tot) AS s
           FROM freq f CROSS JOIN tot t)
    SELECT toks.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(sc.s), 6) AS avg_surprisal
    FROM toks JOIN sc ON sc.tok = toks.tok
    GROUP BY toks.doc_id
    """,
)
def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal under the corpus-empirical LM
    (see ``operators/textstats.unigram_surprisal``); the perplexity-proxy
    quality signal every LLM-data pipeline gates on."""
    from ..operators.textstats import unigram_surprisal

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_surprisal(docs, "doc_id", "text")


# --------------------------------------------------------------------------
# Sketch algebra: intersection estimate via inclusion-exclusion
# --------------------------------------------------------------------------


def _sketch_est_sql(pred: str) -> str:
    """Scalar-subquery SQL computing the portable-HLL estimate over
    ``events`` rows matching ``pred`` (same shared core as
    ``_sketch_sql``)."""
    src_cte = f"""hsrc AS (
      SELECT 1 AS g, {_H60} AS h60 FROM events WHERE {pred})"""
    return f"""
      SELECT {_hll_est_case()}
      FROM (WITH {_hll_core_ctes(src_cte, "g")} SELECT nz, s FROM agg) t
    """


_EST_VIEW = _sketch_est_sql("event_type = 'view'")
_EST_PURCHASE = _sketch_est_sql("event_type = 'purchase'")
_EST_UNION = _sketch_est_sql("event_type IN ('view', 'purchase')")
_OVERLAP_EST_EXPR = f"({_EST_VIEW}) + ({_EST_PURCHASE}) - ({_EST_UNION})"


@register(
    "sketch_event_type_overlap",
    oracle=f"""
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'view')
             AS BIGINT) AS exact_a,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase')
             AS BIGINT) AS exact_b,
           CAST((SELECT COUNT(DISTINCT v.user_id) FROM
                   (SELECT DISTINCT user_id FROM events WHERE event_type = 'view') v
                 JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') p
                   ON p.user_id = v.user_id) AS BIGINT) AS exact_overlap,
           {sql_round_half_up(_OVERLAP_EST_EXPR, 4)}
             AS est_overlap
    """,
)
def q_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA: |A ∩ B| by inclusion-exclusion over portable-HLL
    estimates -- est(A) + est(B) - est(A ∪ B), where the union estimate
    comes from MAX-merged registers (never a re-read of raw rows).  The
    audience-overlap question every analytics stack answers with sketch
    intersections, here exact-replayable; the same row carries the exact
    distinct counts so the estimate's error is visible evidence."""
    e = read_events(spark, sf_dir).select("user_id", "event_type")
    a = e.filter(F.col("event_type") == "view")
    b = e.filter(F.col("event_type") == "purchase")
    ra = hll_registers(a.withColumn("g", F.lit(1)), ["g"], "user_id", _SKETCH_M)
    rb = hll_registers(b.withColumn("g", F.lit(1)), ["g"], "user_id", _SKETCH_M)
    from ..operators.sketches import hll_merge
    from ..operators.textstats import round_half_up

    est_a = hll_estimate(ra, ["g"], _SKETCH_M).select(F.col("est").alias("ea"))
    est_b = hll_estimate(rb, ["g"], _SKETCH_M).select(F.col("est").alias("eb"))
    est_ab = hll_estimate(hll_merge([ra, rb], ["g"]), ["g"], _SKETCH_M).select(
        F.col("est").alias("eab")
    )
    exact_a = a.agg(F.countDistinct("user_id").alias("exact_a"))
    exact_b = b.agg(F.countDistinct("user_id").alias("exact_b"))
    exact_ov = (
        a.select("user_id")
        .distinct()
        .join(b.select("user_id").distinct(), "user_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return (
        exact_a.crossJoin(exact_b)
        .crossJoin(exact_ov)
        .crossJoin(est_a)
        .crossJoin(est_b)
        .crossJoin(est_ab)
        .select(
            "exact_a",
            "exact_b",
            "exact_overlap",
            # Same floor-based half-up as the per-estimate rounding (the
            # difference of 4dp estimates can land on an exact half; the
            # formula stays cross-engine-exact even for negatives --
            # floor is toward -inf in both engines).
            round_half_up(
                F.col("ea") + F.col("eb") - F.col("eab"), 4
            ).alias("est_overlap"),
        )
    )


# --------------------------------------------------------------------------
# Morton / Z-order bucket audit (hash-verifies the layout operator)
# --------------------------------------------------------------------------

_Z_BITS = 10


def _morton_sql(bx: str, by: str, bits: int) -> str:
    terms = [f"((({bx} >> {i}) & 1) << {2 * i}) | ((({by} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return " | ".join(terms)


@register(
    "zorder_morton_buckets",
    oracle=f"""
    WITH pts AS (SELECT c_custkey, {_xy_sql('x', 'c_custkey')} FROM customer),
    bucketed AS (
      SELECT (x * {1 << _Z_BITS}) // {_GRID_SCALE} AS bx,
             (y * {1 << _Z_BITS}) // {_GRID_SCALE} AS by
      FROM pts),
    keyed AS (SELECT {_morton_sql('bx', 'by', _Z_BITS)} AS mkey FROM bucketed)
    SELECT mkey >> 14 AS curve_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(mkey) AS lo, MAX(mkey) AS hi
    FROM keyed GROUP BY mkey >> 14
    """,
)
def q_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-curve audit of the layout operator: Morton-interleave the
    10-bit equi-width buckets of hash-derived customer coordinates and
    report per-coarse-curve-segment counts and key ranges -- the exact
    bit interleaving DuckDB replays, making ``layout.morton_key``
    hash-verified (its write path is pytest-only by nature)."""
    from ..operators.layout import morton_key
    from ..operators.spatial import hashed_coords

    pts = hashed_coords(
        _t(spark, sf_dir, "customer").select("c_custkey"), "c_custkey", _GRID_SCALE
    )
    bx = ((F.col("x") * (1 << _Z_BITS)) / _GRID_SCALE).cast("long")
    by = ((F.col("y") * (1 << _Z_BITS)) / _GRID_SCALE).cast("long")
    keyed = pts.select(morton_key(bx, by, _Z_BITS).alias("mkey"))
    return keyed.groupBy(F.shiftright(F.col("mkey"), 14).alias("curve_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("mkey").alias("lo"),
        F.max("mkey").alias("hi"),
    )


# --------------------------------------------------------------------------
# Point-in-time (SCD2) join, CDC time travel, stratified sampling
# --------------------------------------------------------------------------


@register(
    "pit_join_event_segments",
    oracle="""
    WITH dim_src AS (SELECT user_id, event_type, ts FROM events WHERE event_id % 2 = 0),
    flagged AS (
      SELECT user_id, event_type, ts,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR event_type <> LAG(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM dim_src WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    numbered AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM flagged),
    intervals AS (
      SELECT user_id, run, event_type, MIN(ts) AS valid_from
      FROM numbered GROUP BY user_id, run, event_type),
    facts AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 2 = 1)
    SELECT f.event_id, f.user_id, i.event_type AS seg_type,
           i.valid_from AS segment_since
    FROM facts f JOIN intervals i
      ON i.user_id = f.user_id AND i.valid_from <= f.ts
    QUALIFY ROW_NUMBER() OVER (PARTITION BY f.event_id
                               ORDER BY i.valid_from DESC) = 1
    """,
)
def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup (the feature-store correctness
    pattern): each fact event joins the SCD2 segment version VALID AT its
    own timestamp, never a later one.  Dim = SCD2 intervals built from
    the even-id half of the event stream; facts = the odd-id half.
    Implemented with the union-window as-of join (ONE shuffle on the
    key; a join-then-top-1 would materialize every fact x earlier-version
    pair)."""
    from ..operators.joins import asof_join
    from ..operators.maintenance import scd2_from_events

    e = read_events(spark, sf_dir)
    dim = (
        scd2_from_events(
            e.filter(F.col("event_id") % 2 == 0), key="user_id", attr="event_type", ts="ts"
        )
        .select(
            F.col("user_id").alias("d_user"),
            F.col("event_type").alias("seg_type"),
            F.col("valid_from").alias("segment_since"),
        )
    )
    facts = e.filter(F.col("event_id") % 2 == 1).select("event_id", "user_id", "ts")
    out = asof_join(facts, dim, "user_id", "d_user", "ts", "segment_since")
    return out.select("event_id", "user_id", "seg_type", "segment_since")


@register(
    "cdc_state_asof",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 13 = 0 THEN 'STALE' ELSE o_orderstatus END
             AS o_orderstatus
    FROM orders
    """,
)
def q_cdc_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel via CDC replay: the same change feed as
    ``cdc_apply_order_changes`` (stale updates at t1, deletes/updates/
    inserts at t2) reconstructed AS OF t1 -- the %13 keys must show their
    t1 'STALE' value and NONE of the t2 activity (no deletes, no 'X', no
    inserts) may leak through the cutoff."""
    from ..operators.maintenance import state_asof

    o = _t(spark, sf_dir, "orders")
    target = o.select("o_orderkey", "o_orderstatus")
    t1 = F.lit("2024-06-01 00:00:00").cast("timestamp")
    t2 = F.lit("2024-06-02 00:00:00").cast("timestamp")
    stale_updates = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey", F.lit("STALE").alias("o_orderstatus"),
        F.lit("U").alias("op"), t1.alias("ts"),
    )
    deletes = o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey", F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit("D").alias("op"), t2.alias("ts"),
    )
    updates = o.filter((F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 13 != 0)).select(
        "o_orderkey", F.lit("X").alias("o_orderstatus"),
        F.lit("U").alias("op"), t2.alias("ts"),
    )
    inserts = o.filter(F.col("o_orderkey") % 17 == 0).select(
        (F.col("o_orderkey") + 90000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit("I").alias("op"), t2.alias("ts"),
    )
    changes = stale_updates.unionByName(deletes).unionByName(updates).unionByName(inserts)
    return state_asof(target, changes, t1, key="o_orderkey")


@register(
    "stratified_sample_orders",
    oracle="""
    SELECT o_orderpriority, o_orderkey, CAST(rk AS BIGINT) AS rk FROM (
      SELECT o_orderpriority, o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 2, 15))
                             AS BIGINT), o_orderkey) AS rk
      FROM orders) t
    WHERE rk <= 5
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: EXACTLY k=5 rows per stratum,
    chosen by portable-hash order (a seeded uniform draw every engine
    reproduces; ``sampleBy`` gives only expected fractions and
    per-run nondeterminism).  rank<=k rewrites to WindowGroupLimit, so
    the partial stage keeps k rows per stratum BEFORE the shuffle --
    sampling a 100 TB fact table shuffles ~k x strata rows."""
    from ..operators.dedup import portable_base_hash

    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderkey")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        portable_base_hash(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("o_orderpriority", "o_orderkey", F.col("rk").cast("long").alias("rk"))
    )


# --------------------------------------------------------------------------
# Bucketed interval-overlap join
# --------------------------------------------------------------------------


@register(
    "interval_overlap_order_windows",
    oracle="""
    WITH w AS (
      SELECT o_custkey, o_orderkey,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS d0,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 7 AS d1
      FROM orders)
    SELECT a.o_custkey AS custkey, a.o_orderkey AS okey_a, b.o_orderkey AS okey_b,
           CAST(LEAST(a.d1, b.d1) - GREATEST(a.d0, b.d0) AS BIGINT) AS overlap_days
    FROM w a JOIN w b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.d0 <= b.d1 AND b.d0 <= a.d1
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer pairs of orders whose 7-day activity windows overlap
    (concurrent-order detection): coarse 7-day cell blocking makes the
    overlap join EQUI on (customer, cell); exact bounds verify; integer
    day arithmetic end to end, so the oracle replays the pair set and
    overlap lengths exactly."""
    from ..operators.joins import interval_overlap_join

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    base = F.lit("1995-01-01").cast("date")
    w = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), base).cast("long").alias("d0"),
        (F.datediff(F.to_date("o_orderdate"), base) + 7).cast("long").alias("d1"),
    )
    a = w.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey_a"),
        F.col("d0").alias("a0"),
        F.col("d1").alias("a1"),
    )
    b = w.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey_b"),
        F.col("d0").alias("b0"),
        F.col("d1").alias("b1"),
    )
    pairs = interval_overlap_join(
        a, b, "a0", "a1", "b0", "b1", cell=7, equi_keys=["custkey"]
    ).filter(F.col("okey_a") < F.col("okey_b"))
    return pairs.select(
        "custkey",
        "okey_a",
        "okey_b",
        (F.least("a1", "b1") - F.greatest("a0", "b0")).cast("long").alias("overlap_days"),
    )


# --------------------------------------------------------------------------
# Hierarchy flattening (pointer doubling vs recursive CTE)
# --------------------------------------------------------------------------


@register(
    "hierarchy_customer_tree",
    oracle="""
    WITH RECURSIVE nodes AS (
      SELECT c_custkey AS node,
             CASE WHEN c_custkey >= 10 THEN c_custkey // 10 END AS parent
      FROM customer),
    walk AS (
      SELECT node, node AS cur, COALESCE(parent, node) AS nxt,
             CASE WHEN parent IS NULL THEN 0 ELSE 1 END AS depth
      FROM nodes
      UNION ALL
      SELECT w.node, w.nxt AS cur, COALESCE(n.parent, w.nxt) AS nxt,
             w.depth + CASE WHEN n.parent IS NULL THEN 0 ELSE 1 END
      FROM walk w JOIN nodes n ON n.node = w.nxt
      WHERE w.cur <> w.nxt)
    SELECT node, CAST(nxt AS BIGINT) AS root, CAST(depth AS BIGINT) AS depth
    FROM walk WHERE cur = nxt
    """,
)
def q_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten the deterministic customer tree (parent = custkey // 10,
    keys < 10 are roots) to (node, root, depth): pointer doubling
    converges in ~log2(depth) rounds where the oracle's recursive CTE
    walks one level per iteration -- same answer, exact integers."""
    from ..operators.graph import hierarchy_flatten

    c = _t(spark, sf_dir, "customer").select("c_custkey")
    nodes = c.select(
        F.col("c_custkey").alias("node"),
        F.when(F.col("c_custkey") >= 10, (F.col("c_custkey") / 10).cast("long")).alias(
            "parent"
        ),
    )
    return hierarchy_flatten(nodes)


# --------------------------------------------------------------------------
# Governance: pseudonymization + k-anonymity suppression
# --------------------------------------------------------------------------


@register(
    "privacy_k_anonymized_customers",
    oracle="""
    WITH sizes AS (
      SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS qgroup_n
      FROM customer GROUP BY c_mktsegment, c_nationkey)
    SELECT sha256('pepper7:' || CAST(c.c_custkey AS VARCHAR)) AS c_custkey_h,
           CASE WHEN s.qgroup_n >= 5 THEN c.c_mktsegment END AS c_mktsegment,
           CASE WHEN s.qgroup_n >= 5 THEN c.c_nationkey END AS c_nationkey,
           s.qgroup_n,
           CAST(s.qgroup_n < 5 AS BIGINT) AS suppressed
    FROM customer c
    JOIN sizes s ON s.c_mktsegment = c.c_mktsegment
                AND s.c_nationkey = c.c_nationkey
    """,
)
def q_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy export shape: salted-sha256 pseudonyms + NULL suppression
    of (segment, nation) quasi-identifier combinations with fewer than
    k=5 members; rows are kept so population stats survive.  Exact
    string/integer transforms -- the oracle replays every cell."""
    from ..operators.privacy import k_anonymize

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_nationkey")
    return k_anonymize(
        c, "c_custkey", ["c_mktsegment", "c_nationkey"], k=5, salt="pepper7"
    )


# --------------------------------------------------------------------------
# Sketch x event-time composition: distinct users per sliding window
# --------------------------------------------------------------------------


def _window_sketch_sql() -> str:
    src_cte = f"""assigned AS (
      SELECT DATE_TRUNC('hour', ts) AS window_start, user_id FROM events
      UNION ALL
      SELECT DATE_TRUNC('hour', ts) - INTERVAL 1 HOUR, user_id FROM events),
    hsrc AS (SELECT window_start, {_H60} AS h60 FROM assigned)"""
    return f"""
    WITH {_hll_core_ctes(src_cte, "window_start")},
    est AS (
      SELECT window_start, {_hll_est_case()} AS est_users
      FROM agg),
    ex AS (SELECT window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
           FROM assigned GROUP BY window_start)
    SELECT e.window_start, e.est_users, x.exact_users
    FROM est e JOIN ex x ON e.window_start = x.window_start
    """


@register("sliding_window_distinct_sketch", oracle=_window_sketch_sql())
def q_sliding_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user ESTIMATES per sliding 2h/1h-hop window: the sketch
    and event-time families composed -- each event contributes its
    register rank to both covering windows, one aggregate, shuffle rows
    are (window, bucket, rank).  The unbounded-stream version of this
    (register MAX-merge state) is ``stream_sketch_registers``; exact
    counts ride along as visible error evidence."""
    e = read_events(spark, sf_dir).select(
        F.window("ts", "2 hours", "1 hour").alias("w"), "user_id"
    ).select(F.col("w.start").alias("window_start"), "user_id")
    regs = hll_registers(e, ["window_start"], "user_id", _SKETCH_M)
    est = hll_estimate(regs, ["window_start"], _SKETCH_M).withColumnRenamed(
        "est", "est_users"
    )
    exact = e.groupBy("window_start").agg(F.countDistinct("user_id").alias("exact_users"))
    return est.join(exact, "window_start")


# --------------------------------------------------------------------------
# A-Priori frequent-pair mining (market basket)
# --------------------------------------------------------------------------


@register(
    "frequent_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
    nb AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM items),
    ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_i FROM items GROUP BY item),
    pruned AS (
      SELECT i.basket, i.item, ic.n_i FROM items i
      JOIN ic ON ic.item = i.item WHERE ic.n_i >= 2),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, a.n_i AS n_a, b.n_i AS n_b
      FROM pruned a JOIN pruned b
        ON a.basket = b.basket AND a.item < b.item),
    counted AS (
      SELECT item_a, item_b, n_a, n_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM pairs GROUP BY item_a, item_b, n_a, n_b)
    SELECT item_a, item_b, n_ab, n_a, n_b,
           CAST(FLOOR((n_ab * CAST(nb.n AS DOUBLE) / (n_a * n_b)) * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS lift
    FROM counted CROSS JOIN nb
    WHERE n_ab >= 2
    """,
)
def q_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market basket over order lineitems: part pairs co-shipping in >= 2
    orders, with exact counts and 6dp-half-up lift.  A-Priori downward
    closure prunes infrequent items BEFORE the per-basket self-join --
    candidates-then-verify on an anti-monotone bound."""
    from ..operators.mining import frequent_pairs

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # max_basket_items=None: the oracle applies NO basket cap, so the
    # registered query must not either -- with the default cap the hash
    # contract would silently depend on fixture baskets staying narrower
    # than 1000 items (r7 ADVICE).  The cap stays the operator's default
    # for production use; correctness queries mirror their oracle exactly.
    return frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=2, max_basket_items=None
    )


# --------------------------------------------------------------------------
# Window rank family, robust outliers, Markov transitions
# --------------------------------------------------------------------------


@register(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
           CAST(FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) AS BIGINT) / 1000000.0
             AS prank,
           CAST(FLOOR(CUME_DIST() OVER w * 1000000 + 0.5) AS BIGINT) / 1000000.0
             AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking trio -- dense_rank, percent_rank, cume_dist
    -- over a total order (price, key) per priority; the ratios round
    half-up (they are ratios of small ints, the exact knife-edge
    engine-native ROUND splits on)."""
    from pyspark.sql import Window

    from ..operators.textstats import round_half_up

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.dense_rank().over(w).cast("long").alias("drank"),
        round_half_up(F.percent_rank().over(w), 6).alias("prank"),
        round_half_up(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "robust_outliers_mad",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority AS pri, quantile_disc(o_totalprice, 0.5) AS med
      FROM orders GROUP BY o_orderpriority),
    dev AS (
      SELECT m.pri, o.o_totalprice, ABS(o.o_totalprice - m.med) AS adev, m.med
      FROM orders o JOIN med m ON m.pri = o.o_orderpriority),
    mad AS (
      SELECT pri, ANY_VALUE(med) AS med, quantile_disc(adev, 0.5) AS mad
      FROM dev GROUP BY pri)
    SELECT d.pri,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN d.adev > 3 * m.mad THEN 1 END) AS BIGINT) AS n_outliers,
           ROUND(m.mad, 2) AS mad
    FROM dev d JOIN mad m ON m.pri = d.pri
    GROUP BY d.pri, m.mad
    """,
)
def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier detection per group -- mean/stddev
    z-scores move with the outliers they hunt; median and MAD do not.
    Both medians are percentile_disc (actual data values), so deviations
    and the 3xMAD fence are exact doubles the oracle reproduces."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"), "o_totalprice"
    )
    med = o.groupBy("pri").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("med")
    )
    dev = o.join(med, "pri").withColumn(
        "adev", F.abs(F.col("o_totalprice") - F.col("med"))
    )
    mad = dev.groupBy("pri").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    return (
        dev.join(mad, "pri")
        .groupBy("pri", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1)).alias("n_outliers"),
        )
        .select("pri", "n", "n_outliers", F.round("mad", 2).alias("mad"))
    )


@register(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    t AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type),
    tot AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_n FROM t GROUP BY prev_type)
    SELECT t.prev_type, t.event_type, t.n,
           CAST(FLOOR((CAST(t.n AS DOUBLE) / tot.row_n) * 1000000 + 0.5) AS BIGINT)
             / 1000000.0 AS p
    FROM t JOIN tot ON tot.prev_type = t.prev_type
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (path analysis: what follows a view?): one lag window per
    user, transition counts, row-normalized probabilities (half-up --
    ratios of small ints)."""
    from pyspark.sql import Window

    from ..operators.textstats import round_half_up

    e = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = t.groupBy("prev_type").agg(F.sum("n").cast("long").alias("row_n"))
    return t.join(tot, "prev_type").select(
        "prev_type",
        "event_type",
        "n",
        round_half_up(F.col("n") / F.col("row_n"), 6).alias("p"),
    )


# --------------------------------------------------------------------------
# Triangle counting on the co-purchase graph
# --------------------------------------------------------------------------


@register(
    "triangle_copurchase_parts",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
    pairs AS (
      SELECT a.item AS lo, b.item AS hi, COUNT(*) AS n_ab
      FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item),
    e AS (SELECT lo AS a, hi AS b FROM pairs WHERE n_ab >= 2),
    wedges AS (
      SELECT x.a, x.b, y.b AS c
      FROM e x JOIN e y ON y.a = x.b),
    tri AS (
      SELECT w.a, w.b, w.c FROM wedges w JOIN e z ON z.a = w.a AND z.b = w.c)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles
    """,
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (edges = part pairs
    co-occurring in >= 2 orders): ordered-wedge enumeration + closing
    join, each triangle counted once in vertex-sorted form.  Completes
    the graph family (components, PageRank, hierarchy, triangles)."""
    from ..operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    items = li.distinct()
    a = items.select(F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("ia"))
    b = items.select(F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("ib"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy(F.col("ia").alias("lo"), F.col("ib").alias("hi"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    return triangle_count(pairs, "lo", "hi")


# --------------------------------------------------------------------------
# CUSUM drift detection (exact integer SPC)
# --------------------------------------------------------------------------


@register(
    "cusum_revenue_alerts",
    oracle=f"""
    WITH cdaily AS (
      SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2),
    {_cusum_ctes("cdaily", "cents")}
    SELECT c.pri, c.day, CAST(c.cusum AS BIGINT) AS cusum,
           CAST(c.cusum > 8 * m.mad_v AS INTEGER) AS alert
    FROM cu c JOIN mad m ON m.pri = c.pri
    """,
)
def q_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-process-control drift detection on daily revenue:
    one-sided CUSUM of integer-cent deviations from the per-priority
    median, alerting past 8x the MAD -- the recursive reset collapses to
    prefix-sum-minus-running-min (two shared-partitioning windows, zero
    iteration), and every quantity is exact BIGINT so the alert days
    replay identically in any engine."""
    from ..operators.timeseries import cusum_positive

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.to_date("o_orderdate").alias("day")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents"))
    med = daily.groupBy("pri").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)").alias("med_cents")
    )
    dev = daily.join(med, "pri").withColumn("dev", F.col("cents") - F.col("med_cents"))
    mad = dev.groupBy("pri").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(dev))").alias("mad_cents")
    )
    cu = cusum_positive(dev.select("pri", "day", "dev"), "pri", "day", "dev")
    return cu.join(mad, "pri").select(
        "pri",
        "day",
        "cusum",
        (F.col("cusum") > 8 * F.col("mad_cents")).cast("int").alias("alert"),
    )


# --------------------------------------------------------------------------
# Skyline / Pareto frontier
# --------------------------------------------------------------------------


@register(
    "skyline_record_orders",
    oracle="""
    WITH pts AS (
      SELECT DISTINCT o_totalprice AS price,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_no
      FROM orders)
    SELECT p.price, CAST(p.day_no AS BIGINT) AS day_no
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price >= p.price AND q.day_no <= p.day_no
        AND (q.price > p.price OR q.day_no < p.day_no))
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-setting orders: the Pareto frontier maximizing price and
    minimizing order date -- every frontier point was the largest order
    ever seen at its date.  Two-phase distributed skyline (bucketed
    local frontiers -> frontier-sized final pass) vs the oracle's
    quadratic NOT EXISTS."""
    from ..operators.skyline import skyline_2d

    o = _t(spark, sf_dir, "orders")
    base = F.lit("1995-01-01").cast("date")
    pts = o.select(
        F.col("o_totalprice").alias("price"),
        F.datediff(F.to_date("o_orderdate"), base).cast("long").alias("day_no"),
    )
    return skyline_2d(pts, "price", "day_no")


# --------------------------------------------------------------------------
# Cumulative reach; largest-remainder allocation
# --------------------------------------------------------------------------


@register(
    "cumulative_user_reach",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id),
    daily_new AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_day),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT d.day,
           CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS reach
    FROM days d LEFT JOIN daily_new n ON n.day = d.day
    """,
)
def q_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative reach (distinct users ever seen, per day) WITHOUT a
    running COUNT(DISTINCT): each user collapses to a first-seen day
    (one aggregate), daily first-seen counts cumulative-sum over the
    date spine.  The running-distinct window every analytics team writes
    quadratically, done in two map-side-combinable aggregates + one
    dim-sized window.  The global-order window is legitimate HERE
    because its input is the per-day table (bounded by the calendar,
    not the event volume) -- the first-seen collapse is precisely what
    buys that."""
    from pyspark.sql import Window

    e = read_events(spark, sf_dir).select(F.to_date("ts").alias("day"), "user_id")
    firsts = e.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily_new = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    days = e.select("day").distinct()
    joined = days.join(daily_new, "day", "left").select(
        "day", F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return joined.withColumn("reach", F.sum("new_users").over(w).cast("long"))


@register(
    "allocate_fleet_largest_remainder",
    oracle="""
    WITH w AS (
      SELECT c_nationkey AS nation, CAST(COUNT(*) AS BIGINT) AS weight
      FROM customer GROUP BY c_nationkey),
    tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS tw FROM w),
    q AS (
      SELECT nation, weight,
             (weight * 1000) // tw AS base,
             (weight * 1000) % tw AS rem
      FROM w CROSS JOIN tot),
    ranked AS (
      SELECT q.*,
             ROW_NUMBER() OVER (ORDER BY rem DESC, nation) AS rk,
             CAST(1000 - (SELECT SUM(base) FROM q) AS BIGINT) AS leftover
      FROM q)
    SELECT nation, weight,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS allocated
    FROM ranked
    """,
)
def q_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional integer allocation by LARGEST REMAINDER (Hamilton's
    method): split a fleet of 1000 vehicles across nations by customer
    count so the allocations are integers summing EXACTLY to 1000 --
    floor quotas plus one extra for the largest fractional remainders
    (deterministic tie-break).  Pure BIGINT arithmetic: quota floors and
    remainders via integer div/mod, ranked by one dim-sized window; the
    float-rounding version misallocates and never sums exactly."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    total = 1000
    w = c.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )
    tot = w.agg(F.sum("weight").cast("long").alias("tw"))
    q = w.crossJoin(F.broadcast(tot)).select(
        "nation",
        "weight",
        F.expr(f"(weight * {total}) div tw").alias("base"),
        ((F.col("weight") * total) % F.col("tw")).alias("rem"),
    )
    base_sum = q.agg(F.sum("base").cast("long").alias("bs"))
    win = Window.orderBy(F.desc("rem"), F.asc("nation"))
    ranked = q.crossJoin(F.broadcast(base_sum)).withColumn(
        "rk", F.row_number().over(win)
    )
    return ranked.select(
        "nation",
        "weight",
        (
            F.col("base")
            + F.when(F.col("rk") <= (F.lit(total) - F.col("bs")), 1).otherwise(0)
        )
        .cast("long")
        .alias("allocated"),
    )


# --------------------------------------------------------------------------
# Calendar-aligned week-over-week growth
# --------------------------------------------------------------------------


@register(
    "weekly_revenue_wow_growth",
    oracle="""
    WITH weekly AS (
      SELECT date_trunc('week', CAST(o_orderdate AS DATE)) AS week,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1)
    SELECT w.week, w.cents,
           p.cents AS prev_cents,
           CASE WHEN p.cents IS NULL THEN NULL
                ELSE CAST(FLOOR(((w.cents - p.cents) * 10000.0 / p.cents)) AS BIGINT)
           END AS growth_bps
    FROM weekly w
    LEFT JOIN weekly p ON p.week = w.week - INTERVAL 7 DAY
    """,
)
def q_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth aligned by CALENDAR, not by row offset: the
    previous week comes from a date-shifted self join, so a MISSING week
    yields NULL growth instead of silently comparing against whatever
    row happened to precede (the lag(1) bug every reporting stack ships
    once).  Growth in integer basis points (floor) -- exact BIGINT."""
    weekly = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date(F.date_trunc("week", F.to_date("o_orderdate"))).alias("week"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    prev = weekly.select(
        F.date_add(F.col("week"), 7).alias("week"),
        F.col("cents").alias("prev_cents"),
    )
    return weekly.join(prev, "week", "left").select(
        "week",
        "cents",
        "prev_cents",
        F.floor(
            (F.col("cents") - F.col("prev_cents")) * 10000.0 / F.col("prev_cents")
        )
        .cast("long")
        .alias("growth_bps"),
    )


# --------------------------------------------------------------------------
# Capstone composition: gap-fill -> CUSUM -> capacity allocation
# --------------------------------------------------------------------------


@register(
    "ops_drift_capacity_pipeline",
    oracle=f"""
    WITH {_GAPFILL_CTES},
    filled AS (
      SELECT pri, day,
             CAST(FLOOR(({_INTERP_CASE}) * 10000 + 0.5) AS BIGINT) AS units
      FROM f),
    {_cusum_ctes("filled", "units")},
    alerts AS (
      SELECT c.pri,
             CAST(COUNT(CASE WHEN c.cusum > 8 * m.mad_v THEN 1 END) AS BIGINT)
               AS n_alert_days
      FROM cu c JOIN mad m ON m.pri = c.pri GROUP BY c.pri),
    w AS (SELECT pri, n_alert_days, n_alert_days + 1 AS weight FROM alerts),
    tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS tw FROM w),
    q AS (
      SELECT pri, n_alert_days, weight,
             (weight * 100) // tw AS base, (weight * 100) % tw AS rem
      FROM w CROSS JOIN tot),
    ranked AS (
      SELECT q.*, ROW_NUMBER() OVER (ORDER BY rem DESC, pri) AS rk,
             CAST(100 - (SELECT SUM(base) FROM q) AS BIGINT) AS leftover
      FROM q)
    SELECT pri, n_alert_days,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS inspect_slots
    FROM ranked
    """,
)
def q_ops_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition of three r7 operators, one oracle replaying
    the whole chain: per-priority daily revenue -> dense gap-filled
    series (resample_interpolate, quantized to exact 1e-4 units) ->
    integer CUSUM drift alerts (8x MAD) -> largest-remainder allocation
    of 100 inspection slots by alert load (+1 Laplace weight so a
    zero-alert round still allocates).  Every stage is a verified
    operator; the composition proves they compose exactly."""
    from pyspark.sql import Window

    from ..operators.timeseries import cusum_positive, resample_interpolate

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.to_date("o_orderdate").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    from ..operators.dedup import _cache_aged

    # The gap-filled series fans out to FOUR consumers (median, dev,
    # MAD, CUSUM); uncached, the whole interpolation subtree (spine
    # join + windows) replays once per branch -- materialized-action
    # profiling measured the duplication at ~4x the pipeline's real
    # cost.  Same for dev (feeds MAD + CUSUM).
    filled = _cache_aged(
        "ops_drift.filled",
        resample_interpolate(daily, "pri", "day", "rev").select(
            "pri",
            "day",
            F.floor(F.col("rev_filled") * 10000 + 0.5).cast("long").alias("units"),
        ),
    )
    med = filled.groupBy("pri").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY units)").alias("med_u")
    )
    dev = _cache_aged(
        "ops_drift.dev",
        filled.join(med, "pri").withColumn("dev", F.col("units") - F.col("med_u")),
    )
    mad = dev.groupBy("pri").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(dev))").alias("mad_u")
    )
    cu = cusum_positive(dev.select("pri", "day", "dev"), "pri", "day", "dev")
    alerts = (
        cu.join(mad, "pri")
        .groupBy("pri")
        .agg(
            F.count(F.when(F.col("cusum") > 8 * F.col("mad_u"), 1))
            .cast("long")
            .alias("n_alert_days")
        )
    )
    w = alerts.withColumn("weight", F.col("n_alert_days") + 1)
    tot = w.agg(F.sum("weight").cast("long").alias("tw"))
    q = w.crossJoin(F.broadcast(tot)).select(
        "pri",
        "n_alert_days",
        "weight",
        F.expr("(weight * 100) div tw").alias("base"),
        ((F.col("weight") * 100) % F.col("tw")).alias("rem"),
    )
    bs = q.agg(F.sum("base").cast("long").alias("bs"))
    win = Window.orderBy(F.desc("rem"), F.asc("pri"))
    ranked = q.crossJoin(F.broadcast(bs)).withColumn("rk", F.row_number().over(win))
    return ranked.select(
        "pri",
        "n_alert_days",
        (
            F.col("base") + F.when(F.col("rk") <= (F.lit(100) - F.col("bs")), 1).otherwise(0)
        )
        .cast("long")
        .alias("inspect_slots"),
    )


# --------------------------------------------------------------------------
# Grouped linear regression; accumulating snapshot
# --------------------------------------------------------------------------


@register(
    "regression_price_vs_quantity",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped closed-form linear regression (price ~ quantity) via the
    SQL-standard REGR_* aggregates -- one map-side-combinable pass
    computing slope/intercept/R2 per group, no ML pipeline, no
    iteration.  Rounded to absorb summation-order ulps (the corr-family
    precedent)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("long").alias("n"),
    )


@register(
    "order_lifecycle_snapshot",
    oracle="""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           MIN(CAST(l.l_shipdate AS DATE)) AS first_ship,
           MAX(CAST(l.l_shipdate AS DATE)) AS last_ship,
           CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                          MAX(CAST(l.l_shipdate AS DATE))) AS BIGINT)
             AS days_to_complete,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS line_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
)
def q_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kimball ACCUMULATING SNAPSHOT: one row per order carrying its
    lifecycle milestones (placed -> first ship -> last ship) plus
    degenerate measures -- the fact-table shape that answers cycle-time
    questions without touching the line grain twice.  Exact: dates,
    integer day spans, integer cents."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship"), "l_extendedprice"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "order_date")
        .agg(
            F.min("ship").alias("first_ship"),
            F.max("ship").alias("last_ship"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("line_cents"),
        )
        .withColumn(
            "days_to_complete",
            F.datediff("last_ship", "order_date").cast("long"),
        )
    )


# --------------------------------------------------------------------------
# FIFO supply-to-demand matching (cumulative-interval intersection)
# --------------------------------------------------------------------------


@register(
    "fifo_match_demand_to_suppliers",
    oracle="""
    WITH d AS (
      SELECT l_partkey, l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_suppkey, l_quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_hi
      FROM lineitem),
    dd AS (SELECT l_partkey, l_orderkey, l_linenumber, qty,
                  d_hi - qty AS d_lo, d_hi FROM d),
    s0 AS (
      SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sqty
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    s AS (
      SELECT l_partkey, l_suppkey, sqty,
             SUM(sqty) OVER (PARTITION BY l_partkey ORDER BY l_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_hi
      FROM s0),
    ss AS (SELECT l_partkey, l_suppkey, s_hi - sqty AS s_lo, s_hi FROM s)
    SELECT dd.l_partkey, dd.l_orderkey, dd.l_linenumber, ss.l_suppkey,
           CAST(LEAST(dd.d_hi, ss.s_hi) - GREATEST(dd.d_lo, ss.s_lo) AS BIGINT)
             AS qty_alloc
    FROM dd JOIN ss
      ON ss.l_partkey = dd.l_partkey
     AND dd.d_lo < ss.s_hi AND ss.s_lo < dd.d_hi
    """,
)
def q_fifo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching as CUMULATIVE-INTERVAL INTERSECTION: demand
    lines (ship-date order) and supplier lots (key order) each become
    half-open ranges on the per-part cumulative-quantity axis; a demand
    consumes from a lot exactly where their ranges overlap, and the
    allocated quantity is the overlap length.  The procedural
    two-pointer loop every ERP writes becomes two partitioned running
    sums plus one bounded range join -- exact BIGINT units, total
    allocations provably equal total demand.  Completes against the
    same-table supplier lots, so supply == demand per part by
    construction."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"), "l_shipdate",
    )
    # (orderkey, linenumber) is NOT unique in the synthetic fixture --
    # the FIFO ordering must be TOTAL or the two engines may order tied
    # rows differently and allocate different lots; suppkey + qty extend
    # the key, and any rows still tied are identical in every column the
    # allocation reads, so a swap cannot change the result.
    wd = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_suppkey", "qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = li.select(
        "l_partkey", "l_orderkey", "l_linenumber", "qty",
        F.sum("qty").over(wd).alias("d_hi"),
    ).withColumn("d_lo", F.col("d_hi") - F.col("qty"))
    s0 = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("qty").cast("long").alias("sqty"))
    ws = (
        Window.partitionBy("l_partkey")
        .orderBy("l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ss = s0.select(
        F.col("l_partkey").alias("s_part"), "l_suppkey",
        F.sum("sqty").over(ws).alias("s_hi"), "sqty",
    ).withColumn("s_lo", F.col("s_hi") - F.col("sqty"))
    joined = dd.join(
        ss,
        (dd["l_partkey"] == ss["s_part"])
        & (dd["d_lo"] < ss["s_hi"])
        & (ss["s_lo"] < dd["d_hi"]),
    )
    return joined.select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_suppkey",
        (F.least("d_hi", "s_hi") - F.greatest("d_lo", "s_lo")).cast("long").alias("qty_alloc"),
    )


# --------------------------------------------------------------------------
# Prefix-filtered exact set-similarity join (same oracle as the naive join)
# --------------------------------------------------------------------------

from .registry import ORACLE as _ORACLE  # noqa: E402


@register("dedup_jaccard_prefix", oracle=_ORACLE["dedup_jaccard_pairs"])
def q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs prefix filtering: the EXACT Jaccard>=0.5 pair set through
    a rarest-shingles-first candidate join -- registered against the
    IDENTICAL oracle string as ``dedup_jaccard_pairs``, so the driver
    hash-proves the lossless-filter claim (two physical plans, one
    answer)."""
    from ..operators.dedup import jaccard_pairs_prefix

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return jaccard_pairs_prefix(docs, "doc_id", "text", threshold=0.5)


# --------------------------------------------------------------------------
# Spatial hotspots; referential-integrity audit; Benford digit audit
# --------------------------------------------------------------------------


@register(
    "spatial_hotspot_cells",
    oracle=f"""
    WITH pts AS (SELECT c_custkey, {_xy_sql('x', 'c_custkey')} FROM customer),
    cells AS (
      SELECT x // {_NN_RADIUS} AS cx, y // {_NN_RADIUS} AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2),
    hood AS (
      SELECT a.cx, a.cy, a.n,
             CAST(SUM(b.n) AS BIGINT) AS hood_n,
             CAST(COUNT(*) AS BIGINT) AS hood_cells
      FROM cells a JOIN cells b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
      GROUP BY a.cx, a.cy, a.n),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS k FROM cells)
    SELECT h.cx, h.cy, h.n, h.hood_n,
           CAST(h.hood_n * tot.k > 2 * h.hood_cells * tot.t AS INTEGER) AS hotspot
    FROM hood h CROSS JOIN tot
    """,
)
def q_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hotspot detection (Getis-Ord shape, integer-exact): cell
    occupancy counts, 3x3 neighborhood sums via the same cell-adjacency
    join as the NN operator, flagged where the neighborhood density
    exceeds 2x the global mean -- the density comparison cross-multiplies
    so the entire statistic stays BIGINT."""
    from ..operators.spatial import hashed_coords

    pts = hashed_coords(
        _t(spark, sf_dir, "customer").select("c_custkey"), "c_custkey", _GRID_SCALE
    )
    cells = pts.groupBy(
        (F.col("x") / _NN_RADIUS).cast("long").alias("cx"),
        (F.col("y") / _NN_RADIUS).cast("long").alias("cy"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = cells.select(F.col("cx").alias("acx"), F.col("cy").alias("acy"), F.col("n").alias("an"))
    hood = (
        a.join(
            cells,
            (F.abs(F.col("acx") - F.col("cx")) <= 1)
            & (F.abs(F.col("acy") - F.col("cy")) <= 1),
        )
        .groupBy(F.col("acx").alias("cx"), F.col("acy").alias("cy"), F.col("an").alias("n"))
        .agg(
            F.sum("n").cast("long").alias("hood_n"),
            F.count(F.lit(1)).cast("long").alias("hood_cells"),
        )
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("k")
    )
    return hood.crossJoin(F.broadcast(tot)).select(
        "cx", "cy", "n", "hood_n",
        (F.col("hood_n") * F.col("k") > 2 * F.col("hood_cells") * F.col("t"))
        .cast("int")
        .alias("hotspot"),
    )


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
             AS orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey -> supplier',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
    """,
)
def q_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    per FK edge via left-anti joins (each plans as one broadcast/shuffle
    anti join -- never a per-row subquery).  The governance health check
    every warehouse runs nightly."""
    checks = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for label, child, fk, parent, pk in checks:
        c = _t(spark, sf_dir, child).select(F.col(fk).alias("k"))
        p = _t(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        n = c.join(p, "k", "left_anti").agg(F.count(F.lit(1)).cast("long").alias("orphans"))
        row = n.select(F.lit(label).alias("fk"), "orphans")
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "benford_first_digit_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice > 0),
    obs AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs)
    SELECT obs.d, obs.n,
           CAST(FLOOR((CAST(obs.n AS DOUBLE) / tot.t) * 1000000 + 0.5) AS BIGINT)
             / 1000000.0 AS observed_p,
           CAST(FLOOR(log10(1.0 + 1.0 / obs.d) * 1000000 + 0.5) AS BIGINT)
             / 1000000.0 AS benford_p
    FROM obs CROSS JOIN tot
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts (the classic
    fabricated-numbers screen): observed first-significant-digit shares
    vs log10(1 + 1/d), both half-up at 6dp.  Digits come from the exact
    integer-cents string -- no float log extraction."""
    from ..operators.textstats import round_half_up

    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").cast("long").alias("t"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        round_half_up(F.col("n") / F.col("t"), 6).alias("observed_p"),
        round_half_up(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d")), 6).alias("benford_p"),
    )


# --------------------------------------------------------------------------
# Counter-reset repair; revenue bridge
# --------------------------------------------------------------------------


@register(
    "counter_reset_repair",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS raw,
             LAG(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS prev_raw
      FROM events WHERE event_type = 'view'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    deltas AS (
      SELECT user_id, ts, event_id, raw,
             CASE WHEN prev_raw IS NULL THEN raw
                  WHEN raw >= prev_raw THEN raw - prev_raw
                  ELSE raw END AS delta,
             CAST(prev_raw IS NOT NULL AND raw < prev_raw AS INTEGER) AS was_reset
      FROM seq)
    SELECT user_id, event_id, raw,
           CAST(SUM(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS true_cumulative,
           was_reset
    FROM deltas
    """,
)
def q_counter_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter repair (the odometer/telemetry reset problem):
    a cumulative gauge that drops below its predecessor has reset, and
    the true cumulative is the running sum of non-negative deltas with
    each reset contributing its post-reset reading.  One lag + one
    running sum per key, exact integer centi-units; Prometheus's
    ``increase()`` semantics as a batch operator."""
    from ..operators.timeseries import counter_repair

    e = read_events(spark, sf_dir).filter(F.col("event_type") == "view")
    raw = F.round(F.col("value") * 100).cast("long")
    seq = e.select("user_id", "ts", "event_id", raw.alias("raw"))
    out = counter_repair(seq, "user_id", ["ts", "event_id"], "raw")
    return out.select("user_id", "event_id", "raw", "true_cumulative", "was_reset")


@register(
    "revenue_bridge_h1_vs_h2",
    oracle="""
    WITH p1 AS (
      SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey),
    p2 AS (
      SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey),
    joined AS (
      SELECT COALESCE(p1.o_custkey, p2.o_custkey) AS k,
             COALESCE(p1.c, 0) AS c1, COALESCE(p2.c, 0) AS c2
      FROM p1 FULL OUTER JOIN p2 ON p2.o_custkey = p1.o_custkey)
    SELECT CASE WHEN c1 = 0 THEN 'new'
                WHEN c2 = 0 THEN 'churned'
                WHEN c2 > c1 THEN 'expansion'
                WHEN c2 < c1 THEN 'contraction'
                ELSE 'flat' END AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(c2 - c1) AS BIGINT) AS bridge_cents
    FROM joined GROUP BY 1
    """,
)
def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue BRIDGE (waterfall) between two periods: every customer
    classifies as new / churned / expansion / contraction / flat via a
    full-outer join of per-period totals, and the per-segment deltas sum
    exactly to total revenue movement -- the period-over-period
    decomposition finance asks for, in exact integer cents."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cut = F.lit("1998-01-01 00:00:00").cast("timestamp")
    p1 = o.filter(F.col("o_orderdate") < cut).groupBy("o_custkey").agg(
        F.sum("cents").cast("long").alias("c1")
    )
    p2 = o.filter(F.col("o_orderdate") >= cut).groupBy("o_custkey").agg(
        F.sum("cents").cast("long").alias("c2")
    )
    joined = (
        p1.join(p2, "o_custkey", "full_outer")
        .select(
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    seg = (
        F.when(F.col("c1") == 0, "new")
        .when(F.col("c2") == 0, "churned")
        .when(F.col("c2") > F.col("c1"), "expansion")
        .when(F.col("c2") < F.col("c1"), "contraction")
        .otherwise("flat")
    )
    return joined.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c2") - F.col("c1")).cast("long").alias("bridge_cents"),
    )


# --------------------------------------------------------------------------
# RFM segmentation; cohort LTV curve
# --------------------------------------------------------------------------


@register(
    "rfm_customer_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)), DATE '2001-09-01')
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary
      FROM orders GROUP BY o_custkey),
    e AS (
      SELECT quantile_disc(recency_days, 0.5) AS r_med,
             quantile_disc(frequency, 0.5) AS f_med,
             quantile_disc(monetary, 0.5) AS m_med
      FROM rfm),
    scored AS (
      SELECT CASE WHEN recency_days <= e.r_med THEN 1 ELSE 0 END AS r_hi,
             CASE WHEN frequency > e.f_med THEN 1 ELSE 0 END AS f_hi,
             CASE WHEN monetary > e.m_med THEN 1 ELSE 0 END AS m_hi,
             monetary
      FROM rfm CROSS JOIN e)
    SELECT r_hi, f_hi, m_hi,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS BIGINT) AS segment_cents
    FROM scored GROUP BY r_hi, f_hi, m_hi
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation with EXACT median splits: recency / frequency /
    monetary per customer, each scored against its percentile_disc
    median (actual data values -- cross-engine-exact comparisons), eight
    binary segments with population and revenue.  The CRM workhorse,
    deterministic end to end."""
    o = _t(spark, sf_dir, "orders")
    anchor = F.lit("2001-09-01").cast("date")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(anchor, F.max(F.to_date("o_orderdate"))).cast("long").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("monetary"),
    )
    e = rfm.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY recency_days)").alias("r_med"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY frequency)").alias("f_med"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY monetary)").alias("m_med"),
    )
    scored = rfm.crossJoin(F.broadcast(e)).select(
        F.when(F.col("recency_days") <= F.col("r_med"), 1).otherwise(0).alias("r_hi"),
        F.when(F.col("frequency") > F.col("f_med"), 1).otherwise(0).alias("f_hi"),
        F.when(F.col("monetary") > F.col("m_med"), 1).otherwise(0).alias("m_hi"),
        "monetary",
    )
    return scored.groupBy("r_hi", "f_hi", "m_hi").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary").cast("long").alias("segment_cents"),
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             date_trunc('year', MIN(CAST(o_orderdate AS DATE))) AS cohort
      FROM orders GROUP BY o_custkey),
    rev AS (
      SELECT f.cohort,
             date_diff('year', f.cohort,
                       date_trunc('year', CAST(o.o_orderdate AS DATE))) AS age_years,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey),
    agg AS (
      SELECT cohort, age_years, CAST(SUM(cents) AS BIGINT) AS cents
      FROM rev GROUP BY cohort, age_years)
    SELECT CAST(cohort AS DATE) AS cohort, CAST(age_years AS BIGINT) AS age_years,
           cents,
           CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY age_years
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_cents
    FROM agg
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: customers cohorted by first-order year, revenue
    accumulated by cohort age -- the lifetime-value grid subscription
    analytics reads daily.  First-seen collapse + one windowed cumsum per
    cohort, exact integer cents."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    firsts = o.groupBy("o_custkey").agg(
        F.to_date(F.date_trunc("year", F.min("day"))).alias("cohort")
    )
    rev = o.join(firsts, "o_custkey").select(
        "cohort",
        (F.year(F.col("day")) - F.year(F.col("cohort"))).cast("long").alias("age_years"),
        "cents",
    )
    agg = rev.groupBy("cohort", "age_years").agg(F.sum("cents").cast("long").alias("cents"))
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_years")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return agg.withColumn("cum_cents", F.sum("cents").over(w).cast("long"))


# --------------------------------------------------------------------------
# Forecast backtest (seasonal naive); sweep-line peak concurrency
# --------------------------------------------------------------------------


@register(
    "forecast_backtest_seasonal_naive",
    oracle=f"""
    WITH {_GAPFILL_CTES},
    filled AS (
      SELECT pri, day,
             CAST(FLOOR(({_INTERP_CASE}) * 10000 + 0.5) AS BIGINT) AS units
      FROM f),
    pred AS (
      SELECT a.pri, a.day, a.units,
             l.units AS yhat
      FROM filled a JOIN filled l
        ON l.pri = a.pri AND l.day = a.day - INTERVAL 7 DAY)
    SELECT pri,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ABS(units - yhat)) AS BIGINT) AS abs_err_units,
           CAST(FLOOR((CAST(SUM(ABS(units - yhat)) AS DOUBLE) / COUNT(*))
                * 100 + 0.5) AS BIGINT) / 100.0 AS mae_units
    FROM pred GROUP BY pri
    """,
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST of the seasonal-naive baseline (predict today =
    same weekday last week) on the gap-filled revenue series: absolute
    errors in exact 1e-4 units, MAE half-up at 2dp.  The evaluation
    harness every forecasting effort needs BEFORE any model -- a model
    that can't beat seasonal-naive MAE is noise; the date-shifted self
    join reuses the WoW-alignment idiom."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.to_date("o_orderdate").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    from ..operators.dedup import _cache_aged

    # filled self-joins against its own date-shifted copy -- uncached,
    # the interpolation subtree replays on both sides of the join.
    filled = _cache_aged(
        "forecast_backtest.filled",
        resample_interpolate(daily, "pri", "day", "rev").select(
            "pri", "day",
            F.floor(F.col("rev_filled") * 10000 + 0.5).cast("long").alias("units"),
        ),
    )
    lagged = filled.select(
        "pri", F.date_add("day", 7).alias("day"), F.col("units").alias("yhat")
    )
    pred = filled.join(lagged, ["pri", "day"])
    err = F.abs(F.col("units") - F.col("yhat"))
    from ..operators.textstats import round_half_up

    return pred.groupBy("pri").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(err).cast("long").alias("abs_err_units"),
        round_half_up(F.sum(err) / F.count(F.lit(1)), 2).alias("mae_units"),
    )


@register(
    "peak_concurrent_order_windows",
    oracle="""
    WITH ev AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS d,
             CAST(1 AS BIGINT) AS delta
      FROM orders
      UNION ALL
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 8,
             CAST(-1 AS BIGINT)
      FROM orders),
    per_day AS (SELECT d, CAST(SUM(delta) AS BIGINT) AS net FROM ev GROUP BY d),
    run AS (
      SELECT d, SUM(net) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
      FROM per_day)
    SELECT CAST(MAX(live) AS BIGINT) AS peak_concurrent,
           CAST((SELECT d FROM run ORDER BY live DESC, d ASC LIMIT 1) AS BIGINT)
             AS peak_day_no
    FROM run
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by SWEEP LINE: each 8-day order window emits a
    +1 open and a -1 close event, net changes aggregate per day (the
    heavy reduction -- map-side combinable), and one calendar-bounded
    running sum finds the maximum simultaneous load and its day.  The
    interval-overlap question at its cheapest: no pair join at all when
    only the COUNT of concurrent intervals matters."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    base = F.lit("1995-01-01").cast("date")
    d0 = F.datediff(F.to_date("o_orderdate"), base).cast("long")
    opens = o.select(d0.alias("d"), F.lit(1).cast("long").alias("delta"))
    closes = o.select((d0 + 8).alias("d"), F.lit(-1).cast("long").alias("delta"))
    per_day = opens.unionByName(closes).groupBy("d").agg(
        F.sum("delta").cast("long").alias("net")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    run = per_day.withColumn("live", F.sum("net").over(w))
    peak = run.orderBy(F.desc("live"), F.asc("d")).limit(1)
    return peak.select(
        F.col("live").cast("long").alias("peak_concurrent"),
        F.col("d").cast("long").alias("peak_day_no"),
    )


# --------------------------------------------------------------------------
# Event-lateness audit (watermark tuning evidence)
# --------------------------------------------------------------------------


@register(
    "event_lateness_audit",
    oracle="""
    WITH arr AS (
      SELECT event_id, ts, CAST(ts AS DATE) AS d,
             CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 2, 15)) AS BIGINT)
               AS h
      FROM events),
    seq AS (
      SELECT event_id, ts,
             MAX(ts) OVER (ORDER BY d, h, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS high_water
      FROM arr),
    late AS (
      SELECT date_diff('second', ts, high_water) AS late_s FROM seq)
    SELECT CASE WHEN late_s = 0 THEN 'on_time'
                WHEN late_s <= 60 THEN 'within_1m'
                WHEN late_s <= 600 THEN 'within_10m'
                WHEN late_s <= 3600 THEN 'within_1h'
                ELSE 'over_1h' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s
    FROM late GROUP BY 1
    """,
)
def q_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How late does data actually arrive?  Per event, lateness = the
    stream's high-water mark at its arrival (running MAX of event time
    over arrival order, event_id as the arrival sequence) minus its own
    event time -- the exact measurement that justifies a watermark
    setting (SURVEY T2), bucketed for the ops dashboard.

    The fixture stream is perfectly ordered (event_id follows ts), so
    arrival is SIMULATED deterministically: events arrive day by day but
    hash-shuffled WITHIN each day (portable hash of event_id) -- the
    dirty-supplier derivation precedent applied to arrival order, giving
    a real intra-day lateness distribution both engines reproduce.

    The global running max runs as the repo's two-phase scheme (the
    ntile/pack_sequences pattern, here on MAX): day-range buckets as a
    pure function of the arrival day, per-bucket running max over the
    (day, hash, id) arrival order, driver-side prefix max over the tiny
    per-bucket maxima broadcast back -- no single-task window over the
    fact table; the oracle's one-window formulation hash-matches it
    exactly."""
    from ..operators.dedup import portable_base_hash
    from ..operators.windows import range_partition_ids
    from pyspark.sql import Window

    e = read_events(spark, sf_dir).select(
        "event_id",
        "ts",
        F.to_date("ts").alias("d"),
        portable_base_hash(F.col("event_id").cast("string")).alias("h"),
    )
    ranged = range_partition_ids(
        e.withColumn("__dno", F.datediff("d", F.lit("2024-01-01").cast("date"))),
        "__dno",
        32,
        desc=False,
    )
    bmax = {
        r["__pid"]: r["m"]
        for r in ranged.groupBy("__pid").agg(F.max("ts").alias("m")).collect()
    }
    prefix, acc = [], None
    for pid in sorted(bmax):
        prefix.append((pid, acc))
        acc = bmax[pid] if acc is None or bmax[pid] > acc else acc
    spark_sess = e.sparkSession
    pre_df = spark_sess.createDataFrame(
        [(p, m) for p, m in prefix], "__pid int, pre_max timestamp"
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("d", "h", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = (
        ranged.join(F.broadcast(pre_df), "__pid")
        .withColumn("local_max", F.max("ts").over(w))
        .withColumn("high_water", F.greatest(F.col("local_max"), F.coalesce(F.col("pre_max"), F.col("local_max"))))
    )
    late = seq.select(
        (F.unix_timestamp("high_water") - F.unix_timestamp("ts")).alias("late_s")
    )
    bucket = (
        F.when(F.col("late_s") == 0, "on_time")
        .when(F.col("late_s") <= 60, "within_1m")
        .when(F.col("late_s") <= 600, "within_10m")
        .when(F.col("late_s") <= 3600, "within_1h")
        .otherwise("over_1h")
    )
    return late.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("late_s").cast("long").alias("max_late_s"),
    )
