"""Round-8 widening: bounded BFS, sorted-neighborhood blocking,
fixed-point Gram matrix, key-skew audit, exact Gini concentration.

Each query follows the portable-oracle recipe (BIGINT arithmetic or the
floor half-up formula at every engine boundary) so the driver
hash-verifies values, not just shapes.  Reference parity: none of these
exist in the reference -- they extend the graph / entity-resolution /
embedding-analytics / engine-ops / business-analytics families the
engine already carries (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fuzzyjoin import sorted_neighborhood_pairs
from ..operators.graph import bfs_distances
from ..operators.similarity import gram_fixedpoint
from ..operators.skew import key_skew_profile
from ..operators.textstats import round_half_up, sql_round_half_up
from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# --------------------------------------------------------------------------
# Bounded multi-source BFS over the part<->supplier graph
# --------------------------------------------------------------------------

_BFS_DEPTH = 4
_BFS_SEEDS = 10


@register(
    "bfs_hops_part_supplier",
    oracle=f"""
    WITH RECURSIVE seeds AS (
      SELECT 2 * s_suppkey + 1 AS node FROM supplier
      ORDER BY s_acctbal DESC, s_suppkey LIMIT {_BFS_SEEDS}),
    e0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    walk(node, d) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT e.dst, walk.d + 1 FROM walk JOIN edges e ON e.src = walk.node
      WHERE walk.d < {_BFS_DEPTH}),
    dist AS (SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY node)
    SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS sum_node_ids
    FROM dist GROUP BY dist
    """,
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast-radius audit: min-hop distance from the 10 highest-balance
    suppliers over the symmetrized part<->supplier graph, bounded at 4
    hops; reported per ring (node count + id-sum invariant).  Distances
    are integers -> a recursive CTE with UNION-dedup replays the
    iterative min-relaxation exactly, making this the repo's
    hash-verified bounded-reachability primitive next to the CC /
    PageRank fixed points (`operators/graph.py::bfs_distances`)."""
    sup = _t(spark, sf_dir, "supplier")
    seeds = (
        sup.orderBy(F.col("s_acctbal").desc(), "s_suppkey")
        .limit(_BFS_SEEDS)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = li.unionByName(
        li.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    dist = bfs_distances(edges, seeds, max_depth=_BFS_DEPTH)
    return dist.groupBy("dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("node").cast("long").alias("sum_node_ids"),
    )


# --------------------------------------------------------------------------
# Sorted-neighborhood blocking (second ER blocking scheme)
# --------------------------------------------------------------------------

_SNB_WINDOW = 5
_SNB_MAXDIST = 3
# The same deterministic char-drop corruption fuzzy_match_suppliers uses,
# so the two blocking schemes are directly comparable on one input.
_DIRTY_POS = "CAST(s_suppkey % length(s_name) AS INT)"
_DIRTY_SQL = f"concat(substr(s_name, 1, {_DIRTY_POS}), substr(s_name, {_DIRTY_POS} + 2))"


@register(
    "snb_supplier_near_names",
    oracle=f"""
    WITH s AS (
      SELECT s_suppkey AS id, lower(trim({_DIRTY_SQL})) AS key FROM supplier),
    r AS (
      SELECT id, key, ROW_NUMBER() OVER (ORDER BY key, id) AS rn FROM s),
    p AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
      FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + {_SNB_WINDOW})
    SELECT id_a, id_b, dist FROM p WHERE dist <= {_SNB_MAXDIST}
    """,
)
def q_snb_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood entity resolution over corrupted supplier
    names: global sort by the dirty key (two-phase distributed rank, no
    single-task window), 5-row sliding window candidates, exact
    levenshtein <= 3 verify.  Complements ``fuzzy_match_suppliers``
    (deletion-neighborhood blocking): SNB catches edits outside any
    delete-d neighborhood whenever the sort still co-locates the pair.
    The oracle replays the identical total order (key, id) with a plain
    ROW_NUMBER -- the two-phase rank is provably the same ranking."""
    sup = _t(spark, sf_dir, "supplier")
    dirty = sup.select(
        F.col("s_suppkey").alias("sid"), F.expr(_DIRTY_SQL).alias("dname")
    )
    return sorted_neighborhood_pairs(
        dirty, "sid", "dname", window=_SNB_WINDOW, max_dist=_SNB_MAXDIST
    )


# --------------------------------------------------------------------------
# Fixed-point Gram matrix (X^T X) over the embedding table
# --------------------------------------------------------------------------

_GRAM_DIM = 64
_GRAM_SCALE = 1_000_000


@register(
    "embedding_gram_fixedpoint",
    oracle=f"""
    WITH v AS (
      SELECT list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_GRAM_SCALE} + 0.5) AS BIGINT)) AS vf
      FROM embeddings),
    g AS (
      SELECT gi.i AS i, gj.j AS j, vf[gi.i + 1] * vf[gj.j + 1] AS p
      FROM v
      CROSS JOIN (SELECT unnest(generate_series(0, {_GRAM_DIM - 1})) AS i) gi
      CROSS JOIN (SELECT unnest(generate_series(0, {_GRAM_DIM - 1})) AS j) gj
      WHERE gj.j >= gi.i)
    SELECT i, j, CAST(SUM(p) AS BIGINT) AS gram_fp FROM g GROUP BY i, j
    """,
)
def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X^T X over the 64-dim embedding table in exact fixed-point: the
    one-pass covariance/PCA building block, computed as an in-row
    upper-triangle expansion + one map-side-combinable sum (no
    self-join, shuffle bounded by d^2 partial sums -- row count never
    shuffles).  Quantizing components to 1e-6 units makes the sum exact
    integer arithmetic, so DuckDB reproduces all 2,080 cells
    bit-for-bit (`operators/similarity.py::gram_fixedpoint`)."""
    emb = _t(spark, sf_dir, "embeddings")
    return gram_fixedpoint(emb, "embedding", scale=_GRAM_SCALE, dim=_GRAM_DIM)


# --------------------------------------------------------------------------
# Join-key skew audit
# --------------------------------------------------------------------------


@register(
    "key_skew_audit",
    oracle=f"""
    WITH pk AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM pk),
    b AS (
      SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(n) AS BIGINT) AS n_rows
      FROM pk GROUP BY 1)
    SELECT bucket, n_keys, n_rows,
           {sql_round_half_up("n_rows / t.total", 6)} AS rows_share
    FROM b CROSS JOIN t
    """,
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew audit of the l_partkey join key: power-of-two frequency
    histogram (bucket = floor log2 of per-key count, via integer
    bit-length -- no transcendental log) with per-bucket key/row counts
    and exact 6dp row share.  The decision input for salting vs
    broadcast vs AQE skew join (`operators/skew.py::key_skew_profile`)."""
    li = _t(spark, sf_dir, "lineitem")
    return key_skew_profile(li, "l_partkey")


# --------------------------------------------------------------------------
# Exact Gini concentration of order value per segment
# --------------------------------------------------------------------------


@register(
    "gini_order_value_by_segment",
    oracle=f"""
    WITH oc AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o.o_orderkey
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    r AS (
      SELECT seg, cents,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, o_orderkey) AS rn
      FROM oc),
    a AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(rn * cents) AS BIGINT) AS t
      FROM r GROUP BY seg)
    SELECT seg, n,
           {sql_round_half_up(
               "CAST(2 * t - (n + 1) * s AS DOUBLE) / CAST(n * s AS DOUBLE)", 6
           )} AS gini
    FROM a
    """,
)
def q_gini_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of order value per market segment, via the
    rank formula Gini = (2*Σ rn*x - (n+1)*Σx) / (n*Σx) over integer
    CENTS: every sum is exact BIGINT (ties contribute identically under
    any tie order, so the result is deterministic), and only the final
    BIGINT->DOUBLE ratio crosses into floats -- identical IEEE rounding
    on both engines.  Revenue-concentration ('how top-heavy is this
    segment') in one window + one aggregate; at scale the per-segment
    window swaps to the two-phase global rank like ``global_ntile``."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    from pyspark.sql import Window

    oc = o.join(c, F.col("c_custkey") == F.col("o_custkey")).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("seg").orderBy("cents", "o_orderkey")
    r = oc.withColumn("rn", F.row_number().over(w).cast("long"))
    a = r.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("rn") * F.col("cents")).cast("long").alias("t"),
    )
    num = (F.lit(2) * F.col("t") - (F.col("n") + 1) * F.col("s")).cast("double")
    den = (F.col("n") * F.col("s")).cast("double")
    return a.select("seg", "n", round_half_up(num / den, 6).alias("gini"))


# --------------------------------------------------------------------------
# Bigram LM quality score (next rung after unigram surprisal)
# --------------------------------------------------------------------------


@register(
    "text_bigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents),
    bg AS (
      SELECT doc_id,
             unnest([ts[i] for i in range(1, len(ts))]) AS w1,
             unnest([ts[i + 1] for i in range(1, len(ts))]) AS w2
      FROM tok WHERE len(ts) >= 2),
    vocab AS (
      SELECT COUNT(DISTINCT t) AS v
      FROM (SELECT unnest(ts) AS t FROM tok)),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cbg FROM bg GROUP BY 1, 2),
    cw AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cctx FROM bg GROUP BY 1),
    scored AS (
      SELECT cb.w1, cb.w2,
             CAST(FLOOR(-ln(CAST(cbg + 1 AS DOUBLE) / CAST(cctx + vocab.v AS DOUBLE))
                        * 1000000000 + 0.5) AS BIGINT) AS s_fp
      FROM cb JOIN cw ON cw.w1 = cb.w1 CROSS JOIN vocab),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(s_fp) AS BIGINT) AS sum_fp
      FROM bg JOIN scored ON scored.w1 = bg.w1 AND scored.w2 = bg.w2
      GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           CAST(FLOOR((CAST(sum_fp AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1000000000.0))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS avg_logprob
    FROM agg
    """,
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean bigram -ln P under the corpus's add-one-smoothed
    bigram LM (`operators/textstats.py::bigram_logprob`): the quality
    rung above `text_unigram_surprisal`.  Each bigram's log-prob is
    quantized to 1e-9 units BEFORE the per-doc mean, so the document
    sums are exact BIGINT under any partitioning -- the float-avg
    order-dependence the unigram query tolerates is engineered out
    here."""
    from ..operators.textstats import bigram_logprob

    return bigram_logprob(_t(spark, sf_dir, "documents"), "doc_id", "text")


# --------------------------------------------------------------------------
# Repetition-ratio quality feature
# --------------------------------------------------------------------------


@register(
    "text_repetition_audit",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                     for i in range(1, len(ts) - 1)]) AS g
      FROM tok WHERE len(ts) >= 3),
    counts AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1, 2),
    per_doc AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
             CAST(MAX(c) AS BIGINT) AS top_count
      FROM counts GROUP BY doc_id)
    SELECT doc_id, n_grams, top_count,
           CAST(FLOOR((CAST(top_count AS DOUBLE) / CAST(n_grams AS DOUBLE)) * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS rep_ratio,
           CAST(CAST(FLOOR((CAST(top_count AS DOUBLE) / CAST(n_grams AS DOUBLE)) * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 >= 0.02 AS BIGINT) AS is_repetitive
    FROM per_doc
    """,
)
def q_repetition_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style repetition feature: share of trigram INSTANCES held by
    each doc's single most repeated trigram, multiset counts (what the
    dedup family's distinct shingles deliberately discard), exact 6dp
    ratio + flag (`operators/textstats.py::repetition_profile`)."""
    from ..operators.textstats import repetition_profile

    return repetition_profile(_t(spark, sf_dir, "documents"), "doc_id", "text")


# --------------------------------------------------------------------------
# Deterministic weighted sampling
# --------------------------------------------------------------------------

_WSAMPLE_K = 500


@register(
    "train_weighted_sample",
    oracle=f"""
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 2, 15)) AS BIGINT)
             // CAST(n_chars AS BIGINT) AS priority
    FROM documents
    WHERE n_chars > 0
    ORDER BY priority, doc_id LIMIT {_WSAMPLE_K}
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic top-k document sample
    (`operators/trainprep.py::weighted_sample`): priority =
    portable_hash(id) div weight, k smallest -- the all-integer
    linearization of Efraimidis-Spirakis that keeps the sampling stage
    reproducible AND hash-verifiable (a training pipeline re-run must
    emit the identical corpus).  Plans as one scan +
    TakeOrderedAndProject; no global sort."""
    from ..operators.trainprep import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"), "doc_id", "n_chars", k=_WSAMPLE_K
    )


# --------------------------------------------------------------------------
# PCA top component: power iteration over the fixed-point Gram
# --------------------------------------------------------------------------

_POWER_ITERS = 6
_POWER_GDIV = 1_000_000
_POWER_VSCALE = 1_000_000


def _power_sql() -> str:
    """Unrolled power-iteration CTE chain (recursive CTEs cannot aggregate
    over the recursive table, so the fixed iteration count unrolls --
    same pattern as the PageRank oracle)."""
    gram_inner = f"""
      SELECT gi.i AS i, gj.j AS j, CAST(SUM(vf[gi.i + 1] * vf[gj.j + 1]) AS BIGINT) AS gram_fp
      FROM (SELECT list_transform(embedding,
              x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_GRAM_SCALE} + 0.5) AS BIGINT)) AS vf
            FROM embeddings) v
      CROSS JOIN (SELECT unnest(generate_series(0, {_GRAM_DIM - 1})) AS i) gi
      CROSS JOIN (SELECT unnest(generate_series(0, {_GRAM_DIM - 1})) AS j) gj
      WHERE gj.j >= gi.i
      GROUP BY gi.i, gj.j"""
    ctes = [
        f"cells AS ({gram_inner})",
        f"""fullm AS (
      SELECT i AS fi, j AS fj, gram_fp // {_POWER_GDIV} AS g FROM cells
      UNION ALL
      SELECT j, i, gram_fp // {_POWER_GDIV} FROM cells WHERE i <> j)""",
        f"v0 AS (SELECT DISTINCT fi AS node, CAST({_POWER_VSCALE} AS BIGINT) AS val FROM fullm)",
    ]
    for t in range(1, _POWER_ITERS + 1):
        ctes.append(
            f"""w{t} AS (
      SELECT f.fi AS node, CAST(SUM(f.g * v.val) AS BIGINT) AS w
      FROM fullm f JOIN v{t - 1} v ON v.node = f.fj GROUP BY f.fi)"""
        )
        ctes.append(
            f"""m{t} AS (
      SELECT GREATEST(CAST(1 AS BIGINT),
                      (MAX(ABS(w)) + {_POWER_VSCALE - 1}) // {_POWER_VSCALE}) AS d
      FROM w{t})"""
        )
        ctes.append(
            f"v{t} AS (SELECT node, w // m{t}.d AS val FROM w{t} CROSS JOIN m{t})"
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT node, val AS eigvec_fp FROM v{_POWER_ITERS}"
    )


@register("pca_power_iteration_topvec", oracle=_power_sql())
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA top component of the embedding table: the hash-verified Gram
    (X^T X) feeds ``power_iteration_topvec`` -- 6 rounds of exact-BIGINT
    matvec + div-renormalization, the repo's FOURTH hash-verified
    iterative fixed point (PageRank, CC, BFS, now PCA).  The corpus-sized
    work is the one-pass Gram build; each iteration then costs d^2-cell
    join + sum, independent of rows -- the 100 TB PCA recipe.  DuckDB
    replays all 6 iterations as unrolled CTEs, bit-for-bit."""
    from ..operators.similarity import power_iteration_topvec

    cells = gram_fixedpoint(
        _t(spark, sf_dir, "embeddings"), "embedding", scale=_GRAM_SCALE, dim=_GRAM_DIM
    )
    return power_iteration_topvec(
        cells,
        iterations=_POWER_ITERS,
        gram_div=_POWER_GDIV,
        vec_scale=_POWER_VSCALE,
    )


# --------------------------------------------------------------------------
# SQL surface: correlated LATERAL derived table with LIMIT
# --------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT s.seg, t.o_orderkey, t.cents
FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) s,
LATERAL (
  SELECT o.o_orderkey, CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = s.seg
  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
"""


@register("sql_lateral_top2_per_segment", oracle=_LATERAL_SQL)
def q_lateral_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with ORDER BY ... LIMIT -- the
    top-N-per-group idiom ANSI SQL writes as a lateral join, executed by
    Spark's lateral-subquery support and replayed verbatim by DuckDB
    (one SQL string, both engines).  Completes the subquery surface
    (IN / scalar-correlated / EXISTS already covered)."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


# --------------------------------------------------------------------------
# Incremental Gram maintenance (linear sketch: merge + retraction)
# --------------------------------------------------------------------------


@register(
    "gram_incremental_maintenance",
    oracle=f"""
    WITH v AS (
      SELECT list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_GRAM_SCALE} + 0.5) AS BIGINT)) AS vf
      FROM embeddings
      WHERE vec_id % 3 = 0 OR vec_id % 7 <> 0),
    g AS (
      SELECT gi.i AS i, gj.j AS j, vf[gi.i + 1] * vf[gj.j + 1] AS p
      FROM v
      CROSS JOIN (SELECT unnest(generate_series(0, {_GRAM_DIM - 1})) AS i) gi
      CROSS JOIN (SELECT unnest(generate_series(0, {_GRAM_DIM - 1})) AS j) gj
      WHERE gj.j >= gi.i)
    SELECT i, j, CAST(SUM(p) AS BIGINT) AS gram_fp FROM g GROUP BY i, j
    """,
)
def q_gram_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X^T X is a LINEAR sketch: state(base) + state(inserts) -
    state(deletes) must equal a recompute over the surviving rows -- the
    incremental-maintenance property that lets a 100 TB embedding store
    keep covariance/PCA state current from CDC deltas (2,080-cell state
    updates, never a corpus re-scan; deletes retract by sign).  Spark
    folds three separately-computed Gram states with signed union + sum;
    the oracle recomputes the final state directly, so the driver
    hash-verifies merge AND retraction."""
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    inserts = emb.filter(F.col("vec_id") % 3 == 0)
    deletes = base.filter(F.col("vec_id") % 7 == 0)
    signed = (
        gram_fixedpoint(base, "embedding", _GRAM_SCALE, dim=_GRAM_DIM)
        .withColumn("s", F.lit(1))
        .unionByName(
            gram_fixedpoint(inserts, "embedding", _GRAM_SCALE, dim=_GRAM_DIM)
            .withColumn("s", F.lit(1))
        )
        .unionByName(
            gram_fixedpoint(deletes, "embedding", _GRAM_SCALE, dim=_GRAM_DIM)
            .withColumn("s", F.lit(-1))
        )
    )
    return (
        signed.groupBy("i", "j")
        .agg(F.sum(F.col("gram_fp") * F.col("s")).alias("gram_fp"))
    )


# --------------------------------------------------------------------------
# Time-respecting reachability (earliest-arrival contamination trace)
# --------------------------------------------------------------------------

_TR_ROUNDS = 3
_TR_SEED_MAX = 5
_TR_T0 = "1994-01-01"


def _temporal_sql() -> str:
    """Unrolled earliest-arrival rounds (min-aggregation per round ->
    recursive CTEs can't express it; same unroll pattern as PageRank/PCA)."""
    far = "DATE '9999-12-31'"
    ctes = [
        """eo AS (
      SELECT l_suppkey, l_shipdate, o_custkey, o_orderdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate >= o_orderdate)""",
        """edges AS (
      SELECT 2 * l_suppkey + 1 AS src, 2 * o_custkey AS dst,
             l_shipdate AS avail, l_shipdate AS arr
      FROM eo
      UNION ALL
      SELECT 2 * o_custkey, 2 * l_suppkey + 1, o_orderdate, l_shipdate
      FROM eo)""",
        f"""s0 AS (
      SELECT 2 * s_suppkey + 1 AS node, DATE '{_TR_T0}' AS d
      FROM supplier WHERE s_suppkey <= {_TR_SEED_MAX})""",
    ]
    for t in range(1, _TR_ROUNDS + 1):
        ctes.append(
            f"""c{t} AS (
      SELECT e.dst AS node, MIN(e.arr) AS nd
      FROM edges e JOIN s{t - 1} v ON v.node = e.src AND e.avail >= v.d
      GROUP BY e.dst)"""
        )
        ctes.append(
            f"""s{t} AS (
      SELECT COALESCE(a.node, b.node) AS node,
             LEAST(COALESCE(a.d, {far}), COALESCE(b.nd, {far})) AS d
      FROM s{t - 1} a FULL JOIN c{t} b ON a.node = b.node)"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT date_trunc('month', d) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS sum_node_ids
    FROM s{_TR_ROUNDS} GROUP BY 1"""
    )


@register("temporal_reach_contamination", oracle=_temporal_sql())
def q_temporal_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RESPECTING reachability: the earliest date a contamination
    seeded at suppliers 1-5 on 1994-01-01 can reach each party, hopping
    supplier->customer on shipments that left on/after the carrier's own
    infection date and customer->supplier on orders PLACED after
    infection (arriving at ship date) -- the logistics recall/blast-
    radius question static BFS answers wrongly (a pre-infection shipment
    cannot carry it).  3 bounded min-relaxation rounds over ~1.2M timed
    edges; dates are exact, so the unrolled-CTE oracle replays every
    round (`operators/graph.py::temporal_reachability`).  Reported per
    infection month (count + id-sum invariant)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    eo = li.join(o, li["l_orderkey"] == o["o_orderkey"]).filter(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    e1 = eo.select(
        (F.col("l_suppkey") * 2 + 1).alias("src"),
        (F.col("o_custkey") * 2).alias("dst"),
        F.col("l_shipdate").alias("avail"),
        F.col("l_shipdate").alias("arr"),
    )
    e2 = eo.select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
        F.col("o_orderdate").alias("avail"),
        F.col("l_shipdate").alias("arr"),
    )
    seeds = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= _TR_SEED_MAX)
        .select(
            (F.col("s_suppkey") * 2 + 1).alias("node"),
            F.lit(_TR_T0).cast("date").alias("d"),
        )
    )
    from ..operators.graph import temporal_reachability

    state = temporal_reachability(e1.unionByName(e2), seeds, rounds=_TR_ROUNDS)
    return state.groupBy(F.trunc("d", "month").alias("month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("node").cast("long").alias("sum_node_ids"),
    )


# --------------------------------------------------------------------------
# Multi-pass sorted neighborhood (name + reversed-name keys)
# --------------------------------------------------------------------------


@register(
    "snb_multipass_suppliers",
    oracle=f"""
    WITH s AS (
      SELECT s_suppkey AS id, lower(trim({_DIRTY_SQL})) AS k1 FROM supplier),
    s2 AS (SELECT id, k1, reverse(k1) AS k2 FROM s),
    r1 AS (SELECT id, ROW_NUMBER() OVER (ORDER BY k1, id) AS rn FROM s2),
    r2 AS (SELECT id, ROW_NUMBER() OVER (ORDER BY k2, id) AS rn FROM s2),
    p1 AS (
      SELECT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b
      FROM r1 a JOIN r1 b ON b.rn BETWEEN a.rn + 1 AND a.rn + {_SNB_WINDOW}),
    p2 AS (
      SELECT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b
      FROM r2 a JOIN r2 b ON b.rn BETWEEN a.rn + 1 AND a.rn + {_SNB_WINDOW}),
    cand AS (SELECT DISTINCT id_a, id_b FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)),
    v AS (
      SELECT c.id_a, c.id_b, CAST(levenshtein(sa.k1, sb.k1) AS BIGINT) AS dist
      FROM cand c JOIN s2 sa ON sa.id = c.id_a JOIN s2 sb ON sb.id = c.id_b)
    SELECT id_a, id_b, dist FROM v WHERE dist <= {_SNB_MAXDIST}
    """,
)
def q_snb_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Hernandez-Stolfo scheme: two complementary sort keys
    (dirty name + its reversal -- a first-character typo teleports a
    record in one ordering but stays adjacent in the other), windows
    unioned, ONE levenshtein verify on the shared key.  Single-pass SNB
    (``snb_supplier_near_names``) is the primitive; this is how ER
    actually deploys it
    (`operators/fuzzyjoin.py::sorted_neighborhood_multipass`)."""
    from ..operators.fuzzyjoin import sorted_neighborhood_multipass

    sup = _t(spark, sf_dir, "supplier")
    dirty = sup.select(
        F.col("s_suppkey").alias("sid"), F.expr(_DIRTY_SQL).alias("dname")
    )
    return sorted_neighborhood_multipass(
        dirty,
        "sid",
        [F.col("dname"), F.reverse(F.col("dname"))],
        window=_SNB_WINDOW,
        max_dist=_SNB_MAXDIST,
    )


# --------------------------------------------------------------------------
# Per-source weighted sampling quota (training-mix shape)
# --------------------------------------------------------------------------

_WSPG_K = 100


@register(
    "train_weighted_sample_per_source",
    oracle=f"""
    WITH pri AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 2, 15)) AS BIGINT)
               // CAST(n_chars AS BIGINT) AS priority
      FROM documents WHERE n_chars > 0),
    r AS (
      SELECT source, doc_id, n_chars, priority,
             CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY priority, doc_id)
                  AS BIGINT) AS rk
      FROM pri)
    SELECT source, doc_id, n_chars, priority, rk FROM r WHERE rk <= {_WSPG_K}
    """,
)
def q_weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix sampling: a fixed k-per-SOURCE quota, weight-biased
    within each source by the same integer priority as
    ``train_weighted_sample`` -- per-source quotas are how data-mixture
    recipes are actually specified (a global top-k lets one dominant
    source crowd the rest out).  One ranked window partitioned by
    source; reproducible and hash-verified
    (`operators/trainprep.py::weighted_sample_per_group`)."""
    from ..operators.trainprep import weighted_sample_per_group

    return weighted_sample_per_group(
        _t(spark, sf_dir, "documents"), "doc_id", "n_chars", "source", _WSPG_K
    )


# --------------------------------------------------------------------------
# Interpolated percentiles (percentile_cont) with explicit arithmetic
# --------------------------------------------------------------------------

_PCONT_PROBS = [0.25, 0.5, 0.75, 0.9]


def _pcont_select(probs: list[float]) -> str:
    """Per-(seg) interpolated percentile columns over ranked cents.
    idx = p*(n-1) (0-based); edge = lo + frac*(hi-lo), 4dp half-up.
    Written ONCE as SQL and mirrored expression-for-expression in the
    Spark plan -- engine-native percentile_cont/quantile_cont interpolate
    with algebraically-equal-but-IEEE-different formulas, so the repo
    spells the arithmetic out instead of trusting the built-ins to agree."""
    cols = []
    for p in probs:
        tag = str(p).replace(".", "_")
        idx = f"({p!r} * (n - 1))"
        lo = f"CAST(FLOOR({idx}) AS BIGINT)"
        frac = f"({idx} - FLOOR({idx}))"
        val = (
            f"MAX(CASE WHEN rn = {lo} + 1 THEN cents END) + "
            f"MAX({frac}) * (MAX(CASE WHEN rn = LEAST({lo} + 2, n) THEN cents END) - "
            f"MAX(CASE WHEN rn = {lo} + 1 THEN cents END))"
        )
        cols.append(
            f"CAST(FLOOR(({val}) * 10000 + 0.5) AS BIGINT) / 10000.0 AS p{tag}"
        )
    return ",\n           ".join(cols)


@register(
    "percentile_cont_by_segment",
    oracle=f"""
    WITH oc AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o.o_orderkey
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    r AS (
      SELECT seg, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, o_orderkey)
                  AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS n
      FROM oc)
    SELECT seg, MAX(n) AS n,
           {_pcont_select(_PCONT_PROBS)}
    FROM r GROUP BY seg
    """,
)
def q_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (percentile_cont) quartiles + p90 of order value per
    segment, with the interpolation arithmetic SPELLED OUT -- idx =
    p*(n-1), edge = lo + frac*(hi-lo) over exact integer cents -- because
    engine-native percentile_cont and quantile_cont use algebraically
    equal but IEEE-DIFFERENT formulas (lo*(1-g)+hi*g vs lo+g*(hi-lo))
    that split on the last ulp.  Completes the quantile family next to
    exact percentile_disc (`quantile_bins_totalprice`) and the
    bounded-memory distributed edges; the per-segment window swaps to
    the two-phase global rank at scale, as documented on gini."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    oc = o.join(c, F.col("c_custkey") == F.col("o_custkey")).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        "o_orderkey",
    )
    wr = Window.partitionBy("seg").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("seg")
    r = oc.select(
        "seg",
        "cents",
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    # Per-ROW pick columns (n is on every row, so lo/frac are per-row
    # expressions Spark's aggregate checker accepts; the SQL oracle puts
    # the same expressions inside MAX(CASE ...) directly).
    from ..operators.textstats import round_half_up

    pick_cols = []
    for p in _PCONT_PROBS:
        tag = str(p).replace(".", "_")
        idx = F.lit(p) * (F.col("n") - 1)
        lo = F.floor(idx).cast("long")
        pick_cols.extend(
            [
                F.when(F.col("rn") == lo + 1, F.col("cents")).alias(f"__lo_{tag}"),
                F.when(
                    F.col("rn") == F.least(lo + 2, F.col("n")), F.col("cents")
                ).alias(f"__hi_{tag}"),
                (idx - F.floor(idx)).alias(f"__fr_{tag}"),
            ]
        )
    picked = r.select("seg", "n", *pick_cols)
    aggs = [F.max("n").alias("n")]
    for p in _PCONT_PROBS:
        tag = str(p).replace(".", "_")
        lo_val = F.max(f"__lo_{tag}")
        hi_val = F.max(f"__hi_{tag}")
        frac = F.max(f"__fr_{tag}")  # constant within the group
        aggs.append(
            round_half_up(lo_val + frac * (hi_val - lo_val), 4).alias(f"p{tag}")
        )
    return picked.groupBy("seg").agg(*aggs)
