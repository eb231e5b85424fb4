"""Round-9 widening: exact fixed-point k-means, weighted shortest
paths, count-min sketch frequency estimation, tokenizer-vocabulary OOV
audit, compaction bin planning, Fellegi-Sunter linkage scoring.

Each query follows the portable-oracle recipe (BIGINT arithmetic or the
floor half-up formula at every engine boundary) so the driver
hash-verifies values, not just shapes.  Reference parity: none of these
exist in the reference -- they extend the clustering / graph / sketch /
training-data / engine-ops families the engine already carries
(SURVEY §2.11 'beyond-reference training-data operators').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import read_events, register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# --------------------------------------------------------------------------
# Exact fixed-point k-means over the embeddings table
# --------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3
_KM_DIM = 64
_KM_SCALE = 1000


def _kmeans_oracle(k: int, iters: int, dim: int, scale: int) -> str:
    """Unrolled-CTE DuckDB replay of the exact Lloyd loop (the
    PageRank/PCA pattern: matvec-style iterations UNROLL as numbered
    CTEs; recursive CTEs cannot aggregate over the recursive table)."""
    parts = [
        f"""
        WITH u AS (
          SELECT vec_id AS id, gs.i AS i,
                 CAST(floor(CAST(embedding[gs.i + 1] AS DOUBLE) * {scale} + 0.5)
                      AS BIGINT) AS x
          FROM embeddings, generate_series(0, {dim - 1}) AS gs(i)),
        sel AS (
          SELECT vec_id AS id,
                 CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster
          FROM embeddings ORDER BY vec_id LIMIT {k}),
        c0 AS (SELECT s.cluster, u.i, u.x AS c FROM sel s JOIN u ON u.id = s.id)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
        d{t} AS (
          SELECT u.id, c.cluster,
                 CAST(SUM((u.x - c.c) * (u.x - c.c)) AS BIGINT) AS dist
          FROM u JOIN c{t - 1} c ON c.i = u.i GROUP BY u.id, c.cluster),
        a{t} AS (
          SELECT id, cluster, dist FROM (
            SELECT id, cluster, dist,
                   ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cluster) AS rn
            FROM d{t}) WHERE rn = 1),
        n{t} AS (
          SELECT a.cluster, u.i,
                 CAST(SUM(u.x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS c
          FROM a{t} a JOIN u ON u.id = a.id GROUP BY a.cluster, u.i),
        c{t} AS (
          SELECT p.cluster, p.i, COALESCE(n.c, p.c) AS c
          FROM c{t - 1} p LEFT JOIN n{t} n ON n.cluster = p.cluster AND n.i = p.i)"""
        )
    parts.append(
        f""",
        stats AS (
          SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_pts,
                 CAST(SUM(dist) AS BIGINT) AS inertia_fp
          FROM a{iters} GROUP BY cluster)
        SELECT c{iters}.cluster, c{iters}.i, c{iters}.c AS c_fp,
               COALESCE(s.n_pts, CAST(0 AS BIGINT)) AS n_pts,
               COALESCE(s.inertia_fp, CAST(0 AS BIGINT)) AS inertia_fp
        FROM c{iters} LEFT JOIN stats s ON s.cluster = c{iters}.cluster"""
    )
    return "".join(parts)


@register(
    "kmeans_embedding_clusters",
    oracle=_kmeans_oracle(_KM_K, _KM_ITERS, _KM_DIM, _KM_SCALE),
)
def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Lloyd k-means over the embedding corpus: 3 fixed-point
    rounds, deterministic smallest-id init, argmin ties to the lowest
    cluster, sum-div-count centroid updates -- the IVF coarse-quantizer
    / dataset-cartography building block, hash-verified cell by cell
    against an unrolled-CTE DuckDB replay
    (`operators/clustering.py::kmeans_lloyd_fixedpoint`)."""
    from ..operators.clustering import kmeans_lloyd_fixedpoint

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_lloyd_fixedpoint(
        emb, "vec_id", "embedding", k=_KM_K, iterations=_KM_ITERS,
        dim=_KM_DIM, scale=_KM_SCALE,
    )


# --------------------------------------------------------------------------
# Bounded weighted shortest paths (Bellman-Ford) over part<->supplier
# --------------------------------------------------------------------------

_SP_ROUNDS = 4
_SP_SEEDS = 10
_SP_TOPN = 100


def _sssp_oracle(rounds: int) -> str:
    parts = [
        f"""
        WITH seeds AS (
          SELECT 2 * s_suppkey + 1 AS node FROM supplier
          ORDER BY s_acctbal DESC, s_suppkey LIMIT {_SP_SEEDS}),
        ew AS (
          SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
                 CAST(MIN(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS w
          FROM lineitem GROUP BY l_partkey, l_suppkey),
        edges AS (SELECT src, dst, w FROM ew
                  UNION ALL SELECT dst, src, w FROM ew),
        d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
        d{t} AS (
          SELECT node, CAST(MIN(dv) AS BIGINT) AS dist FROM (
            SELECT node, dist AS dv FROM d{t - 1}
            UNION ALL
            SELECT e.dst AS node, d.dist + e.w AS dv
            FROM d{t - 1} d JOIN edges e ON e.src = d.node)
          GROUP BY node)"""
        )
    parts.append(
        f"""
        SELECT node, dist FROM d{rounds} ORDER BY dist, node LIMIT {_SP_TOPN}"""
    )
    return "".join(parts)


@register("cheapest_reach_part_supplier", oracle=_sssp_oracle(_SP_ROUNDS))
def q_cheapest_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted blast-radius: exact min-COST distance (integer cents,
    cheapest observed line price per part-supplier link) from the 10
    highest-balance suppliers, bounded at 4 edges -- Bellman-Ford as
    iterative min-plus relaxation, the weighted sibling of
    ``bfs_hops_part_supplier``
    (`operators/graph.py::shortest_paths_bounded`)."""
    from ..operators.graph import shortest_paths_bounded

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    ew = (
        li.groupBy(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            ).alias("w")
        )
    )
    edges = ew.unionByName(
        ew.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    seeds = (
        sup.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(_SP_SEEDS)
        .select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    out = shortest_paths_bounded(edges, seeds, rounds=_SP_ROUNDS)
    return out.orderBy("dist", "node").limit(_SP_TOPN)


# --------------------------------------------------------------------------
# Count-min sketch: estimated vs exact token frequencies
# --------------------------------------------------------------------------

_CMS_TOPN = 20


def _cms_oracle(depth: int | None = None, width: int | None = None) -> str:
    from ..operators.sketches import CMS_DEPTH, CMS_P, CMS_WIDTH, cms_bucket_sql, cms_params

    depth = CMS_DEPTH if depth is None else depth
    width = CMS_WIDTH if width is None else width
    params = cms_params(depth)
    h0 = f"(CAST('0x' || substring(md5(item), 2, 15) AS BIGINT) % {CMS_P})"
    cell_rows = " UNION ALL ".join(
        f"SELECT item, {r} AS r, {cms_bucket_sql('h0', a, b, width)} AS bucket FROM h"
        for r, (a, b) in enumerate(params)
    )
    return f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS item
      FROM documents),
    h AS (SELECT item, {h0} AS h0 FROM tok),
    cells AS ({cell_rows}),
    regs AS (SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM cells GROUP BY r, bucket),
    ex AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_exact
           FROM tok GROUP BY item),
    top AS (SELECT item, n_exact FROM ex ORDER BY n_exact DESC, item LIMIT {_CMS_TOPN}),
    ph AS (SELECT item, n_exact, {h0} AS h0 FROM top),
    pc AS ({" UNION ALL ".join(
        f"SELECT item, n_exact, {r} AS r, "
        f"{cms_bucket_sql('h0', a, b, width)} AS bucket FROM ph"
        for r, (a, b) in enumerate(params))})
    SELECT p.item, p.n_exact,
           CAST(MIN(COALESCE(g.cnt, 0)) AS BIGINT) AS n_cms,
           CAST(MIN(COALESCE(g.cnt, 0)) - p.n_exact AS BIGINT) AS overcount
    FROM pc p LEFT JOIN regs g ON g.r = p.r AND g.bucket = p.bucket
    GROUP BY p.item, p.n_exact
    """


@register("cms_token_frequencies", oracle=_cms_oracle())
def q_cms_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over every token occurrence in the corpus
    (depth 4 x width 512 mergeable registers), point-queried for the 20
    most frequent tokens against their exact counts -- the register
    build, the universal-hash rows and the min-estimate all replayed
    bit-for-bit by the SQL oracle; ``overcount`` exposes the collision
    upper-bound behavior (always >= 0)
    (`operators/sketches.py::cms_registers/cms_estimate`)."""
    from ..operators.sketches import cms_estimate, cms_registers

    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("item")
        )
    )
    from ..operators.dedup import _cache_aged

    toks = _cache_aged("cms_tokens", toks)
    regs = cms_registers(toks, "item")
    top = (
        toks.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("item"))
        .limit(_CMS_TOPN)
    )
    est = cms_estimate(regs, top.select("item"), "item")
    return top.join(F.broadcast(est), "item").select(
        "item",
        "n_exact",
        "n_cms",
        (F.col("n_cms") - F.col("n_exact")).cast("long").alias("overcount"),
    )


_CMS_WIDE_DEPTH = 5
_CMS_WIDE_WIDTH = 2**14


@register(
    "cms_token_frequencies_wide",
    oracle=_cms_oracle(_CMS_WIDE_DEPTH, _CMS_WIDE_WIDTH),
)
def q_cms_token_frequencies_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME count-min pipeline at a production geometry (depth 5 x
    width 2^14 -- overcount bound ~e*N/16384 with prob 1 - e^-5), so the
    driver hash-verifies the realistic register layout, not just the
    demo-sized one (r10 verdict item 7; the geometry matrix pytest
    covers 2^16 as well).  Registers stay sparse (only touched cells
    materialize), so the wide sketch shuffles FEWER colliding cells than
    the 512-wide demo despite 32x the address space."""
    from ..operators.dedup import _cache_aged
    from ..operators.sketches import cms_estimate, cms_registers

    toks = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("item")
        )
    )
    toks = _cache_aged("cms_tokens", toks)
    regs = cms_registers(toks, "item", depth=_CMS_WIDE_DEPTH, width=_CMS_WIDE_WIDTH)
    top = (
        toks.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("item"))
        .limit(_CMS_TOPN)
    )
    est = cms_estimate(
        regs, top.select("item"), "item", depth=_CMS_WIDE_DEPTH, width=_CMS_WIDE_WIDTH
    )
    return top.join(F.broadcast(est), "item").select(
        "item",
        "n_exact",
        "n_cms",
        (F.col("n_cms") - F.col("n_exact")).cast("long").alias("overcount"),
    )


# --------------------------------------------------------------------------
# Tokenizer-vocabulary OOV audit
# --------------------------------------------------------------------------

_VOCAB_V = 500


@register(
    "vocab_oov_audit",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents),
    voc AS (
      SELECT tok FROM (
        SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok
        ORDER BY n DESC, tok LIMIT {_VOCAB_V})),
    per AS (
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      FROM tok t LEFT JOIN voc v ON v.tok = t.tok
      GROUP BY t.doc_id)
    SELECT doc_id, n_tokens, n_oov,
           CAST(FLOOR(n_oov / CAST(n_tokens AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
             / CAST(1000000.0 AS DOUBLE) AS oov_rate
    FROM per
    """,
)
def q_vocab_oov_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: top-500 corpus vocabulary (deterministic
    count-desc/token-asc boundary), per-document OOV token share at the
    shared 6dp half-up rounding -- the tokenizer go/no-go audit of a
    training-data pipeline
    (`operators/textstats.py::vocab_oov_stats`)."""
    from ..operators.textstats import vocab_oov_stats

    docs = _t(spark, sf_dir, "documents")
    return vocab_oov_stats(docs, "doc_id", "text", vocab_size=_VOCAB_V)


# --------------------------------------------------------------------------
# Compaction bin planner over the daily order-file inventory
# --------------------------------------------------------------------------

_CPT_ROW_BYTES = 128
_CPT_TARGET = 8192


@register(
    "compaction_plan_daily_files",
    oracle=f"""
    WITH f AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             o_orderdate AS d,
             CAST(COUNT(*) * {_CPT_ROW_BYTES} AS BIGINT) AS bytes
      FROM orders GROUP BY mon, d),
    rs AS (
      SELECT mon, d, bytes,
             CAST(COALESCE(SUM(bytes) OVER (
               PARTITION BY mon ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS bef
      FROM f),
    b AS (SELECT mon, d, bytes, bef // {_CPT_TARGET} AS bin FROM rs)
    SELECT mon, bin, CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           MIN(d) AS first_key, MAX(d) AS last_key
    FROM b GROUP BY mon, bin
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE planner: the per-day order 'files' (size = rows x 128B
    estimate) packed into >= 8 KiB bins per month, key ranges contiguous
    -- running-sum div target, deterministic and idempotent, the
    planning half of the engine's small-file compaction story
    (`operators/layout.py::compaction_bins`)."""
    from ..operators.layout import compaction_bins

    orders = _t(spark, sf_dir, "orders")
    inv = orders.groupBy(
        F.trunc(F.col("o_orderdate"), "mon").alias("mon"),
        F.col("o_orderdate").alias("d"),
    ).agg((F.count(F.lit(1)) * _CPT_ROW_BYTES).cast("long").alias("bytes"))
    return compaction_bins(inv, "mon", "d", "bytes", _CPT_TARGET).select(
        "mon",
        "bin",
        "n_files",
        "bin_bytes",
        F.col("first_key"),
        F.col("last_key"),
    )


# --------------------------------------------------------------------------
# Fellegi-Sunter probabilistic linkage over SNB candidates
# --------------------------------------------------------------------------

#: (m, u) per field: P(agree | match) / P(agree | non-match) for the
#: dirty-name edit distance, the nation key and the phone prefix.
_FS_MU = [(0.95, 0.05), (0.98, 0.04), (0.90, 0.10)]
_FS_UPPER = 6_000_000  # >= 6 bits of log-likelihood -> link
_FS_LOWER = 0          # <= 0 bits -> nonlink


def _fs_block_sql() -> str:
    """The SNB blocking + attribute CTE block shared by the three FS
    oracles (linkage, EM estimation, survivorship) -- ONE source, like
    the Spark side's `_fs_scored`, so the three can never silently
    un-pin from each other (r10 review finding)."""
    from .coverage4 import _DIRTY_SQL, _SNB_WINDOW

    return f"""s AS (
      SELECT s_suppkey AS id, lower(trim({_DIRTY_SQL})) AS key,
             s_nationkey AS nk,
             CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS bal_band
      FROM supplier),
    r AS (SELECT id, key, ROW_NUMBER() OVER (ORDER BY key, id) AS rn FROM s),
    p AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
      FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + {_SNB_WINDOW})"""


def _fs_oracle() -> str:
    from ..operators.fuzzyjoin import fs_weights
    from .coverage4 import _DIRTY_SQL, _SNB_WINDOW

    (wa0, wd0), (wa1, wd1), (wa2, wd2) = fs_weights(_FS_MU)
    return f"""
    WITH {_fs_block_sql()},
    f AS (
      SELECT p.id_a, p.id_b, p.dist,
             CAST(CASE WHEN p.dist <= 1 THEN 1 ELSE 0 END AS BIGINT) AS agree_name,
             CAST(CASE WHEN sa.nk = sb.nk THEN 1 ELSE 0 END AS BIGINT) AS agree_nation,
             CAST(CASE WHEN sa.bal_band = sb.bal_band THEN 1 ELSE 0 END AS BIGINT) AS agree_bal
      FROM p JOIN s sa ON sa.id = p.id_a JOIN s sb ON sb.id = p.id_b),
    sc AS (
      SELECT *, CAST(
          CASE WHEN agree_name = 1 THEN {wa0} ELSE {wd0} END
        + CASE WHEN agree_nation = 1 THEN {wa1} ELSE {wd1} END
        + CASE WHEN agree_bal = 1 THEN {wa2} ELSE {wd2} END AS BIGINT) AS score
      FROM f)
    SELECT id_a, id_b, dist, agree_name, agree_nation, agree_bal, score,
           CASE WHEN score >= {_FS_UPPER} THEN 'link'
                WHEN score <= {_FS_LOWER} THEN 'nonlink'
                ELSE 'possible' END AS decision
    FROM sc
    """


def _fs_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared FS pipeline frame: SNB blocking over dirty supplier
    names, attribute enrichment (nation, balance band), Fellegi-Sunter
    scoring.  One builder feeds the linkage, EM-estimation and
    golden-record queries so the three stay pinned to the same
    candidate set."""
    from ..operators.fuzzyjoin import (
        fellegi_sunter_scores,
        fs_weights,
        sorted_neighborhood_pairs,
    )
    from .coverage4 import _DIRTY_SQL, _SNB_WINDOW

    sup = _t(spark, sf_dir, "supplier")
    dirty = sup.select(
        F.col("s_suppkey").alias("sid"), F.expr(_DIRTY_SQL).alias("dname")
    )
    pairs = sorted_neighborhood_pairs(
        dirty, "sid", "dname", window=_SNB_WINDOW, max_dist=10**9
    )
    attrs = sup.select(
        F.col("s_suppkey").alias("__k"),
        F.col("s_nationkey").alias("__nk"),
        F.expr("cast(floor(s_acctbal * 100 + 0.5) as bigint) div 100000").alias("__bb"),
    )
    enriched = (
        pairs.join(
            F.broadcast(attrs).select(
                F.col("__k").alias("id_a"),
                F.col("__nk").alias("__nk_a"),
                F.col("__bb").alias("__bb_a"),
            ),
            "id_a",
        )
        .join(
            F.broadcast(attrs).select(
                F.col("__k").alias("id_b"),
                F.col("__nk").alias("__nk_b"),
                F.col("__bb").alias("__bb_b"),
            ),
            "id_b",
        )
    )
    return fellegi_sunter_scores(
        enriched,
        [
            ("agree_name", F.col("dist") <= 1),
            ("agree_nation", F.col("__nk_a") == F.col("__nk_b")),
            ("agree_bal", F.col("__bb_a") == F.col("__bb_b")),
        ],
        fs_weights(_FS_MU),
        upper=_FS_UPPER,
        lower=_FS_LOWER,
    )


@register("fs_linkage_suppliers", oracle=_fs_oracle())
def q_fs_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record linkage: SNB blocking proposes in-window
    supplier pairs (dirty names, no distance cap), then the classical
    log-likelihood decision model scores three fields (name edit
    distance <= 1, nation, account-balance band) with fixed-point micro-log2
    weights and classifies link / possible / nonlink -- the decision
    layer production ER runs on top of any blocking scheme
    (`operators/fuzzyjoin.py::fellegi_sunter_scores`)."""
    return _fs_scored(spark, sf_dir).select(
        "id_a", "id_b", "dist", "agree_name", "agree_nation", "agree_bal",
        "score", "decision",
    )


# --------------------------------------------------------------------------
# Fellegi-Sunter parameter estimation: one exact fixed-point EM round
# --------------------------------------------------------------------------

_FS_P0 = 0.02


def _fs_em_oracle() -> str:
    import math

    from ..operators.fuzzyjoin import FS_EM_SCALE, fs_em_likelihood_sql
    from .coverage4 import _DIRTY_SQL, _SNB_WINDOW

    S = FS_EM_SCALE
    cols = ["agree_name", "agree_nation", "agree_bal"]
    m0 = [int(math.floor(m * S + 0.5)) for m, _ in _FS_MU]
    u0 = [int(math.floor(u * S + 0.5)) for _, u in _FS_MU]
    p0 = int(math.floor(_FS_P0 * S + 0.5))
    a, b = fs_em_likelihood_sql(cols, m0, u0, p0, S, "//")

    def rhu(num: str, den: str) -> str:
        return (
            f"CASE WHEN {den} = 0 THEN NULL "
            f"ELSE (2 * {num} + {den}) // (2 * {den}) END"
        )

    field_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS field, CAST({m0[j]} AS BIGINT) AS m_prior_fp, "
        f"CAST({u0[j]} AS BIGINT) AS u_prior_fp, "
        f"CAST({rhu(f'wa{j} * {S}', 'w_tot')} AS BIGINT) AS m_post_fp, "
        f"CAST({rhu(f'va{j} * {S}', 'v_tot')} AS BIGINT) AS u_post_fp, "
        f"CAST({rhu('w_tot', 'n_tot')} AS BIGINT) AS p_post_fp FROM ag"
        for j, c in enumerate(cols)
    )
    per_field_sums = ", ".join(
        f"CAST(SUM(n * w * {c}) AS BIGINT) AS wa{j}, "
        f"CAST(SUM(n * ({S} - w) * {c}) AS BIGINT) AS va{j}"
        for j, c in enumerate(cols)
    )
    return f"""
    WITH {_fs_block_sql()},
    f AS (
      SELECT CAST(CASE WHEN p.dist <= 1 THEN 1 ELSE 0 END AS BIGINT) AS agree_name,
             CAST(CASE WHEN sa.nk = sb.nk THEN 1 ELSE 0 END AS BIGINT) AS agree_nation,
             CAST(CASE WHEN sa.bal_band = sb.bal_band THEN 1 ELSE 0 END AS BIGINT) AS agree_bal
      FROM p JOIN s sa ON sa.id = p.id_a JOIN s sb ON sb.id = p.id_b),
    pt AS (SELECT agree_name, agree_nation, agree_bal,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM f GROUP BY agree_name, agree_nation, agree_bal),
    ew AS (SELECT *, CAST((2 * ({a}) * {S} + (({a}) + ({b}))) // (2 * (({a}) + ({b}))) AS BIGINT) AS w
           FROM pt),
    ag AS (SELECT CAST(SUM(n * w) AS BIGINT) AS w_tot,
                  CAST(SUM(n * ({S} - w)) AS BIGINT) AS v_tot,
                  CAST(SUM(n) AS BIGINT) AS n_tot,
                  {per_field_sums}
           FROM ew)
    {field_rows}
    """


@register("fs_em_suppliers", oracle=_fs_em_oracle())
def q_fs_em_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter parameter ESTIMATION over the same SNB candidate
    pairs the linkage query scores: one EM round in exact fixed-point
    integers (E-step posterior per agreement PATTERN -- <= 2^3 rows
    after one map-side-combinable groupBy -- then weighted-agreement
    M-step), yielding the (m, u) the decision layer would actually
    deploy instead of the hand-supplied priors.  The whole round is
    replayed bit-for-bit by the DuckDB oracle: `fs_em_likelihood_sql`
    builds the E-step arithmetic for BOTH engines
    (`operators/fuzzyjoin.py::fs_estimate_mu`)."""
    from ..operators.fuzzyjoin import fs_estimate_mu

    return fs_estimate_mu(
        _fs_scored(spark, sf_dir),
        ["agree_name", "agree_nation", "agree_bal"],
        _FS_MU,
        _FS_P0,
    )


# --------------------------------------------------------------------------
# ER survivorship: the golden record per linked supplier cluster
# --------------------------------------------------------------------------


#: Clustering operating point for survivorship: 4 bits of
#: log-likelihood.  Looser than the linkage query's 6-bit 'link'
#: band on purpose -- survivorship wants the full merge candidate
#: set (3 clusters at sf0.01, 53 at sf0.1), while the 6-bit band
#: is the high-precision auto-link cut.
_ER_LINK_MIN = 4_000_000


def _fs_golden_oracle() -> str:
    from ..operators.fuzzyjoin import fs_weights
    from .coverage4 import _DIRTY_SQL, _SNB_WINDOW

    (wa0, wd0), (wa1, wd1), (wa2, wd2) = fs_weights(_FS_MU)

    def mode(col: str) -> str:
        # WHERE {col} IS NOT NULL pins the oracle to golden_records'
        # contract (NULLs never vote; r10 review finding -- supplier
        # columns are non-null, but the template must not drift).
        return (
            f"(SELECT canonical, {col} AS {col}_gold FROM ("
            f"SELECT canonical, {col}, "
            f"ROW_NUMBER() OVER (PARTITION BY canonical "
            f"ORDER BY COUNT(*) DESC, {col}) AS rn "
            f"FROM mem WHERE {col} IS NOT NULL "
            f"GROUP BY canonical, {col}) WHERE rn = 1)"
        )

    return f"""
    WITH RECURSIVE {_fs_block_sql()},
    sc AS (
      SELECT p.id_a, p.id_b,
             CASE WHEN p.dist <= 1 THEN {wa0} ELSE {wd0} END
           + CASE WHEN sa.nk = sb.nk THEN {wa1} ELSE {wd1} END
           + CASE WHEN sa.bal_band = sb.bal_band THEN {wa2} ELSE {wd2} END
             AS score
      FROM p JOIN s sa ON sa.id = p.id_a JOIN s sb ON sb.id = p.id_b),
    lk AS (SELECT id_a, id_b FROM sc WHERE score >= {_ER_LINK_MIN}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM lk
              UNION SELECT id_b, id_a FROM lk),
    reach(doc, rr) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.doc, edges.dst FROM reach JOIN edges ON reach.rr = edges.src),
    cc AS (SELECT doc, MIN(rr) AS canonical FROM reach GROUP BY doc),
    mem AS (SELECT COALESCE(cc.canonical, s.id) AS canonical, s.id AS doc,
                   s.key AS dname, s.nk, s.bal_band
            FROM s LEFT JOIN cc ON cc.doc = s.id),
    nm AS (SELECT canonical, CAST(COUNT(*) AS BIGINT) AS n_members
           FROM mem GROUP BY canonical)
    SELECT nm.canonical, nm.n_members, g1.dname_gold,
           CAST(g2.nk_gold AS BIGINT) AS nk_gold,
           CAST(g3.bal_band_gold AS BIGINT) AS bal_band_gold
    FROM nm
    LEFT JOIN {mode("dname")} g1 ON g1.canonical = nm.canonical
    LEFT JOIN {mode("nk")} g2 ON g2.canonical = nm.canonical
    LEFT JOIN {mode("bal_band")} g3 ON g3.canonical = nm.canonical
    """


@register("er_golden_suppliers", oracle=_fs_golden_oracle())
def q_er_golden_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ER pipeline's final stage, SURVIVORSHIP: Fellegi-Sunter
    'link' decisions become edges, pointer-jumping connected components
    cluster them, and each cluster collapses to its golden record (per
    attribute: most frequent non-null value, ties to the ascending
    value) -- blocking proposes, the decision layer disposes,
    components cluster, this merges.  The DuckDB oracle replays the
    whole chain including the transitive closure (WITH RECURSIVE) and
    every consensus vote
    (`operators/fuzzyjoin.py::golden_records`,
    `operators/dedup.py::connected_components`)."""
    from ..operators.dedup import connected_components
    from ..operators.fuzzyjoin import golden_records
    from .coverage4 import _DIRTY_SQL

    links = (
        _fs_scored(spark, sf_dir)
        .filter(F.col("score") >= _ER_LINK_MIN)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    )
    cc = connected_components(links)
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("__sid"),
        F.lower(F.trim(F.expr(_DIRTY_SQL))).alias("dname"),
        F.col("s_nationkey").cast("long").alias("nk"),
        F.expr("cast(floor(s_acctbal * 100 + 0.5) as bigint) div 100000").alias(
            "bal_band"
        ),
    )
    # Every entity gets a golden record: linked suppliers adopt their
    # component canonical, singletons stand alone -- the output IS the
    # deduplicated supplier master.  cc only covers linked docs, so the
    # master comes from a left join (cc is candidate-set-sized,
    # broadcastable; the supplier scan stays the probe side).
    mem = sup.join(
        F.broadcast(cc), sup["__sid"] == cc["doc"], "left"
    ).select(
        F.coalesce(F.col("canonical"), F.col("__sid")).alias("canonical"),
        "dname", "nk", "bal_band",
    )
    return golden_records(mem, "canonical", ["dname", "nk", "bal_band"])


# --------------------------------------------------------------------------
# Bounded k-core decomposition of the part<->supplier graph
# --------------------------------------------------------------------------

_KC_ROUNDS = 4


def _kcore_oracle(rounds: int) -> str:
    parts = [
        """
    WITH ew AS MATERIALIZED (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem),
    und AS MATERIALIZED (SELECT src AS s, dst AS d FROM ew
                         UNION SELECT dst, src FROM ew),
    d0 AS (SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM und GROUP BY s),
    hist AS (SELECT deg, CAST(COUNT(*) AS BIGINT) AS c FROM d0 GROUP BY deg),
    cum AS (SELECT deg, SUM(c) OVER (ORDER BY deg) AS cum FROM hist),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
    kv AS MATERIALIZED (
      SELECT CAST(MIN(deg) AS BIGINT) AS k
      FROM cum, tot WHERE cum >= (n + 1) // 2),
    a0 AS MATERIALIZED (SELECT node FROM d0)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""",
    dg{r} AS MATERIALIZED (
      SELECT e.s AS node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM und e
      JOIN a{p} a ON a.node = e.s
      JOIN a{p} b ON b.node = e.d
      GROUP BY e.s
      HAVING COUNT(*) >= (SELECT k FROM kv)),
    a{r} AS MATERIALIZED (SELECT node FROM dg{r})"""
        )
    parts.append(f"\n    SELECT node, deg FROM dg{rounds}")
    return "".join(parts)


@register("kcore_part_supplier", oracle=_kcore_oracle(_KC_ROUNDS))
def q_kcore_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-core extraction over the part<->supplier graph: k-core
    peeling at k = the graph's MEDIAN degree (smallest degree whose
    cumulative node count reaches ceil(n/2) -- computed from the degree
    HISTOGRAM, so no per-node global sort; the scalar comes back to
    the driver like the k-means centroids).  Peeling reaches its
    fixpoint in 2-3 rounds on this degree distribution, inside the
    4-round budget; the oracle unrolls the same rounds with the same
    SQL-computed k (`operators/graph.py::kcore_bounded`)."""
    from ..operators.graph import kcore_bounded

    from ..operators.dedup import _cache_aged

    li = _t(spark, sf_dir, "lineitem")
    ew = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    # Build the undirected frame ONCE (cached through the registry):
    # the median-k histogram reads it here and the peeling loop reads
    # it via prebuilt_undirected -- without this the explode+distinct
    # over lineitem-scale edges ran twice per query (r10 review
    # finding).
    und = _cache_aged(
        "kcore_und",
        ew.unionByName(
            ew.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct(),
    )
    hist = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).alias("__deg"))
        .groupBy("__deg")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy("__deg")
        .collect()
    )
    n = sum(r["__c"] for r in hist)
    need = (n + 1) // 2
    cum = 0
    k = None
    for r in hist:
        cum += r["__c"]
        if cum >= need:
            k = int(r["__deg"])
            break
    if k is None:
        raise ValueError(
            "kcore_part_supplier: empty degree histogram (no edges) -- "
            "median k undefined"
        )
    return kcore_bounded(und, k=k, rounds=_KC_ROUNDS, prebuilt_undirected=True)


# --------------------------------------------------------------------------
# Greedy k-center (Gonzalez) diverse selection over the embeddings
# --------------------------------------------------------------------------

_KCEN_K = 6


def _kcenter_oracle(k: int, dim: int, scale: int) -> str:
    parts = [
        f"""
    WITH u AS MATERIALIZED (
      SELECT vec_id AS id, gs.i AS i,
             CAST(floor(CAST(embedding[gs.i + 1] AS DOUBLE) * {scale} + 0.5)
                  AS BIGINT) AS x
      FROM embeddings, generate_series(0, {dim - 1}) AS gs(i)),
    s1 AS MATERIALIZED (SELECT CAST(MIN(vec_id) AS BIGINT) AS id FROM embeddings),
    md1 AS MATERIALIZED (
      SELECT u.id, CAST(SUM((u.x - c.x) * (u.x - c.x)) AS BIGINT) AS md
      FROM u JOIN (SELECT u2.i, u2.x FROM u u2 JOIN s1 ON u2.id = s1.id) c
        ON c.i = u.i
      GROUP BY u.id)"""
    ]
    for r in range(2, k + 1):
        p = r - 1
        parts.append(
            f""",
    s{r} AS MATERIALIZED (
      SELECT id, md AS radius FROM md{p} ORDER BY md DESC, id LIMIT 1),
    md{r} AS MATERIALIZED (
      SELECT m.id, LEAST(m.md, d.nd) AS md
      FROM md{p} m JOIN (
        SELECT u.id, CAST(SUM((u.x - c.x) * (u.x - c.x)) AS BIGINT) AS nd
        FROM u JOIN (SELECT u2.i, u2.x FROM u u2 JOIN s{r} ON u2.id = s{r}.id) c
          ON c.i = u.i
        GROUP BY u.id) d ON d.id = m.id)"""
        )
    finals = " UNION ALL ".join(
        ["SELECT CAST(1 AS BIGINT) AS rank, id AS vec_id, CAST(0 AS BIGINT) AS radius_fp FROM s1"]
        + [
            f"SELECT CAST({r} AS BIGINT), id, CAST(radius AS BIGINT) FROM s{r}"
            for r in range(2, k + 1)
        ]
    )
    parts.append(f"\n    {finals}")
    return "".join(parts)


@register(
    "kcenter_diverse_embeddings",
    oracle=_kcenter_oracle(_KCEN_K, _KM_DIM, _KM_SCALE),
)
def q_kcenter_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gonzalez greedy k-center over the embedding corpus: 6 diverse
    representatives plus the coverage-radius-at-selection sequence (the
    coverage-vs-budget curve of diverse data selection), every round
    replayed by unrolled MATERIALIZED CTEs
    (`operators/clustering.py::kcenter_greedy_fixedpoint`)."""
    from ..operators.clustering import kcenter_greedy_fixedpoint

    return kcenter_greedy_fixedpoint(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        k=_KCEN_K, dim=_KM_DIM, scale=_KM_SCALE,
    )


@register(
    "kcenter_batched_embeddings",
    oracle=_kcenter_oracle(_KCEN_K, _KM_DIM, _KM_SCALE),
)
def q_kcenter_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified-batch Gonzalez k-center (r11): provably the IDENTICAL
    selection sequence as ``kcenter_diverse_embeddings`` in ~k/batch
    distributed passes instead of k (`operators/clustering.py::
    kcenter_batched_fixedpoint`) -- the oracle is the same unrolled
    sequential-Gonzalez CTE chain, so a driver hash-match IS the
    batch-equivalence proof on the real corpus."""
    from ..operators.clustering import kcenter_batched_fixedpoint

    return kcenter_batched_fixedpoint(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        k=_KCEN_K, dim=_KM_DIM, scale=_KM_SCALE, batch=3,
    )


# --------------------------------------------------------------------------
# Incremental view maintenance: aggregate-over-join under two-sided inserts
# --------------------------------------------------------------------------

_IVM_CUTOFF = "1997-01-01"


@register(
    "ivm_join_agg_maintenance",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_ivm_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an aggregate-over-join view proven
    EQUAL to the direct recompute: orders split at {cutoff} into base +
    insert batch, customers split on key mod 10 into base +
    late-arriving dimension rows; the maintained view folds the four
    product-rule join terms (`operators/maintenance.py::
    ivm_join_delta_terms`) into one aggregate, and the oracle computes
    the view DIRECTLY from the full tables -- hash equality IS the
    correctness proof of the delta algebra (base ⋈ never recomputed at
    maintenance time in the incremental plan)."""
    from ..operators.maintenance import ivm_join_delta_terms

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("__cents"),
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a0 = orders.filter(F.col("o_orderdate") < _IVM_CUTOFF)
    da = orders.filter(F.col("o_orderdate") >= _IVM_CUTOFF)
    b0 = cust.filter(F.col("c_custkey") % 10 != 0)
    db = cust.filter(F.col("c_custkey") % 10 == 0)
    # The maintained view = stored base state (a0 JOIN b0 -- in
    # production this is the materialized view, read back, not
    # recomputed; here it stands in as the state) folded with the three
    # delta terms the operator produces.
    state = a0.join(b0, "c_custkey")
    delta = ivm_join_delta_terms(a0, da, b0, db, "c_custkey")
    return (
        state.unionByName(delta)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("__cents").cast("long").alias("revenue_cents"),
        )
    )


# --------------------------------------------------------------------------
# Join cardinality estimation audit (end-biased histograms vs actual)
# --------------------------------------------------------------------------

_CARD_TOPN = 100


def _card_branch_sql(i: int, ta: str, ka: str, tb: str, kb: str, name: str) -> str:
    n = _CARD_TOPN
    return f"""
    fa{i} AS (SELECT {ka} AS k, CAST(COUNT(*) AS BIGINT) AS fa
              FROM {ta} GROUP BY {ka}),
    fb{i} AS (SELECT {kb} AS k, CAST(COUNT(*) AS BIGINT) AS fb
              FROM {tb} GROUP BY {kb}),
    ta{i} AS (SELECT k, fa FROM fa{i} ORDER BY fa DESC, k LIMIT {n}),
    tb{i} AS (SELECT k, fb FROM fb{i} ORDER BY fb DESC, k LIMIT {n}),
    ra{i} AS (SELECT CAST(COALESCE(SUM(fa), 0) AS BIGINT) AS ra_rows,
                     CAST(COUNT(*) AS BIGINT) AS ra_keys
              FROM fa{i} WHERE k NOT IN (SELECT k FROM ta{i})),
    rb{i} AS (SELECT CAST(COALESCE(SUM(fb), 0) AS BIGINT) AS rb_rows,
                     CAST(COUNT(*) AS BIGINT) AS rb_keys
              FROM fb{i} WHERE k NOT IN (SELECT k FROM tb{i})),
    t1_{i} AS (SELECT CAST(COALESCE(SUM(a.fa * b.fb), 0) AS BIGINT) AS v
               FROM ta{i} a JOIN tb{i} b USING (k)),
    t2_{i} AS (SELECT CAST(COALESCE(SUM(a.fa * (rb_rows // GREATEST(rb_keys, 1))), 0)
                    AS BIGINT) AS v
               FROM ta{i} a CROSS JOIN rb{i}
               WHERE a.k NOT IN (SELECT k FROM tb{i})),
    t3_{i} AS (SELECT CAST(COALESCE(SUM(b.fb * (ra_rows // GREATEST(ra_keys, 1))), 0)
                    AS BIGINT) AS v
               FROM tb{i} b CROSS JOIN ra{i}
               WHERE b.k NOT IN (SELECT k FROM ta{i})),
    t4_{i} AS (SELECT CAST((ra_rows * rb_rows) // GREATEST(ra_keys, rb_keys, 1)
                    AS BIGINT) AS v
               FROM ra{i} CROSS JOIN rb{i}),
    act{i} AS (SELECT CAST(COALESCE(SUM(a.fa * b.fb), 0) AS BIGINT) AS actual_rows
               FROM fa{i} a JOIN fb{i} b USING (k)),
    res{i} AS (
      SELECT '{name}' AS join_name,
             CAST(t1_{i}.v + t2_{i}.v + t3_{i}.v + t4_{i}.v AS BIGINT) AS est_rows,
             act{i}.actual_rows
      FROM t1_{i}, t2_{i}, t3_{i}, t4_{i}, act{i})"""


_CARD_JOINS = [
    ("orders", "o_custkey", "customer", "c_custkey", "orders_customer"),
    ("lineitem", "l_partkey", "part", "p_partkey", "lineitem_part"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey", "lineitem_supplier"),
]


def _card_oracle() -> str:
    branches = ",".join(
        _card_branch_sql(i, *spec) for i, spec in enumerate(_CARD_JOINS)
    )
    finals = " UNION ALL ".join(
        f"SELECT join_name, est_rows, actual_rows, "
        f"CAST((ABS(est_rows - actual_rows) * 10000) // GREATEST(actual_rows, 1) "
        f"AS BIGINT) AS err_bp FROM res{i}"
        for i in range(len(_CARD_JOINS))
    )
    return f"WITH {branches}\n    {finals}"


@register("join_cardinality_audit", oracle=_card_oracle())
def q_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based-optimizer statistics audit: end-biased-histogram
    (top-100 exact head + uniform tail, System-R containment) join
    cardinality estimates vs the EXACT cardinality for three workload
    joins, with the error in basis points -- the number a platform
    team reads to size its histogram budget against workload skew
    (`operators/skew.py::join_cardinality_estimate`)."""
    from functools import reduce as _reduce

    from ..operators.skew import join_cardinality_estimate

    outs = []
    for ta, ka, tb, kb, name in _CARD_JOINS:
        a = _t(spark, sf_dir, ta).select(F.col(ka).alias("jk"))
        b = _t(spark, sf_dir, tb).select(F.col(kb).alias("jk"))
        outs.append(
            join_cardinality_estimate(a, b, "jk", topn=_CARD_TOPN).select(
                F.lit(name).alias("join_name"), "est_rows", "actual_rows", "err_bp"
            )
        )
    return _reduce(lambda x, y: x.unionByName(y), outs)


# --------------------------------------------------------------------------
# Functional-dependency audit over workload tables
# --------------------------------------------------------------------------

_FD_CANDIDATES = [
    ("orders", ["o_orderkey"], "o_orderdate", "orders_pk_date"),
    ("orders", ["o_custkey"], "o_orderpriority", "cust_priority"),
    ("lineitem", ["l_partkey"], "l_suppkey", "part_supplier"),
    ("customer", ["c_nationkey"], "c_mktsegment", "nation_segment"),
]


def _fd_oracle() -> str:
    branches = []
    for table, det, dep, name in _FD_CANDIDATES:
        d = ", ".join(det)
        branches.append(f"""
    SELECT '{name}' AS fd_name, n_determinants, n_violating, max_images,
           CAST((n_violating * 10000) // GREATEST(n_determinants, 1)
                AS BIGINT) AS violation_bp
    FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_determinants,
             CAST(COALESCE(SUM(CASE WHEN imgs > 1 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_violating,
             CAST(MAX(imgs) AS BIGINT) AS max_images
      FROM (
        SELECT {d}, CAST(COUNT(*) AS BIGINT) AS imgs
        FROM (SELECT DISTINCT {d}, {dep} FROM {table})
        GROUP BY {d}))""")
    return " UNION ALL ".join(branches)


@register("fd_violation_audit", oracle=_fd_oracle())
def q_fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over four candidate FDs: the
    primary-key dependency holds (0 violations -- the control row) and
    the three denormalization-trap candidates quantify exactly how
    badly they fail (`operators/skew.py::fd_violations`)."""
    from functools import reduce as _reduce

    from ..operators.skew import fd_violations

    outs = []
    for table, det, dep, name in _FD_CANDIDATES:
        outs.append(
            fd_violations(_t(spark, sf_dir, table), det, dep).select(
                F.lit(name).alias("fd_name"),
                "n_determinants", "n_violating", "max_images", "violation_bp",
            )
        )
    return _reduce(lambda a, b: a.unionByName(b), outs)


# --------------------------------------------------------------------------
# HDR log-linear quantile sketch (mergeable, day -> total rollup)
# --------------------------------------------------------------------------

_HDR_QS = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]


def _hdr_oracle() -> str:
    from ..operators.sketches import hdr_bounds_sql, hdr_bucket_sql

    b = hdr_bucket_sql("cents", div="//")
    lo, hi = hdr_bounds_sql("bucket", div="//")
    qvals = ", ".join(f"('{lab}', {n}, {d})" for lab, n, d in _HDR_QS)
    return f"""
    WITH vals AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    day_regs AS (
      SELECT day, CAST({b} AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM vals GROUP BY 1, 2),
    merged AS (
      SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM day_regs GROUP BY bucket),
    cum AS (
      SELECT bucket, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n_total
      FROM merged),
    qs(q_label, num, den) AS (VALUES {qvals}),
    hits AS (
      SELECT q_label, n_total, CAST(MIN(bucket) AS BIGINT) AS bucket
      FROM cum CROSS JOIN qs
      WHERE cum >= (num * n_total + den - 1) // den
      GROUP BY q_label, n_total)
    SELECT q_label, n_total, bucket,
           CAST({lo} AS BIGINT) AS est_lo,
           CAST({hi} AS BIGINT) AS est_hi
    FROM hits
    """


@register("hdr_value_quantiles", oracle=_hdr_oracle())
def q_hdr_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: per-day HDR log-linear registers over
    event value cents, merged day->total by summing register cells
    (never re-scanning values), p50/p90/p99 bucket estimates with exact
    integer rank arithmetic and <= 1/16 relative value bounds -- the
    third sketch family next to portable HLL and CMS
    (`operators/sketches.py::hdr_registers/hdr_merge/hdr_quantiles`)."""
    from ..operators.sketches import hdr_merge, hdr_quantiles, hdr_registers

    e = read_events(spark, sf_dir).select(
        F.col("ts").cast("date").alias("day"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    day_regs = hdr_registers(e, ["day"], "cents")
    merged = hdr_merge(day_regs, [])
    return hdr_quantiles(merged, _HDR_QS)


# --------------------------------------------------------------------------
# Exact bitmap indexes (roaring pattern): the oracles here are GROUND
# TRUTH (COUNT DISTINCT / distinct self-join), not replays -- the hash
# gate proves the bitmap path computes the true sets exactly.
# --------------------------------------------------------------------------


@register(
    "bitmap_distinct_daily_users",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY 1
    """,
)
def q_bitmap_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily distinct users via 32-bit bitmap words -- the
    roaring-bitmap pattern: one bit_or aggregate collapses the stream
    to word cells, popcounts sum to the exact distinct count, and the
    word frame merges across days without re-touching rows.  The oracle
    is the semantic ground truth (COUNT DISTINCT), so the hash gate
    proves exactness, not just replay
    (`operators/bloom.py::bitmap_registers/bitmap_cardinality`)."""
    from ..operators.bloom import bitmap_cardinality, bitmap_registers

    e = read_events(spark, sf_dir).select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    return bitmap_cardinality(
        bitmap_registers(e, ["day"], "user_id"), ["day"]
    )


@register(
    "bitmap_type_overlap_exact",
    oracle="""
    WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
    c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM ut GROUP BY 1),
    ovl AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT ca.event_type AS event_type_a, cb.event_type AS event_type_b,
           ca.n AS n_a, cb.n AS n_b,
           CAST(COALESCE(ovl.nb, 0) AS BIGINT) AS n_both,
           CAST(ca.n + cb.n - COALESCE(ovl.nb, 0) AS BIGINT) AS n_union,
           CAST((2 * COALESCE(ovl.nb, 0) * 1000000
                 + (ca.n + cb.n - COALESCE(ovl.nb, 0)))
                // (2 * (ca.n + cb.n - COALESCE(ovl.nb, 0)))
                AS BIGINT) AS jaccard_fp
    FROM c ca CROSS JOIN c cb
    LEFT JOIN ovl ON ovl.ta = ca.event_type AND ovl.tb = cb.event_type
    WHERE ca.event_type < cb.event_type
    """,
)
def q_bitmap_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience overlap between every event-type pair via bitmap
    AND: intersections popcount ANDed words, unions come by inclusion-
    exclusion, Jaccard in half-up micro fixed point -- the exact
    counterpart to the portable-HLL `sketch_event_type_overlap` (use
    bitmaps while ids are dense, sketches when they are not).  Oracle =
    ground-truth distinct self-join
    (`operators/bloom.py::bitmap_pair_overlap`)."""
    from ..operators.bloom import bitmap_pair_overlap, bitmap_registers

    e = read_events(spark, sf_dir).select("event_type", "user_id")
    regs = bitmap_registers(e, ["event_type"], "user_id")
    return bitmap_pair_overlap(regs, "event_type")


# --------------------------------------------------------------------------
# HITS hubs & authorities (unrolled-CTE oracle, L-inf renorm)
# --------------------------------------------------------------------------

_HITS_ITER = 3
_HITS_SCALE = 1_000_000
_HITS_TOP = 10


def _hits_oracle() -> str:
    s = _HITS_SCALE
    ctes = [
        """edges AS MATERIALIZED (
      SELECT DISTINCT l_partkey AS s, l_suppkey AS d FROM lineitem)""",
        f"""h0 AS (SELECT DISTINCT s AS node, CAST({s} AS BIGINT) AS r
      FROM edges)""",
    ]
    for i in range(1, _HITS_ITER + 1):
        ctes.append(
            f"""a{i}r AS MATERIALIZED (
      SELECT e.d AS node, CAST(SUM(h.r) AS BIGINT) AS sm
      FROM edges e JOIN h{i - 1} h ON h.node = e.s GROUP BY e.d)"""
        )
        ctes.append(
            f"""a{i} AS MATERIALIZED (
      SELECT node, CAST((sm * {s}) // (SELECT MAX(sm) FROM a{i}r)
                        AS BIGINT) AS r
      FROM a{i}r)"""
        )
        ctes.append(
            f"""h{i}r AS MATERIALIZED (
      SELECT e.s AS node, CAST(SUM(a.r) AS BIGINT) AS sm
      FROM edges e JOIN a{i} a ON a.node = e.d GROUP BY e.s)"""
        )
        ctes.append(
            f"""h{i} AS MATERIALIZED (
      SELECT node, CAST((sm * {s}) // (SELECT MAX(sm) FROM h{i}r)
                        AS BIGINT) AS r
      FROM h{i}r)"""
        )
    n = _HITS_ITER
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT * FROM (
      SELECT 'hub' AS side, node, r AS score_fp FROM h{n}
      ORDER BY r DESC, node LIMIT {_HITS_TOP})
    UNION ALL
    SELECT * FROM (
      SELECT 'auth' AS side, node, r AS score_fp FROM a{n}
      ORDER BY r DESC, node LIMIT {_HITS_TOP})
    """
    )


@register("hits_part_supplier", oracle=_hits_oracle())
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS over the directed part->supplier graph: top-10 hub parts and
    top-10 authority suppliers after 3 L-inf-renormalized fixed-point
    rounds -- exact BIGINT replay, per-round max as a bounded 1-row
    collect (`operators/graph.py::hits_fixedpoint`)."""
    from ..operators.graph import hits_fixedpoint

    li = spark.read.parquet(table_path(sf_dir, "lineitem")).select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    hubs, auths = hits_fixedpoint(
        li, iterations=_HITS_ITER, scale=_HITS_SCALE
    )
    top_h = (
        hubs.orderBy(F.desc("score_fp"), F.asc("node"))
        .limit(_HITS_TOP)
        .select(F.lit("hub").alias("side"), "node", "score_fp")
    )
    top_a = (
        auths.orderBy(F.desc("score_fp"), F.asc("node"))
        .limit(_HITS_TOP)
        .select(F.lit("auth").alias("side"), "node", "score_fp")
    )
    return top_h.unionByName(top_a)


# --------------------------------------------------------------------------
# Rendezvous-hash shard rebalance audit
# --------------------------------------------------------------------------


def _hrw_a_sql(name: str, n: int) -> str:
    vals = ", ".join(f"({i})" for i in range(n))
    w = (
        "CAST(('0x' || substring(md5('hrw:' || CAST(s AS VARCHAR)"
        " || ':' || CAST(k AS VARCHAR)), 2, 15)) AS BIGINT)"
    )
    return f"""{name} AS (
      SELECT k, CAST(MAX({w} * 8 + s) % 8 AS BIGINT) AS shard
      FROM (SELECT k, s FROM keys CROSS JOIN (VALUES {vals}) v(s))
      GROUP BY k)"""


@register(
    "hrw_shard_rebalance_audit",
    oracle=f"""
    WITH keys AS (SELECT o_orderkey AS k FROM orders),
    {_hrw_a_sql("a4", 4)},
    {_hrw_a_sql("a5", 5)}
    SELECT a5.shard,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN a4.shard <> a5.shard THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved_in
    FROM a4 JOIN a5 USING (k) GROUP BY a5.shard
    """,
)
def q_hrw_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash resize audit: shard assignments of every order
    key at N=4 vs N=5 -- HRW's minimal-disruption property means every
    moved key lands in the NEW shard (n_moved_in > 0 only for shard 4)
    and ~1/5 of keys move; the hash gate verifies both via the exact
    per-shard counts (`operators/skew.py::hrw_assignments`)."""
    from ..operators.skew import hrw_assignments

    keys = spark.read.parquet(table_path(sf_dir, "orders")).select(
        F.col("o_orderkey").alias("k")
    )
    a4 = hrw_assignments(keys, "k", 4).withColumnRenamed("shard", "s4")
    a5 = hrw_assignments(keys, "k", 5).withColumnRenamed("shard", "s5")
    return (
        a4.join(a5, "k")
        .groupBy(F.col("s5").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.when(F.col("s4") != F.col("s5"), 1).otherwise(0))
            .cast("long")
            .alias("n_moved_in"),
        )
    )
