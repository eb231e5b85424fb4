"""Round-11 widening: substring-granular dedup (Lee et al. 2022 exact
substring policy), semantic dedup, z-order layout audit, hard-negative
mining, interval coalescing.

Each query follows the portable-oracle recipe (BIGINT arithmetic or the
floor half-up formula at every engine boundary) so the driver
hash-verifies values, not just shapes.  Reference parity: none of these
exist in the reference -- they extend the dedup / layout / similarity /
relational families per SURVEY §2.11 ('beyond-reference training-data
operators').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# --------------------------------------------------------------------------
# Exact substring-duplicate spans (Lee et al. 2022, relationally)
# --------------------------------------------------------------------------

_SUBSTR_L = 6


def _substr_span_sql(length: int) -> str:
    """Shared CTE block (DuckDB): maximal duplicated-substring spans.
    Mirrors `operators/dedup.py::substring_duplicate_spans` step for
    step; the 60-bit md5-slice hash is the portable base hash."""
    return f"""
    toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
             FROM documents),
    lt AS (SELECT doc_id, t FROM toks WHERE len(t) >= {length}),
    g AS (
      SELECT doc_id,
             CAST(generate_subscripts(shs, 1) - 1 AS BIGINT) AS pos,
             CAST('0x' || substring(md5(unnest(shs)), 2, 15) AS BIGINT) AS h
      FROM (SELECT doc_id,
                   list_transform(
                     generate_series(0, len(t) - {length}),
                     i -> array_to_string(t[i + 1 : i + {length}], ' ')) AS shs
            FROM lt) s),
    dup AS (SELECT h FROM (SELECT DISTINCT h, doc_id FROM g)
            GROUP BY h HAVING COUNT(*) >= 2),
    cov AS (SELECT doc_id, pos, pos + {length - 1} AS e
            FROM g SEMI JOIN dup USING (h)),
    flg AS (
      SELECT doc_id, pos, e,
             CASE WHEN MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    OR pos > MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                  THEN 1 ELSE 0 END AS nw
      FROM cov),
    isl AS (SELECT doc_id, pos, e,
                   SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isle
            FROM flg),
    spans AS (SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
                     CAST(MAX(e) AS BIGINT) AS span_end
              FROM isl GROUP BY doc_id, isle)"""


@register(
    "dedup_substring_spans",
    oracle=f"""
    WITH {_substr_span_sql(_SUBSTR_L)}
    SELECT doc_id, span_start, span_end,
           span_end - span_start + 1 AS span_len
    FROM spans""",
)
def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal spans of tokens covered by some L-gram that appears
    verbatim in >= 2 documents -- the substring-granular dedup policy
    (`operators/dedup.py::substring_duplicate_spans`)."""
    from ..operators.dedup import substring_duplicate_spans

    return substring_duplicate_spans(
        _t(spark, sf_dir, "documents"), "doc_id", "text", length=_SUBSTR_L
    )


@register(
    "dedup_substring_stats",
    oracle=f"""
    WITH {_substr_span_sql(_SUBSTR_L)},
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_spans
      FROM spans GROUP BY doc_id),
    totals AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
    SELECT p.doc_id, t.n_tokens, p.dup_tokens, p.n_spans,
           (p.dup_tokens * 20000 + t.n_tokens) // (2 * t.n_tokens)
             AS dup_frac_bp
    FROM per_doc p JOIN totals t ON p.doc_id = t.doc_id""",
)
def q_substring_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-token budget (count + basis-point
    fraction, exact integer half-up) over the substring spans -- the
    quality-gate decision column
    (`operators/dedup.py::substring_duplicate_stats`)."""
    from ..operators.dedup import substring_duplicate_stats

    return substring_duplicate_stats(
        _t(spark, sf_dir, "documents"), "doc_id", "text", length=_SUBSTR_L
    )


# --------------------------------------------------------------------------
# SemDeDup: semantic dedup within engine-deterministic coarse clusters
# --------------------------------------------------------------------------

_SEMDEDUP_THR = 0.42
_SEMDEDUP_K = 16
_SEMDEDUP_SCALE = 1_000_000

# Constants interpolate into the oracle text so retuning _SEMDEDUP_K /
# _SEMDEDUP_SCALE can never drift the two engines apart (the
# shared-constants rule every portable oracle in this repo follows).


def ivf_assign_ctes(k_expr: str) -> str:
    """IVF assignment CTE block (DuckDB) shared by the semdedup oracles;
    ``k_expr`` is the cluster-count SQL -- a literal for the pinned k=16
    geometry, a COUNT(*)-derived scalar subquery for the corpus-scaled
    one (coverage7) -- so the two oracles can never drift from each
    other structurally."""
    return f"""
    e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    q AS (
      SELECT vec_id, i, CAST(FLOOR(v * {_SEMDEDUP_SCALE}) AS BIGINT) AS qv
      FROM e),
    nrm AS (SELECT vec_id, SQRT(SUM(v * v)) AS n FROM e GROUP BY 1),
    cent_ids AS (
      SELECT vec_id AS cluster FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (
                 ORDER BY ((CAST(vec_id AS BIGINT) % 2147483648)
                           * 2654435761) % 2147483648, vec_id) AS rn
        FROM embeddings)
      WHERE rn <= {k_expr}),
    centq AS (
      SELECT c.cluster, q.i, q.qv AS cqv
      FROM cent_ids c JOIN q ON q.vec_id = c.cluster),
    d2 AS (
      SELECT q.vec_id, c.cluster,
             CAST(SUM((q.qv - c.cqv) * (q.qv - c.cqv)) AS BIGINT) AS d2
      FROM q JOIN centq c ON q.i = c.i
      GROUP BY 1, 2),
    assigned AS (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM d2)
      WHERE rn = 1)"""


def semdedup_verdict_sql(k_expr: str) -> str:
    """Full semdedup oracle (DuckDB) at the given cluster-count SQL --
    single-sourced so the pinned-k and corpus-scaled queries share every
    character except ``k_expr``."""
    return f"""
    WITH {ivf_assign_ctes(k_expr)},
    dot AS (
      SELECT a.vec_id AS id_lo, b.vec_id AS id_hi, SUM(ea.v * eb.v) AS d
      FROM assigned a
      JOIN assigned b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id AND eb.i = ea.i
      GROUP BY 1, 2),
    near AS (
      SELECT id_hi, CAST(MIN(id_lo) AS BIGINT) AS dup_of
      FROM dot
      JOIN nrm na ON na.vec_id = id_lo
      JOIN nrm nb ON nb.vec_id = id_hi
      WHERE ROUND(d / (na.n * nb.n), 6) >= {_SEMDEDUP_THR}
      GROUP BY id_hi)
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
           CAST(CASE WHEN n.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_kept,
           CAST(COALESCE(n.dup_of, -1) AS BIGINT) AS dup_of
    FROM assigned a LEFT JOIN near n ON n.id_hi = a.vec_id"""


@register("semdedup_portable", oracle=semdedup_verdict_sql(str(_SEMDEDUP_K)))
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: within-cluster semantic near-dup pruning under the
    engine-deterministic IVF quantizer -- per-vector keep/drop verdicts
    hash-verified cross-engine
    (`operators/similarity.py::semantic_dedup`)."""
    from ..operators.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        n_clusters=_SEMDEDUP_K,
        threshold=_SEMDEDUP_THR,
        scale=_SEMDEDUP_SCALE,
    )


# --------------------------------------------------------------------------
# Hard-negative mining (contrastive training negatives)
# --------------------------------------------------------------------------

_HARDNEG_ANCHORS = 8
_HARDNEG_K = 5


@register(
    "hardneg_mining_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    nrm AS (SELECT vec_id, SQRT(SUM(v * v)) AS n FROM e GROUP BY 1),
    anchors AS (SELECT DISTINCT vec_id, label FROM e
                WHERE vec_id < {_HARDNEG_ANCHORS}),
    dot AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST(b.label AS BIGINT) AS neg_label, SUM(a.v * b.v) AS d
      FROM e a
      JOIN anchors an ON an.vec_id = a.vec_id
      JOIN e b ON b.i = a.i AND b.label <> an.label
      GROUP BY 1, 2, 3),
    scored AS (
      SELECT query_id, neighbor_id, neg_label,
             ROUND(d / (nq.n * nc.n), 6) AS cos_sim
      FROM dot JOIN nrm nq ON nq.vec_id = query_id
               JOIN nrm nc ON nc.vec_id = neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, neg_label, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, neg_label, cos_sim,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_HARDNEG_K}""",
)
def q_hardneg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: per anchor (vec_id < 8), the top-5
    most-similar vectors with a DIFFERENT label -- the contrastive-
    training negative sampler
    (`operators/similarity.py::hard_negative_topk`)."""
    from ..operators.similarity import hard_negative_topk

    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < _HARDNEG_ANCHORS)
    return hard_negative_topk(
        emb, anchors, "vec_id", "embedding", "label", k=_HARDNEG_K
    )


# --------------------------------------------------------------------------
# Interval coalescing (gaps-and-islands) over order activity windows
# --------------------------------------------------------------------------

_ACTIVITY_DAYS = 30


@register(
    "interval_coalesce_activity",
    oracle=f"""
    WITH iv AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + {_ACTIVITY_DAYS} AS e
      FROM orders),
    per_start AS (
      SELECT o_custkey, s, CAST(COUNT(*) AS BIGINT) AS n, MAX(e) AS e
      FROM iv GROUP BY o_custkey, s),
    flg AS (
      SELECT o_custkey, s, e, n,
             CASE WHEN MAX(e) OVER (PARTITION BY o_custkey ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    OR s > MAX(e) OVER (PARTITION BY o_custkey ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS nw
      FROM per_start),
    isl AS (
      SELECT o_custkey, s, e, n,
             SUM(nw) OVER (PARTITION BY o_custkey ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isle
      FROM flg)
    SELECT o_custkey, MIN(s) AS span_start, MAX(e) AS span_end,
           CAST(SUM(n) AS BIGINT) AS n_orders,
           CAST(date_diff('day', MIN(s), MAX(e)) AS BIGINT) AS span_days
    FROM isl GROUP BY o_custkey, isle""",
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer activity spans: each order opens a {30}-day half-open
    activity window; overlapping-or-touching windows merge into maximal
    spans (`operators/windows.py::coalesce_intervals`)."""
    from ..operators.windows import coalesce_intervals

    iv = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), _ACTIVITY_DAYS).alias("e"),
    )
    spans = coalesce_intervals(iv, "o_custkey", "s", "e", count_col="n_orders")
    return spans.select(
        "o_custkey",
        "span_start",
        "span_end",
        "n_orders",
        F.datediff("span_end", "span_start").cast("long").alias("span_days"),
    )


# --------------------------------------------------------------------------
# Z-order layout audit: multi-dimensional clustering vs linear sort keys
# --------------------------------------------------------------------------

_Z_W = 12           # bits per dimension (24-bit z-values)
_Z_CUST_DIV = 4     # custkey bucket width
# VALIDITY BOUND (r11 advice): with _Z_W=12 the bucket expressions cap at
# 4095, so custkey div 4 saturates beyond custkey 16383 -- fine at the
# fixture scales this audit is registered for (custkey <= 14999 at
# sf0.1) but at sf>=1 the cap would collapse all higher customers into
# one bucket and flatten the cust-dimension discrimination.  Parity is
# unaffected (both engines share the cap); re-derive _Z_W/_Z_CUST_DIV
# from the scale's custkey range before reusing the audit beyond sf0.1.
_Z_RPF = 250        # simulated rows per file
# Probe windows sit inside every fixture's live range (k_day spans
# 1091-3495 at all scales; custkey reaches 149 at sf0.001).
_Z_PROBES = [
    ("cust_point", "k_cust", 120, 120),
    ("cust_band", "k_cust", 40, 80),
    ("day_week", "k_day", 2000, 2006),
    ("day_month", "k_day", 1500, 1529),
]


def _zvalue_expr(a: str, b: str, w: int, div: str) -> str:
    """Bit-interleaved z-value of two bucketed BIGINTs as ONE integer
    expression, emitted for either engine (`div` = 'div' Spark / '//'
    DuckDB) -- the single-source rule: the Spark column and the DuckDB
    oracle read the same generated text, so the curve cannot drift.

    Same bit convention as `operators/layout.py::morton_key` (first
    operand in even bits) -- the Column-based builder the write path
    uses; equivalence is pinned by
    `tests/test_r11_ops.py::test_zvalue_expr_matches_morton_key`.
    This text form exists because a Column cannot be replayed by the
    DuckDB oracle."""
    terms = []
    for i in range(w):
        terms.append(f"(({a} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({b} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def _z_bucket_exprs(div: str) -> tuple[str, str]:
    cap = (1 << _Z_W) - 1
    return (
        f"LEAST(k_cust {div} {_Z_CUST_DIV}, {cap})",
        f"LEAST(k_day, {cap})",
    )


def _zorder_oracle() -> str:
    cb, db = _z_bucket_exprs("//")
    zv = _zvalue_expr(f"({cb})", f"({db})", _Z_W, "//")
    base = (
        "SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS k_cust,"
        " CAST(date_diff('day', DATE '1992-01-06',"
        " CAST(o_orderdate AS DATE)) AS BIGINT) AS k_day"
        " FROM orders"
    )
    ctes = [
        f"b0 AS ({base})",
        f"base AS (SELECT o_orderkey, k_cust, k_day, CAST({zv} AS BIGINT) AS k_z FROM b0)",
    ]
    parts = []
    for lname, scol in (("lin_cust", "k_cust"), ("lin_day", "k_day"), ("zorder", "k_z")):
        ctes.append(
            f"""f_{lname} AS (
      SELECT ((rk - 1) // {_Z_RPF}) AS fid,
             MIN(k_cust) AS mn_k_cust, MAX(k_cust) AS mx_k_cust,
             MIN(k_day) AS mn_k_day, MAX(k_day) AS mx_k_day
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY {scol}, o_orderkey)
                      AS rk FROM base)
      GROUP BY 1)"""
        )
        for pid, pcol, lo, hi in _Z_PROBES:
            parts.append(
                f"""SELECT '{lname}' AS layout, '{pid}' AS pred_id,
       CAST(COUNT(*) AS BIGINT) AS files_total,
       CAST(SUM(CASE WHEN {lo} <= mx_{pcol} AND {hi} >= mn_{pcol}
                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST((2 * SUM(CASE WHEN {lo} <= mx_{pcol} AND {hi} >= mn_{pcol}
                     THEN 1 ELSE 0 END) * 1000000 + COUNT(*))
            // (2 * COUNT(*)) AS BIGINT) AS scan_share_micro
FROM f_{lname}"""
            )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(parts)


@register("zorder_pruning_audit", oracle=_zorder_oracle())
def q_zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does z-order clustering earn its rewrite: simulate 250-row files
    under two linear sort keys and a 24-bit bit-interleaved z-value
    (custkey x orderdate), and count the files each single-dimension
    predicate's zone maps would prune.  The z-value column is generated
    from the same expression text the DuckDB oracle runs
    (`_zvalue_expr`); file assignment / zone maps / scan shares reuse
    `operators/layout.py::pruning_audit` unchanged -- the audit is a
    LAYOUT, not a new engine path."""
    from ..operators.layout import pruning_audit

    cb, db = _z_bucket_exprs("div")
    zv = _zvalue_expr(f"({cb})", f"({db})", _Z_W, "div")
    base = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_custkey").cast("long").alias("k_cust"),
            F.expr(
                "CAST(datediff(CAST(o_orderdate AS DATE), DATE'1992-01-06')"
                " AS BIGINT)"
            ).alias("k_day"),
        )
        .withColumn("k_z", F.expr(zv).cast("long"))
    )
    return pruning_audit(
        base,
        "o_orderkey",
        {"lin_cust": "k_cust", "lin_day": "k_day", "zorder": "k_z"},
        ["k_cust", "k_day"],
        _Z_PROBES,
        rows_per_file=_Z_RPF,
    )
