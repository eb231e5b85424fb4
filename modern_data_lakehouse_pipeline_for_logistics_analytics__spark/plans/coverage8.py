"""Round-12 widening, batch 2: the distribution-shift / statistical-QA
family a training-data pipeline runs before trusting an ingest window --
exact two-sample Kolmogorov-Smirnov drift, Pearson chi-square
independence, Jensen-Shannon source drift, the Wald-Wolfowitz runs test
-- plus binary ranking evaluation (precision/recall/MRR, the set-centric
numbers `ndcg_retrieval_eval` does not give) and the feature-hashing
collision audit (the hashing-trick table a wide-vocabulary trainer
checks before fixing its feature dimension).

Every query follows the portable-oracle recipe: integer statistics with
one terminal half-up micro division (``micro_ratio_sql``), or per-item
nano/micro fixed-point quantization BEFORE any sum where a ``ln`` is
irreducible (the KL/nDCG discipline), shared expression text
(``chisq_cell_sql``) where both engines parse one string.  Reference
parity: none of these exist in the reference -- they extend the
drift/eval/trainprep families per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.experiments import (
    chisq_cell_sql,
    micro_ratio_sql,
    runs_var_micro_sql,
)
from .registry import register, table_path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


_TOK_SQL = "unnest(string_split_regex(lower(trim(text)), '\\s+'))"

# The repo-standard portable 60-bit hash, DuckDB side (Spark twin:
# operators/dedup.py::portable_base_hash).
_HASH60_SQL = "CAST(CONCAT('0x', substring(md5(term), 2, 15)) AS BIGINT)"


# --------------------------------------------------------------------------
# Two-sample KS drift: did the price distribution move between halves?
# --------------------------------------------------------------------------

_KS_SPLIT = "TIMESTAMP '1996-01-01'"


@register(
    "ks_price_drift_halves",
    oracle=f"""
    WITH src AS (
      SELECT o_totalprice AS s,
             CASE WHEN o_orderdate < {_KS_SPLIT} THEN 1 ELSE 0 END AS in_a
      FROM orders WHERE o_totalprice IS NOT NULL),
    h AS (SELECT s, CAST(SUM(in_a) AS BIGINT) AS cnt_a,
                 CAST(SUM(1 - in_a) AS BIGINT) AS cnt_b
          FROM src GROUP BY 1),
    c AS (SELECT s,
                 CAST(SUM(cnt_a) OVER (ORDER BY s) AS BIGINT) AS cum_a,
                 CAST(SUM(cnt_b) OVER (ORDER BY s) AS BIGINT) AS cum_b
          FROM h),
    tot AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
                   CAST(SUM(cnt_b) AS BIGINT) AS n_b FROM h),
    g AS (SELECT s, n_a, n_b,
                 CAST(ABS(cum_a * n_b - cum_b * n_a) AS BIGINT) AS d
          FROM c CROSS JOIN tot),
    top AS (SELECT * FROM g ORDER BY d DESC, s ASC LIMIT 1)
    SELECT n_a, n_b, s AS ks_at,
           CASE WHEN n_a > 0 AND n_b > 0
                THEN {micro_ratio_sql('d', 'n_a * n_b', '//')}
                ELSE -1 END AS ks_micro
    FROM top""",
)
def q_ks_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the order
    price distributions before/after 1996-01-01 -- integer sup-gap over
    per-value histograms with ONE distributed prefix sum (the scaled
    gap telescopes), no global sort, one terminal micro division
    (`operators/experiments.py::ks_two_sample`)."""
    from ..operators.experiments import ks_two_sample

    orders = _t(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.expr(f"o_orderdate < {_KS_SPLIT}").alias("in_a"),
    )
    return ks_two_sample(orders, "o_totalprice", "in_a")


# --------------------------------------------------------------------------
# Chi-square independence: is the event mix independent of the weekday?
# --------------------------------------------------------------------------


@register(
    "chisq_type_weekday_independence",
    oracle=f"""
    WITH pairs AS (
      SELECT event_type AS a,
             ((datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7)
              + 7) % 7 AS b
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
    ct AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
           FROM pairs GROUP BY 1, 2),
    m AS (SELECT a, b, n_ab,
                 CAST(SUM(n_ab) OVER (PARTITION BY a) AS BIGINT) AS n_a,
                 CAST(SUM(n_ab) OVER (PARTITION BY b) AS BIGINT) AS n_b
          FROM ct),
    tot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM ct),
    cells AS (SELECT n, a, b, {chisq_cell_sql()} AS cell_fp
              FROM m CROSS JOIN tot)
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1)
                AS BIGINT) AS dof,
           CAST(SUM(cell_fp) - MAX(n) * 1000000 AS BIGINT) AS chi2_micro
    FROM cells""",
)
def q_chisq_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    weekday (epoch-day mod 7 -- engine-neutral, no dayofweek convention
    drift) -- per-cell contributions micro-quantized through the SHARED
    ``chisq_cell_sql`` expression text before the sum
    (`operators/experiments.py::chisq_independence`)."""
    from ..operators.experiments import chisq_independence

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        F.expr(
            "pmod(datediff(CAST(ts AS DATE), DATE'2024-01-01'), 7)"
        ).cast("long").alias("b"),
    )
    return chisq_independence(ev, "a", "b")


# --------------------------------------------------------------------------
# Jensen-Shannon source drift: KL's comparable, bounded sibling
# --------------------------------------------------------------------------


@register(
    "jsd_source_drift",
    oracle=f"""
    WITH tok AS (
      SELECT source, {_TOK_SQL} AS term FROM documents),
    st AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_st
           FROM tok GROUP BY source, term),
    stw AS (SELECT *,
                   CAST(SUM(c_st) OVER (PARTITION BY term) AS BIGINT) AS c_t,
                   CAST(SUM(c_st) OVER (PARTITION BY source) AS BIGINT) AS n_s
            FROM st),
    tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM st),
    sc AS (
      SELECT source, n_s, CAST(c_t AS BIGINT) AS c_t,
             CAST(n AS BIGINT) AS n,
             CAST(FLOOR((
               0.5 * (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                 * ln((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                      / ((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)
                          + CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
                         / 2.0))
               + 0.5 * (CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln((CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
                      / ((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)
                          + CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE))
                         / 2.0))
             ) * 1000000000.0 + 0.5) AS BIGINT) AS term_fp
      FROM stw CROSS JOIN tot)
    SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(term_fp)
                + CAST(FLOOR(0.5 * ln(2.0)
                    * (CAST(MAX(n) - SUM(c_t) AS DOUBLE)
                       / CAST(MAX(n) AS DOUBLE))
                    * 1000000000.0 + 0.5) AS BIGINT)
                AS BIGINT) AS jsd_nano
    FROM sc GROUP BY source""",
)
def q_jsd_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the corpus -- symmetric and bounded so sources compare on one
    scale; absent-term mass folded closed-form (0.5 ln2 x uncovered
    corpus probability), never a source x vocabulary cross
    (`operators/textstats.py::jsd_source_drift`)."""
    from ..operators.textstats import jsd_source_drift

    return jsd_source_drift(_t(spark, sf_dir, "documents"), "source", "text")


# --------------------------------------------------------------------------
# Runs test: is the daily-revenue sign sequence random around its median?
# --------------------------------------------------------------------------

_REV_C = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"


@register(
    "runs_test_daily_revenue",
    oracle=f"""
    WITH daily0 AS (
      SELECT CAST(o_orderdate AS DATE) AS t,
             CAST(SUM({_REV_C}) AS BIGINT) AS x
      FROM orders GROUP BY 1),
    daily AS (SELECT t, x FROM daily0 WHERE x IS NOT NULL),
    h AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM daily GROUP BY 1),
    c AS (SELECT x, CAST(SUM(cnt) OVER (ORDER BY x) AS BIGINT) AS crank
          FROM h),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h),
    med AS (SELECT CAST(MIN(CASE WHEN crank >= (n + 1) // 2 THEN x END)
                        AS BIGINT) AS med
            FROM c CROSS JOIN tot),
    s AS (SELECT t, (x > med) AS pos, med FROM daily CROSS JOIN med),
    r AS (SELECT pos, med,
                 CASE WHEN LAG(pos) OVER (ORDER BY t) IS NULL
                        OR LAG(pos) OVER (ORDER BY t) <> pos
                      THEN 1 ELSE 0 END AS new_run
          FROM s),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS b,
                   CAST(MAX(med) AS BIGINT) AS median_val,
                   CAST(SUM(new_run) AS BIGINT) AS n_runs
            FROM r)
    SELECT n, a AS n_pos, b AS n_neg, median_val, n_runs,
           CAST(1000000 + {micro_ratio_sql('2 * a * b', 'n', '//')}
                AS BIGINT) AS expected_runs_micro,
           CASE WHEN n > 1 THEN {runs_var_micro_sql()}
           ELSE -1 END AS var_runs_micro
    FROM agg""",
)
def q_runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily-revenue series: lower
    median selected distributed (histogram + prefix sum), runs counted
    in one window pass over the calendar-bounded day series,
    expected/variance as exact integer micro ratios -- the
    nonparametric "is this KPI trending or random" check
    (`operators/experiments.py::runs_test`)."""
    from ..operators.experiments import runs_test

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.expr("CAST(o_orderdate AS DATE)").alias("t"))
        .agg(F.expr(f"CAST(SUM({_REV_C}) AS BIGINT)").alias("rev_c"))
    )
    return runs_test(daily, "t", "rev_c")


# --------------------------------------------------------------------------
# Binary ranking eval: precision/recall@r + MRR for the BM25 top-10
# --------------------------------------------------------------------------

_PRK_K = 10


def _prk_oracle() -> str:
    from .retrieval import _bm25_score_ctes, _ql_ctes

    return f"""
    WITH {_ql_ctes()},{_bm25_score_ctes()},
    rel AS MATERIALIZED (
      SELECT b.doc_id,
             CAST(LEAST(3, COALESCE(s.tft, 0) // 2) AS BIGINT) AS rel
      FROM base b
      LEFT JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tft
                 FROM q GROUP BY doc_id) s USING (doc_id)),
    rk AS (SELECT doc_id, rank FROM (
             SELECT doc_id,
                    CAST(ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id)
                         AS BIGINT) AS rank
             FROM bm) WHERE rank <= {_PRK_K}),
    nr AS (SELECT CAST(COALESCE(SUM(CASE WHEN rel >= 1 THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS n_rel_total FROM rel),
    hc AS (SELECT rk.rank, rk.doc_id,
                  CAST(CASE WHEN COALESCE(r.rel, 0) >= 1
                       THEN 1 ELSE 0 END AS BIGINT) AS rel_bin,
                  CAST(SUM(CASE WHEN COALESCE(r.rel, 0) >= 1
                           THEN 1 ELSE 0 END)
                       OVER (ORDER BY rk.rank ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) AS hits
           FROM rk LEFT JOIN rel r USING (doc_id)),
    fr AS (SELECT CAST(MIN(CASE WHEN rel_bin = 1 THEN rank END) AS BIGINT)
                  AS first_rel_rank FROM hc)
    SELECT rank, doc_id, rel_bin, hits,
           {micro_ratio_sql('hits', 'rank', '//')} AS prec_micro,
           CASE WHEN n_rel_total > 0
                THEN {micro_ratio_sql('hits', 'n_rel_total', '//')}
                ELSE -1 END AS recall_micro,
           CASE WHEN first_rel_rank IS NOT NULL
                THEN {micro_ratio_sql('1', 'first_rel_rank', '//')}
                ELSE 0 END AS rr_micro
    FROM hc CROSS JOIN nr CROSS JOIN fr
    ORDER BY rank"""


@register("mrr_precision_recall_eval", oracle=_prk_oracle())
def q_mrr_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ranking evaluation for the BM25 top-10: per-rank
    precision@r / recall@r plus the reciprocal rank, against the same
    deterministic relevance labels as ``ndcg_retrieval_eval`` (rel =
    min(3, query-term occurrences DIV 2); relevant iff rel >= 1) -- all
    integer counts with single half-up micro divisions
    (`operators/retrieval.py::rank_eval_table`)."""
    from ..operators.dedup import tokenize
    from ..operators.retrieval import rank_eval_table
    from ..operators.textstats import bm25_topk
    from .retrieval import _BM25_B, _BM25_K1, _BM25_TERMS, _docs, _rank_topn

    docs = _docs(spark, sf_dir)
    ranked = _rank_topn(
        bm25_topk(docs, "doc_id", "text", _BM25_TERMS,
                  k1=_BM25_K1, b=_BM25_B, topn=_PRK_K),
        _PRK_K,
    )
    tok = docs.select(
        F.col("doc_id"), F.explode(tokenize("text")).alias("term")
    ).filter(F.col("term").isin(_BM25_TERMS))
    tft = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tft")
    )
    rel = (
        docs.select("doc_id")
        .join(tft, "doc_id", "left")
        .select(
            "doc_id",
            F.least(
                F.lit(3).cast("long"),
                F.expr("CAST(COALESCE(tft, 0) DIV 2 AS BIGINT)"),
            ).cast("long").alias("rel"),
        )
    )
    return rank_eval_table(ranked, rel, "doc_id", _PRK_K)


# --------------------------------------------------------------------------
# Feature-hashing collision audit over the document vocabulary
# --------------------------------------------------------------------------

_FH_BUCKETS = 64


@register(
    "feature_hash_collision_audit",
    oracle=f"""
    WITH tok AS (SELECT {_TOK_SQL} AS term FROM documents),
    t AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM tok WHERE term <> '' GROUP BY 1),
    h AS (SELECT term, tf, {_HASH60_SQL} AS h FROM t),
    b AS (SELECT tf, CAST(h % {_FH_BUCKETS} AS BIGINT) AS bucket,
                 CASE WHEN (h // {_FH_BUCKETS}) % 2 = 0
                      THEN 1 ELSE -1 END AS sign
          FROM h)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(tf) AS BIGINT) AS n_postings,
           CAST(SUM(sign * tf) AS BIGINT) AS net_weight
    FROM b GROUP BY 1""",
)
def q_feature_hash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization audit: every vocabulary term mapped
    to one of 64 signed buckets via the portable 60-bit hash (bucket =
    h mod 64, sign from the next hash bit); per-bucket collision count,
    posting mass, and signed net weight -- the table that sizes a
    hashed feature space before training
    (`operators/trainprep.py::feature_hash_audit`)."""
    from ..operators.trainprep import feature_hash_audit

    return feature_hash_audit(
        _t(spark, sf_dir, "documents"), "text", _FH_BUCKETS
    )


# --------------------------------------------------------------------------
# PSI: the binned drift index (completes the KS / JSD / PSI drift triad)
# --------------------------------------------------------------------------

_PSI_BINS = 10


def _psi_oracle() -> str:
    edges = ",\n      ".join(
        f"MIN(CASE WHEN cum_a >= ({k} * n_a + {_PSI_BINS - 1}) // {_PSI_BINS}"
        f" THEN s END) AS e{k}"
        for k in range(1, _PSI_BINS)
    )
    bin_expr = " + ".join(
        f"(CASE WHEN s > e{k} THEN 1 ELSE 0 END)" for k in range(1, _PSI_BINS)
    )
    share_a = f"((2.0 * CAST(n_a_bin AS DOUBLE) + 1.0) / (2.0 * CAST(n_a AS DOUBLE) + {float(_PSI_BINS)}))"
    share_b = f"((2.0 * CAST(n_b_bin AS DOUBLE) + 1.0) / (2.0 * CAST(n_b AS DOUBLE) + {float(_PSI_BINS)}))"
    return f"""
    WITH src AS (
      SELECT o_totalprice AS s,
             CASE WHEN o_orderdate < {_KS_SPLIT} THEN 1 ELSE 0 END AS in_a
      FROM orders WHERE o_totalprice IS NOT NULL),
    h AS (SELECT s, CAST(SUM(in_a) AS BIGINT) AS cnt_a,
                 CAST(SUM(1 - in_a) AS BIGINT) AS cnt_b
          FROM src GROUP BY 1),
    c AS (SELECT s, CAST(SUM(cnt_a) OVER (ORDER BY s) AS BIGINT) AS cum_a
          FROM h),
    tot AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
                   CAST(SUM(cnt_b) AS BIGINT) AS n_b FROM h),
    edges AS (SELECT
      {edges}
      FROM c CROSS JOIN tot),
    binned AS (
      SELECT CAST(1 + {bin_expr} AS BIGINT) AS bin, cnt_a, cnt_b
      FROM h CROSS JOIN edges),
    agg AS (SELECT bin, CAST(SUM(cnt_a) AS BIGINT) AS n_a_bin,
                   CAST(SUM(cnt_b) AS BIGINT) AS n_b_bin
            FROM binned GROUP BY 1),
    bins AS (SELECT CAST(generate_series AS BIGINT) AS bin
             FROM generate_series(1, {_PSI_BINS})),
    filled AS (SELECT b.bin,
                    CAST(COALESCE(a.n_a_bin, 0) AS BIGINT) AS n_a_bin,
                    CAST(COALESCE(a.n_b_bin, 0) AS BIGINT) AS n_b_bin,
                    n_a, n_b
             FROM bins b LEFT JOIN agg a USING (bin) CROSS JOIN tot)
    SELECT bin, n_a_bin, n_b_bin,
           CAST(FLOOR(({share_a} - {share_b}) * ln({share_a} / {share_b})
                * 1000000000.0 + 0.5) AS BIGINT) AS psi_nano
    FROM filled ORDER BY bin"""


@register("psi_price_drift_deciles", oracle=_psi_oracle())
def q_psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of H2 order prices against H1's exact
    decile bins (edges selected distributed: histogram + prefix sum +
    one conditional-min aggregate for all 9 edges), add-half smoothed so
    empty bins stay defined, per-bin contributions nano-quantized -- the
    binned drift index completing the KS / JSD / PSI triad
    (`operators/experiments.py::psi_two_sample`)."""
    from ..operators.experiments import psi_two_sample

    orders = _t(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.expr(f"o_orderdate < {_KS_SPLIT}").alias("in_a"),
    )
    return psi_two_sample(orders, "o_totalprice", "in_a", n_bins=_PSI_BINS)


# --------------------------------------------------------------------------
# Reliability / Brier table: is a rank-based score calibrated?
# --------------------------------------------------------------------------

_CAL_BINS = 10


def _cal_oracle() -> str:
    pred = f"((2 * bin - 1) * 1000000 // (2 * {_CAL_BINS}))"
    return f"""
    WITH src AS (
      SELECT value AS s, event_id AS o,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL),
    t AS (SELECT CAST(NTILE({_CAL_BINS}) OVER (ORDER BY s, o) AS BIGINT)
                 AS bin, y
          FROM src),
    agg AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_events
            FROM t GROUP BY 1)
    SELECT bin, n, n_events,
           CAST({pred} AS BIGINT) AS pred_micro,
           {micro_ratio_sql('n_events', 'n', '//')} AS event_rate_micro,
           CAST(n * {pred} * {pred}
                - 2 * {pred} * n_events * 1000000
                + n_events * CAST(1000000000000 AS BIGINT)
                AS BIGINT) AS brier_e12
    FROM agg ORDER BY bin"""


@register("calibration_value_deciles", oracle=_cal_oracle())
def q_calibration_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram table: events split into 10 equal-population
    value-score bins via the distributed global NTILE (total order
    (value, event_id) -- no single-task sort), predicted probability =
    the bin's rank midpoint, observed purchase rate and exact integer
    Brier contribution per bin
    (`operators/experiments.py::reliability_bins`)."""
    from ..operators.experiments import reliability_bins

    ev = _t(spark, sf_dir, "events").select(
        "value",
        "event_id",
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    return reliability_bins(
        ev, "value", "event_id", "is_purchase", n_bins=_CAL_BINS
    )
