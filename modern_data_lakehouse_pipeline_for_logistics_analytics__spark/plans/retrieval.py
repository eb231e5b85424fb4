"""Retrieval-model queries over the ``documents`` fixture: Dirichlet
query-likelihood ranking, reciprocal-rank fusion of two lexical models,
and nDCG ranking evaluation.

All three share one query (the BM25 term set), so the family reads as a
single retrieval stack: two independent scorers -> fused ranking ->
quality metric.  Every float constant is inlined via ``repr`` and every
float contribution is fixed-point-rounded before summation (see
``operators/retrieval.py``), so DuckDB replays each ranking and metric
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, table_path
from .textstats import _BM25_B, _BM25_K1, _BM25_TERMS

_QL_MU = 2000.0
_RRF_K = 60
_RRF_POOL = 50  # depth of each input ranking
_NDCG_K = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


def _terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in _BM25_TERMS)


def _ql_ctes() -> str:
    """Shared DuckDB CTE prefix: corpus stats + query-term hits + the
    Dirichlet QL score per document (nano fixed point), mirroring
    ``operators/retrieval.py::ql_dirichlet_topk`` expression-for-
    expression."""
    mu = repr(_QL_MU)
    return f"""
    base AS MATERIALIZED (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS dl,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents),
    st AS (SELECT CAST(SUM(dl) AS BIGINT) AS big_l FROM base),
    tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM base),
    q AS MATERIALIZED (SELECT * FROM tok WHERE term IN ({_terms_sql()})),
    ct AS MATERIALIZED (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c_t FROM q GROUP BY term),
    konst AS (
      SELECT CAST(SUM(CAST(FLOOR(
               ln(CAST({mu} AS DOUBLE) * CAST(c_t AS DOUBLE)
                  / CAST(big_l AS DOUBLE))
               * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS c_fp,
             CAST(COUNT(*) AS BIGINT) AS n_q
      FROM ct CROSS JOIN st),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM q GROUP BY doc_id, term),
    hits AS (
      SELECT doc_id,
             CAST(SUM(CAST(FLOOR(
               ln((CAST(tf AS DOUBLE) * CAST(big_l AS DOUBLE)
                   + CAST({mu} AS DOUBLE) * CAST(c_t AS DOUBLE))
                  / (CAST({mu} AS DOUBLE) * CAST(c_t AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hit_fp,
             CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM tf JOIN ct USING (term) CROSS JOIN st
      GROUP BY doc_id),
    ql AS MATERIALIZED (
      SELECT b.doc_id, b.dl,
             CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit_terms,
             CAST(COALESCE(h.hit_fp, 0) + COALESCE(k.c_fp, 0)
                  - CAST(FLOOR(CAST(k.n_q AS DOUBLE)
                               * ln(CAST(b.dl AS DOUBLE)
                                    + CAST({mu} AS DOUBLE))
                               * 1000000000.0 + 0.5) AS BIGINT)
                  AS BIGINT) AS score_fp
      FROM base b LEFT JOIN hits h USING (doc_id) CROSS JOIN konst k)"""


def _bm25_score_ctes() -> str:
    """BM25 per-document scores (micro fixed point) as a CTE block --
    the same arithmetic as ``plans/textstats.py::_bm25_oracle`` minus
    the final LIMIT, reusing ``base`` from ``_ql_ctes``."""
    kp1 = repr(_BM25_K1 + 1.0)
    kb = repr(_BM25_K1 * _BM25_B)
    k1mb = repr(_BM25_K1 * (1.0 - _BM25_B))
    return f"""
    bstats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(dl) AS BIGINT) AS total_len FROM base),
    btf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM q GROUP BY doc_id, dl, term),
    btfd AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df_t
             FROM btf),
    bsc AS (
      SELECT doc_id,
             CAST(FLOOR(
               ln(CAST(1.0 AS DOUBLE)
                  + (CAST(n_docs - df_t AS DOUBLE) + 0.5)
                    / (CAST(df_t AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * CAST({kp1} AS DOUBLE))
               / (CAST(tf AS DOUBLE) + CAST({k1mb} AS DOUBLE)
                  + CAST({kb} AS DOUBLE) * CAST(dl AS DOUBLE)
                    / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))
               * CAST(1000000.0 AS DOUBLE) + 0.5) AS BIGINT) AS term_fp
      FROM btfd CROSS JOIN bstats),
    bm AS MATERIALIZED (
      SELECT doc_id, CAST(SUM(term_fp) AS BIGINT) AS score_fp
      FROM bsc GROUP BY doc_id)"""


def _rank_topn(df: DataFrame, n: int) -> DataFrame:
    """1-based rank over (score_fp desc, doc_id asc), bounded to the
    top ``n`` -- the limit comes first so the single-partition
    row_number window only ever sees n rows."""
    w = Window.orderBy(F.desc("score_fp"), F.asc("doc_id"))
    return (
        df.orderBy(F.desc("score_fp"), F.asc("doc_id"))
        .limit(n)
        .select("doc_id", F.row_number().over(w).cast("long").alias("rank"))
    )


@register(
    "ql_dirichlet_search",
    oracle=f"""
    WITH {_ql_ctes()}
    SELECT doc_id, dl, n_hit_terms, score_fp
    FROM ql
    ORDER BY score_fp DESC, doc_id LIMIT 20
    """,
)
def q_ql_dirichlet_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet query-likelihood retrieval ('scan join merge',
    mu=2000): the second classic lexical model next to BM25 -- smoothed
    unigram-LM log-probability per document, decomposed so only hit
    rows materialize, nano fixed-point BIGINT scores
    (`operators/retrieval.py::ql_dirichlet_topk`)."""
    from ..operators.retrieval import ql_dirichlet_topk

    return ql_dirichlet_topk(
        _docs(spark, sf_dir), "doc_id", "text", _BM25_TERMS,
        mu=_QL_MU, topn=20,
    )


@register(
    "rrf_fuse_bm25_ql",
    oracle=f"""
    WITH {_ql_ctes()},{_bm25_score_ctes()},
    ra AS (SELECT doc_id, rank FROM (
             SELECT doc_id,
                    CAST(ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id)
                         AS BIGINT) AS rank
             FROM bm) WHERE rank <= {_RRF_POOL}),
    rb AS (SELECT doc_id, rank FROM (
             SELECT doc_id,
                    CAST(ROW_NUMBER() OVER (ORDER BY score_fp DESC, doc_id)
                         AS BIGINT) AS rank
             FROM ql) WHERE rank <= {_RRF_POOL})
    SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
           ra.rank AS rank_a, rb.rank AS rank_b,
           CAST(COALESCE((2000000 + {_RRF_K} + ra.rank)
                         // (2 * ({_RRF_K} + ra.rank)), 0)
                + COALESCE((2000000 + {_RRF_K} + rb.rank)
                           // (2 * ({_RRF_K} + rb.rank)), 0) AS BIGINT)
             AS rrf_fp
    FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    ORDER BY rrf_fp DESC, doc_id LIMIT 20
    """,
)
def q_rrf_fuse_bm25_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval rank fusion: BM25 and Dirichlet-QL each rank
    the corpus for the same query; reciprocal-rank fusion (k=60)
    combines the two top-50 lists with pure-integer contributions --
    the standard hybrid-stack combiner when scores aren't comparable
    (`operators/retrieval.py::rrf_fuse`)."""
    from ..operators.retrieval import rrf_fuse
    from ..operators.textstats import bm25_topk
    from ..operators.retrieval import ql_dirichlet_topk

    docs = _docs(spark, sf_dir)
    a = _rank_topn(
        bm25_topk(docs, "doc_id", "text", _BM25_TERMS,
                  k1=_BM25_K1, b=_BM25_B, topn=_RRF_POOL),
        _RRF_POOL,
    )
    b = _rank_topn(
        ql_dirichlet_topk(docs, "doc_id", "text", _BM25_TERMS,
                          mu=_QL_MU, topn=_RRF_POOL),
        _RRF_POOL,
    )
    return rrf_fuse(a, b, "doc_id", k=_RRF_K, topn=20)


@register(
    "ndcg_retrieval_eval",
    oracle=f"""
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
             FROM bm) WHERE rank <= {_NDCG_K}),
    act AS (
      SELECT rk.rank, rk.doc_id, r.rel,
             CAST(FLOOR((pow(CAST(2.0 AS DOUBLE), CAST(r.rel AS DOUBLE))
                         - CAST(1.0 AS DOUBLE))
                        / (ln(CAST(rk.rank AS DOUBLE) + CAST(1.0 AS DOUBLE))
                           / ln(CAST(2.0 AS DOUBLE)))
                        * 1000000000.0 + 0.5) AS BIGINT) AS gain_nano
      FROM rk JOIN rel r USING (doc_id)),
    actc AS (SELECT *, CAST(SUM(gain_nano) OVER (ORDER BY rank
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS dcg_nano FROM act),
    idl AS (SELECT rank, rel FROM (
              SELECT CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id)
                          AS BIGINT) AS rank, rel
              FROM rel) WHERE rank <= {_NDCG_K}),
    idlg AS (
      SELECT rank,
             CAST(FLOOR((pow(CAST(2.0 AS DOUBLE), CAST(rel AS DOUBLE))
                         - CAST(1.0 AS DOUBLE))
                        / (ln(CAST(rank AS DOUBLE) + CAST(1.0 AS DOUBLE))
                           / ln(CAST(2.0 AS DOUBLE)))
                        * 1000000000.0 + 0.5) AS BIGINT) AS ig
      FROM idl),
    idlc AS (SELECT rank, CAST(SUM(ig) OVER (ORDER BY rank
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS idcg_nano FROM idlg),
    jn AS (
      SELECT a.rank, a.doc_id, a.rel, a.gain_nano, a.dcg_nano,
             CAST(MAX(i.idcg_nano) OVER (ORDER BY a.rank
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS idcg_nano
      FROM actc a LEFT JOIN idlc i USING (rank))
    SELECT rank, doc_id, rel, gain_nano, dcg_nano, idcg_nano,
           CASE WHEN idcg_nano > 0
                THEN CAST((2 * dcg_nano * 1000000 + idcg_nano)
                          // (2 * idcg_nano) AS BIGINT)
                ELSE NULL END AS ndcg_micro
    FROM jn
    ORDER BY rank
    """,
)
def q_ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking evaluation: nDCG@10 table for the BM25 top-10 against
    graded relevance labels derived deterministically from the corpus
    (rel = min(3, query-term occurrences DIV 2)) -- positional gains in
    nano fixed point, ideal ordering tie-broken on doc_id, per-rank
    nDCG in exact BIGINT arithmetic
    (`operators/retrieval.py::ndcg_table`)."""
    from ..operators.retrieval import ndcg_table
    from ..operators.textstats import bm25_topk

    docs = _docs(spark, sf_dir)
    ranked = _rank_topn(
        bm25_topk(docs, "doc_id", "text", _BM25_TERMS,
                  k1=_BM25_K1, b=_BM25_B, topn=_NDCG_K),
        _NDCG_K,
    )
    from ..operators.dedup import tokenize

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
    return ndcg_table(ranked, rel, "doc_id", _NDCG_K)
