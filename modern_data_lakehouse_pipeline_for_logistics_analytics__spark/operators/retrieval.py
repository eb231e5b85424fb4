"""Retrieval-model operators beyond BM25: query-likelihood language
models, rank fusion, and ranking evaluation (nDCG) -- the pieces a
training-data / RAG pipeline needs to SELECT documents (two independent
retrieval models fused), and to MEASURE how good a ranking is against
graded relevance labels.

Reference scope: the reference repo ranks/filters shipment records with
plain ORDER BY + LIMIT (e.g. ``reference/Gold_layer`` aggregates); these
operators generalize that "pick the best rows for a purpose" capability
to the document-retrieval shapes an LLM-data pipeline runs at corpus
scale.  Everything follows the repo-wide cross-engine discipline: float
CONSTANTS inlined via ``repr`` (shortest round-trip -> both engines
parse the identical double), every per-term / per-rank float
contribution rounded half-up to a fixed-point BIGINT BEFORE any sum, so
addition order can never flip a ranking or a reported metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NANO = 1_000_000_000
MICRO = 1_000_000


def ql_dirichlet_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    mu: float = 2000.0,
    topn: int = 20,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty) -- the second classic lexical retrieval model next to
    BM25, scoring a document by the log-probability its smoothed
    unigram LM assigns the query:

        score(d) = sum_t ln( (tf_{t,d} + mu * p_c(t)) / (dl_d + mu) )

    with ``p_c(t) = c_t / L`` the corpus unigram distribution.  The sum
    runs over ALL query terms (a zero-tf term still contributes its
    smoothed mass), decomposed so only HIT rows are materialized:

        score(d) = sum_{t: tf>0} [ln(tf + mu*p_t) - ln(mu*p_t)]   (hits)
                 + sum_t ln(mu*p_t)                               (C, global)
                 - |Q| * ln(dl_d + mu)                            (per doc)

    Query terms absent from the corpus have p_t = 0 (ln undefined) and
    are DROPPED from scoring -- |Q| counts surviving terms only, and the
    dropped terms are reported in no row (callers pick corpus terms).

    Determinism: each of the three parts is rounded half-up to NANO
    units as BIGINT before summation (hit terms per (doc, term), C per
    term, the doc part per doc), so ``score_fp`` is an exact integer in
    both engines.  ``ln(tf + mu*p_t) - ln(mu*p_t)`` is computed as the
    single ``ln((tf*L + mu*c_t) / (mu*c_t))`` so neither engine ever
    forms the tiny intermediate ``p_t``.

    Scale shape (mirrors ``textstats.bm25_topk``): the explode filters
    to the query vocabulary immediately; corpus term counts c_t come
    from those same surviving rows (one tiny <= |Q|-row broadcast);
    N/L are one broadcast scalar row; the zero-hit doc part rides the
    base (id, dl) projection -- no unfiltered token row survives past
    the first aggregate; final top-n is TakeOrderedAndProject.

    Output: ``id, dl, n_hit_terms, score_fp`` (nano units), score desc,
    id asc, top ``topn``.
    """
    from .dedup import _cache_aged, tokenize

    if not query_terms:
        raise ValueError("ql_dirichlet_topk needs at least one query term")
    if mu <= 0:
        # mu = 0 diverges SILENTLY between engines: Spark ln(0) is NULL,
        # DuckDB raises -- fail loudly instead (r10 review finding).
        raise ValueError(f"ql_dirichlet_topk needs mu > 0, got {mu}")
    mu_r = repr(float(mu))

    base = df.select(
        F.col(id_col),
        F.size(tokenize(text_col)).cast("long").alias("__dl"),
        tokenize(text_col).alias("__toks"),
    )
    # Three consumers read base (the __L aggregate, the query-term
    # explode, and the zero-hit doc projection) -- cache it or the
    # corpus is read and tokenized three times per run (r10 review
    # finding, same shape as the kl_source_drift fix).
    base = _cache_aged("ql_base", base)
    stats = base.agg(F.sum("__dl").cast("long").alias("__L"))
    tok = base.select(F.col(id_col), F.explode("__toks").alias("term")).filter(
        F.col("term").isin(query_terms)
    )
    # corpus counts of the query terms (<= |Q| rows -> broadcast)
    ct = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c_t"))
    # C = sum_t ln(mu * c_t / L), nano-rounded per term then summed;
    # n_q = number of query terms that survive (c_t > 0).
    const = (
        ct.crossJoin(F.broadcast(stats))
        .select(
            F.expr(
                f"CAST(FLOOR(ln(CAST({mu_r} AS DOUBLE) * CAST(c_t AS DOUBLE)"
                f" / CAST(__L AS DOUBLE)) * 1000000000.0D + 0.5D) AS BIGINT)"
            ).alias("__c_term")
        )
        .agg(
            F.sum("__c_term").cast("long").alias("__C"),
            F.count(F.lit(1)).cast("long").alias("__n_q"),
        )
    )
    tf = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    hits = (
        tf.join(F.broadcast(ct), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.expr(
                f"CAST(FLOOR(ln((CAST(tf AS DOUBLE) * CAST(__L AS DOUBLE)"
                f" + CAST({mu_r} AS DOUBLE) * CAST(c_t AS DOUBLE))"
                f" / (CAST({mu_r} AS DOUBLE) * CAST(c_t AS DOUBLE)))"
                f" * 1000000000.0D + 0.5D) AS BIGINT)"
            ).alias("__h_term"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__h_term").cast("long").alias("__hit_fp"),
            F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        )
    )
    return (
        base.select(id_col, "__dl")
        .join(hits, id_col, "left")
        .crossJoin(F.broadcast(const))
        .select(
            F.col(id_col),
            F.col("__dl").alias("dl"),
            F.coalesce(F.col("n_hit_terms"), F.lit(0)).cast("long").alias(
                "n_hit_terms"
            ),
            (
                F.coalesce(F.col("__hit_fp"), F.lit(0))
                + F.coalesce(F.col("__C"), F.lit(0))
                - F.expr(
                    f"CAST(FLOOR(CAST(__n_q AS DOUBLE)"
                    f" * ln(CAST(__dl AS DOUBLE) + CAST({mu_r} AS DOUBLE))"
                    f" * 1000000000.0D + 0.5D) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("score_fp"),
        )
        .orderBy(F.desc("score_fp"), F.asc(id_col))
        .limit(topn)
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    k: int = 60,
    topn: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of two ranked lists:
    ``rrf(d) = sum_i 1/(k + rank_i(d))`` over the lists that contain
    ``d`` -- the standard way a hybrid retrieval stack (lexical +
    semantic, or two lexical models) combines rankings WITHOUT
    comparable scores.

    Inputs carry ``(id_col, rank)`` with rank 1-based within each list;
    a document missing from one list contributes 0 from it.  Exact
    integer arithmetic: each contribution is the half-up rounding of
    ``1e6/(k+rank)`` computed as ``(2*1e6 + (k+rank)) DIV (2*(k+rank))``
    -- no floats anywhere, so fused scores are bit-identical across
    engines by construction.

    Scale shape: the two inputs are top-n lists (bounded rows); the
    fusion is one full-outer join on id + one TakeOrdered.  Output:
    ``id, rank_a, rank_b, rrf_fp`` (micro units), fused score desc, id
    asc, top ``topn``.
    """
    if k < 1:
        raise ValueError("rrf_fuse needs k >= 1")
    a = ranked_a.select(
        F.col(id_col),
        F.col("rank").cast("long").alias("rank_a"),
        F.expr(
            f"CAST((CAST({2 * MICRO} AS BIGINT) + CAST({k} AS BIGINT) + CAST(rank AS BIGINT))"
            f" DIV (CAST(2 AS BIGINT) * (CAST({k} AS BIGINT) + CAST(rank AS BIGINT))) AS BIGINT)"
        ).alias("__ca"),
    )
    b = ranked_b.select(
        F.col(id_col),
        F.col("rank").cast("long").alias("rank_b"),
        F.expr(
            f"CAST((CAST({2 * MICRO} AS BIGINT) + CAST({k} AS BIGINT) + CAST(rank AS BIGINT))"
            f" DIV (CAST(2 AS BIGINT) * (CAST({k} AS BIGINT) + CAST(rank AS BIGINT))) AS BIGINT)"
        ).alias("__cb"),
    )
    return (
        a.join(b, id_col, "full_outer")
        .select(
            F.col(id_col),
            F.col("rank_a"),
            F.col("rank_b"),
            (
                F.coalesce(F.col("__ca"), F.lit(0))
                + F.coalesce(F.col("__cb"), F.lit(0))
            )
            .cast("long")
            .alias("rrf_fp"),
        )
        .orderBy(F.desc("rrf_fp"), F.asc(id_col))
        .limit(topn)
    )


def ndcg_table(
    ranked: DataFrame,
    relevance: DataFrame,
    id_col: str,
    k: int,
) -> DataFrame:
    """Ranking evaluation: the per-rank nDCG@r table for a top-``k``
    ranking against graded relevance labels --

        gain(d, r)  = (2^rel(d) - 1) / log2(r + 1)
        DCG@r       = sum_{r' <= r} gain
        IDCG@r      = same sum over the IDEAL ordering (rel desc)
        nDCG@r      = DCG@r / IDCG@r

    ``ranked`` carries ``(id_col, rank)`` (1-based, <= k rows);
    ``relevance`` carries ``(id_col, rel)`` for the WHOLE corpus -- the
    ideal ordering must see documents the ranking missed.  A ranked doc
    absent from ``relevance`` counts rel = 0.

    Determinism: ``rel`` is a small integer (2^rel exact in a double);
    each positional gain is rounded half-up to NANO units as BIGINT
    before the cumulative window sums, and nDCG is pure BIGINT
    arithmetic ``(2*dcg*1e6 + idcg) DIV (2*idcg)`` (half-up micro
    units).  Ideal-ordering ties break on id ascending, so both engines
    build the identical ideal list.

    Scale shape: the ranking is bounded (k rows); the only corpus-scale
    step is the ideal top-k, a TakeOrderedAndProject over the relevance
    frame (no global sort).  Output one row per rank 1..k: ``rank,
    id, rel, gain_nano, dcg_nano, idcg_nano, ndcg_micro``.
    """
    if k < 1:
        raise ValueError("ndcg_table needs k >= 1")

    def gain(rel_col: str, rank_col: str) -> F.Column:
        return F.expr(
            f"CAST(FLOOR((pow(CAST(2.0 AS DOUBLE), CAST({rel_col} AS DOUBLE))"
            f" - CAST(1.0 AS DOUBLE))"
            f" / (ln(CAST({rank_col} AS DOUBLE) + CAST(1.0 AS DOUBLE))"
            f"    / ln(CAST(2.0 AS DOUBLE)))"
            f" * 1000000000.0D + 0.5D) AS BIGINT)"
        )

    cum = (
        Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    )
    actual = (
        ranked.filter(F.col("rank") <= k)
        .join(relevance.select(F.col(id_col), F.col("rel")), id_col, "left")
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col(id_col),
            F.coalesce(F.col("rel"), F.lit(0)).cast("long").alias("rel"),
        )
        .withColumn("gain_nano", gain("rel", "rank"))
        .withColumn("dcg_nano", F.sum("gain_nano").over(cum).cast("long"))
    )
    ideal = (
        relevance.select(F.col(id_col), F.col("rel").cast("long").alias("rel"))
        .orderBy(F.desc("rel"), F.asc(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("rel"), F.asc(id_col)))
            .cast("long"),
        )
        .withColumn("__ig", gain("rel", "rank"))
        .select(
            "rank", F.sum("__ig").over(cum).cast("long").alias("idcg_nano")
        )
    )
    return (
        # LEFT join + running-max carry-forward: when the corpus has
        # fewer than k relevance rows the ideal list is short, but
        # IDCG@r saturates (gains >= 0 -> cumulative sum is monotone),
        # so MAX over ranks <= r extends it to every actual rank.
        actual.join(ideal, "rank", "left")
        .withColumn(
            "idcg_nano", F.max("idcg_nano").over(cum).cast("long")
        )
        .select(
            "rank",
            id_col,
            "rel",
            "gain_nano",
            "dcg_nano",
            "idcg_nano",
            F.when(F.col("idcg_nano") > 0,
                   (F.lit(2).cast("long") * F.col("dcg_nano") * F.lit(MICRO)
                    + F.col("idcg_nano"))
                   .cast("long"))
            .otherwise(F.lit(None))
            .alias("__num"),
        )
        .select(
            "rank",
            id_col,
            "rel",
            "gain_nano",
            "dcg_nano",
            "idcg_nano",
            F.expr(
                "CAST(__num DIV (CAST(2 AS BIGINT) * idcg_nano) AS BIGINT)"
            ).alias("ndcg_micro"),
        )
        .orderBy("rank")
    )


def rank_eval_table(
    ranked: DataFrame, relevance: DataFrame, id_col: str, k: int
) -> DataFrame:
    """Binary ranking evaluation: the per-rank precision@r / recall@r
    table plus the reciprocal rank for a top-``k`` ranking -- the set of
    numbers nDCG does not give (nDCG grades positional gain; P/R/RR
    grade set retrieval and first-hit latency).  A document is RELEVANT
    iff its graded ``rel`` >= 1; ranked docs absent from ``relevance``
    count rel = 0, and recall's denominator is the relevant count over
    the WHOLE relevance frame (the ranking is judged against everything
    it could have retrieved, not just what it did).

    CONTRACT (r13 advisor note): ``relevance`` must be UNIQUE per
    ``id_col`` -- the same contract as ``ndcg_table``.  The top-k join
    is a plain left join, so duplicate relevance rows would fan out the
    k ranked rows and silently inflate hits/precision/recall (and
    desync from any SQL oracle).  Callers with multi-row judgments must
    pre-aggregate, e.g. ``relevance.groupBy(id_col).agg(F.max("rel")
    .alias("rel"))``; this operator does not do it defensively because
    the extra corpus-scale shuffle would be charged to every caller
    that already satisfies the contract.

    EXACT: hits@r is an integer cumulative count; precision, recall and
    RR are single half-up micro divisions (``micro_ratio_sql``) of
    integers -- no floats anywhere.

    Scale shape: the ranking is bounded (k rows; the cumulative windows
    AND the first-relevant-rank run over those k only -- the latter as
    one more window over the same k-row frame, NOT a separate aggregate
    consumer, which would re-execute the ranked-join subtree per
    consumer (r12 review finding: the relevance frame is often a full
    corpus token explode); the corpus-scale work is one aggregate over
    the relevance frame (total relevant) broadcast as a scalar.

    Output one row per rank 1..k: ``rank, <id_col>, rel_bin, hits,
    prec_micro, recall_micro, rr_micro`` (``rr_micro`` is the constant
    1e6/first-relevant-rank; 0 when the top-k has no relevant doc;
    ``recall_micro`` is -1 when the corpus has no relevant docs at all).
    """
    from .experiments import micro_ratio_sql

    if k < 1:
        raise ValueError("rank_eval_table needs k >= 1")
    cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    n_rel = relevance.agg(
        F.coalesce(
            F.sum(F.when(F.col("rel") >= 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_rel_total")
    )
    whole = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    hits = (
        ranked.filter(F.col("rank") <= k)
        .join(relevance.select(F.col(id_col), F.col("rel")), id_col, "left")
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col(id_col),
            F.when(F.coalesce(F.col("rel"), F.lit(0)) >= 1, 1)
            .otherwise(0)
            .cast("long")
            .alias("rel_bin"),
        )
        .withColumn("hits", F.sum("rel_bin").over(cum).cast("long"))
        .withColumn(
            "first_rel_rank",
            F.min(F.when(F.col("rel_bin") == 1, F.col("rank")))
            .over(whole)
            .cast("long"),
        )
        .crossJoin(F.broadcast(n_rel))
    )
    return (
        hits.select(
            "rank",
            id_col,
            "rel_bin",
            "hits",
            F.expr(micro_ratio_sql("hits", "rank", "div"))
            .cast("long")
            .alias("prec_micro"),
            F.when(
                F.col("n_rel_total") > 0,
                F.expr(micro_ratio_sql("hits", "n_rel_total", "div")),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("recall_micro"),
            F.when(
                F.col("first_rel_rank").isNotNull(),
                F.expr(micro_ratio_sql("1", "first_rel_rank", "div")),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_micro"),
        )
        .orderBy("rank")
    )
