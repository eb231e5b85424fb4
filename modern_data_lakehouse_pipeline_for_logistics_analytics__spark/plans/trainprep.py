"""Training-corpus preparation plans over the ``documents`` fixture
(north-star extension): benchmark decontamination, Gopher-style quality
gates, C4-style span dedup, fixed-size chunking.

Every query has an exact DuckDB oracle: all arithmetic is integer counts
or 4dp half-up ratios, all hashes are the shared 60-bit portable md5
family, and boolean gates are cast to BIGINT 0/1 on both sides (the
driver canonicalizer compares numbers, not engine bool types).

The deterministic benchmark split (``doc_id % 23 = 0`` as the eval set)
stands in for a real benchmark table; the fixture's planted near-dup
families guarantee nonzero contamination hits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.trainprep import (
    chunk_documents,
    decontaminate_ngrams,
    pack_sequences,
    quality_gates,
    span_dedup,
    token_budget_sample,
)
from .registry import register, table_path

#: Shared SQL prelude: whitespace tokens per doc.
_TOK = """
    tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents)
"""



#: Shared quality-gate SQL pieces (r13 review: these constants appeared
#: verbatim in both the train_quality_gates oracle and the funnel oracle;
#: one source of truth so a threshold tune cannot silently desync them).
_GATE_PASSES_SQL = (
    "n_tokens BETWEEN 40 AND 100000 AND mean_tok_len BETWEEN 2.0 AND 12.0 "
    "AND symbol_ratio <= 0.1 AND n_stop_hits >= 1"
)

#: feats CTE body over a `tok` CTE (doc_id, ts) joined back to documents.
_QUALITY_FEATS_CTE = """feats AS (
      SELECT t.doc_id,
             CAST(len(ts) AS BIGINT) AS n_tokens,
             CAST(FLOOR(((length(d.text) - (len(ts) - 1)) / CAST(len(ts) AS DOUBLE))
                        * 10000 + 0.5) AS BIGINT) / CAST(10000.0 AS DOUBLE)
               AS mean_tok_len,
             CASE WHEN length(d.text) > 0 THEN
               CAST(FLOOR(((length(d.text)
                            - length(regexp_replace(d.text, '[^\\w\\s]', '', 'g')))
                           / CAST(length(d.text) AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
                 / CAST(10000.0 AS DOUBLE)
             ELSE CAST(0.0 AS DOUBLE) END AS symbol_ratio,
             CAST(len(list_intersect(list_distinct(ts),
                  ['the', 'a', 'of', 'to', 'and', 'in', 'is'])) AS BIGINT)
               AS n_stop_hits
      FROM tok t JOIN documents d ON d.doc_id = t.doc_id)"""


def _csh_cte(extra_where: str = "") -> str:
    """Corpus word-5-gram CTE over a `tok` CTE; `extra_where` restricts
    tok rows when tok spans the full table (the standalone
    decontamination oracle), and is empty when tok is already
    corpus-limited (the funnel oracle)."""
    return f"""csh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(ts[i:i+4], ' ')
                                   for i in range(1, len(ts) - 3)])) AS s
      FROM tok WHERE {extra_where}len(ts) >= 5)"""


#: Benchmark-side 5-gram hash set, built from documents directly so it is
#: independent of how the surrounding query scoped its `tok` CTE.
_BSH_CTE = """bsh AS (
      SELECT DISTINCT
             CAST('0x' || substring(md5(unnest(list_distinct(
               [array_to_string(bts[i:i+4], ' ') for i in range(1, len(bts) - 3)]
             ))), 2, 15) AS BIGINT) AS h
      FROM (SELECT string_split_regex(lower(trim(text)), '\\s+') AS bts
            FROM documents WHERE doc_id % 23 = 0)
      WHERE len(bts) >= 5)"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


@register(
    "train_decontaminate_ngrams",
    oracle=f"""
    WITH {_TOK},
    {_csh_cte("doc_id % 23 <> 0 AND ")},
    {_BSH_CTE},
    hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM (SELECT doc_id,
                   CAST('0x' || substring(md5(s), 2, 15) AS BIGINT) AS h
            FROM csh)
      WHERE h IN (SELECT h FROM bsh)
      GROUP BY 1)
    SELECT d.doc_id,
           CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(CASE WHEN COALESCE(h.n_overlap, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.doc_id % 23 <> 0
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus (doc_id % 23 <> 0) vs eval set
    (doc_id % 23 = 0), distinct word 5-gram overlap via broadcast of the
    benchmark's portable-hash set.  The training-data hygiene gate: at
    100 TB the benchmark side stays tiny and broadcastable, the corpus
    pass shuffles 8-byte hashes once for the per-doc count."""
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 23 != 0)
    benchmark = docs.filter(F.col("doc_id") % 23 == 0)
    out = decontaminate_ngrams(corpus, benchmark, "doc_id", "text", n=5)
    return out.select(
        "doc_id", "n_overlap", F.col("contaminated").cast("long").alias("contaminated")
    )


@register(
    "train_quality_gates",
    oracle=f"""
    WITH {_TOK},
    {_QUALITY_FEATS_CTE}
    SELECT doc_id, n_tokens, mean_tok_len, symbol_ratio, n_stop_hits,
           CAST(CASE WHEN n_tokens BETWEEN 40 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS gate_len,
           CAST(CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END AS BIGINT) AS gate_tok_len,
           CAST(CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS gate_symbols,
           CAST(CASE WHEN n_stop_hits >= 1 THEN 1 ELSE 0 END AS BIGINT) AS gate_stops,
           CAST(CASE WHEN {_GATE_PASSES_SQL} THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM feats
    """,
)
def q_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gates, one boolean column per gate (cast to
    0/1 for the cross-engine hash) -- narrow, zero shuffles, pipelines
    into the scan."""
    out = quality_gates(_docs(spark, sf_dir), "doc_id", "text")
    return out.select(
        "doc_id",
        "n_tokens",
        "mean_tok_len",
        "symbol_ratio",
        "n_stop_hits",
        *[
            F.col(c).cast("long").alias(c)
            for c in ("gate_len", "gate_tok_len", "gate_symbols", "gate_stops", "passes")
        ],
    )


@register(
    "train_span_dedup",
    oracle=f"""
    WITH {_TOK},
    sp AS (
      SELECT doc_id,
             generate_subscripts(spans, 1) - 1 AS span_no,
             unnest(spans) AS span_text
      FROM (SELECT doc_id,
                   [array_to_string(ts[(i-1)*10+1:i*10], ' ')
                    for i in range(1, CAST(CEIL(len(ts) / 10.0) AS BIGINT) + 1)]
                     AS spans
            FROM tok)),
    ranked AS (
      SELECT doc_id, span_no, span_text,
             ROW_NUMBER() OVER (
               PARTITION BY CAST('0x' || substring(md5(span_text), 2, 15) AS BIGINT)
               ORDER BY doc_id, span_no) AS rn
      FROM sp),
    kept AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(span_text, ' ' ORDER BY span_no) AS kept_text
      FROM ranked WHERE rn = 1 GROUP BY 1)
    SELECT t.doc_id,
           CAST(CEIL(len(ts) / 10.0) AS BIGINT) AS n_spans,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(k.kept_text, '') AS kept_text
    FROM tok t LEFT JOIN kept k ON k.doc_id = t.doc_id
    """,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide span dedup (10-token spans, first occurrence
    survives): the shuffle carries span hashes, survivors reassemble per
    doc in position order.  The fixture's planted near-dup families lose
    their repeated spans here."""
    return span_dedup(_docs(spark, sf_dir), "doc_id", "text", span=10)


@register(
    "train_chunk_documents",
    oracle=f"""
    WITH {_TOK}
    SELECT doc_id,
           generate_subscripts(chunks, 1) - 1 AS chunk_no,
           CAST(len(unnest(chunks)) AS BIGINT) AS n_tokens,
           array_to_string(unnest(chunks), ' ') AS chunk_text
    FROM (SELECT doc_id,
                 [ts[(i-1)*16+1:i*16]
                  for i in range(1, CAST(CEIL(len(ts) / 16.0) AS BIGINT) + 1)]
                   AS chunks
          FROM tok)
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 16-token chunking (trailing partial kept) -- the
    shard-preparation step; ZERO shuffles, chunk_no is per-document so
    the plan stays narrow end-to-end."""
    return chunk_documents(_docs(spark, sf_dir), "doc_id", "text", chunk_tokens=16)


@register(
    "train_pack_sequences",
    oracle=f"""
    WITH {_TOK},
    feats AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks FROM tok),
    off AS (
      SELECT doc_id, n_toks,
             CAST(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o
      FROM feats),
    spans AS (
      SELECT doc_id, n_toks, o,
             unnest(range(o // 64, (o + n_toks - 1) // 64 + 1)) AS window_id
      FROM off)
    SELECT CAST(window_id AS BIGINT) AS window_id, doc_id,
           CAST(GREATEST(o, window_id * 64) - o AS BIGINT) AS tok_start,
           CAST(LEAST(o + n_toks, (window_id + 1) * 64)
                - GREATEST(o, window_id * 64) AS BIGINT) AS n_toks
    FROM spans
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style packing into 64-token context windows: the oracle is
    ONE global cumsum window (fine for DuckDB single-node); the Spark
    side computes the identical offsets with the two-phase
    range-partitioned prefix sum -- no single-task window anywhere."""
    return pack_sequences(_docs(spark, sf_dir), "doc_id", "text", window_tokens=64)


@register(
    "train_token_budget_sample",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents),
    feats AS (
      SELECT doc_id, lang AS "group", CAST(len(ts) AS BIGINT) AS n_toks,
             ((CAST(doc_id AS BIGINT) % 2147483648) * 2654435761) % 2147483648 AS h
      FROM tok),
    placed AS (
      SELECT doc_id, "group", n_toks,
             COALESCE(SUM(n_toks) OVER (PARTITION BY "group"
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM feats)
    SELECT doc_id, "group", n_toks, CAST(cum_before AS BIGINT) AS cum_before,
           CAST(CASE WHEN cum_before < 2000 THEN 1 ELSE 0 END AS BIGINT) AS selected
    FROM placed
    """,
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget sampling (2000 tokens/language in
    Knuth-hash pseudo-random order): the data-mixing quota step.  The
    oracle's per-group window is replaced on the Spark side by static
    hash-range buckets + broadcast base offsets, so no language ever
    serializes through one task."""
    return token_budget_sample(
        _docs(spark, sf_dir), "doc_id", "text", "lang", budget_tokens=2000
    )


# --------------------------------------------------------------------------
# Mutual-information feature audit
# --------------------------------------------------------------------------

_MI_PAIRS = [
    ("o_orderstatus", "high_value"),
    ("o_orderpriority", "high_value"),
    ("o_orderstatus", "o_orderpriority"),
]
_MI_LABEL_SQL = "CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END"


def _mi_pair_sql(fx: str, fy: str) -> str:
    """One pair's MI block: cells -> window marginals -> nano-unit
    fixed-point cell terms -> one summary row.  Mirrors
    ``operators/trainprep.py::mutual_information`` exactly."""
    return f"""
    SELECT '{fx}' AS feature, '{fy}' AS label,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(term_fp) AS BIGINT) AS mi_nano
    FROM (
      SELECT n,
             CAST(FLOOR(
               (CAST(c_xy AS DOUBLE) / CAST(n AS DOUBLE))
               * ln((CAST(c_xy AS DOUBLE) * CAST(n AS DOUBLE))
                    / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT) AS term_fp
      FROM (
        SELECT c_xy,
               CAST(SUM(c_xy) OVER (PARTITION BY x) AS BIGINT) AS c_x,
               CAST(SUM(c_xy) OVER (PARTITION BY y) AS BIGINT) AS c_y,
               CAST(SUM(c_xy) OVER () AS BIGINT) AS n
        FROM (
          SELECT {fx} AS x, {fy} AS y, CAST(COUNT(*) AS BIGINT) AS c_xy
          FROM (SELECT o_orderstatus, o_orderpriority,
                       {_MI_LABEL_SQL} AS high_value
                FROM orders)
          GROUP BY 1, 2)))
    """


@register(
    "mi_feature_audit",
    oracle=" UNION ALL ".join(_mi_pair_sql(fx, fy) for fx, fy in _MI_PAIRS),
)
def q_mi_feature_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between order features and a derived
    high-value label (plus the feature-feature dependency), nano-unit
    fixed-point cell terms summed as BIGINT
    (`operators/trainprep.py::mutual_information`).  The training-prep
    read: which categorical feature carries signal about the label, and
    are two candidate features redundant with each other."""
    from ..operators.trainprep import mutual_information

    orders = spark.read.parquet(table_path(sf_dir, "orders")).select(
        "o_orderstatus",
        "o_orderpriority",
        (F.col("o_totalprice") > 150000).cast("int").alias("high_value"),
    )
    return mutual_information(orders, _MI_PAIRS)


# --------------------------------------------------------------------------
# DSIR importance weights + temperature source mixing (r13)
# --------------------------------------------------------------------------

#: The "curated target domain" stand-in for DSIR: four fixture sources.
_DSIR_TARGET = ("src0", "src1", "src2", "src3")


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(source IN {str(tuple(_DSIR_TARGET))} AS BIGINT) AS is_target,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents),
    b AS (
      SELECT doc_id, is_target,
             CAST(CONCAT('0x', substring(md5(tok), 2, 15)) AS BIGINT) % 64 AS bucket
      FROM tok),
    counts AS (
      SELECT bucket, CAST(SUM(is_target) AS BIGINT) AS c_t,
             CAST(COUNT(*) AS BIGINT) AS c_r
      FROM b GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(c_t) AS BIGINT) AS tot_t,
             CAST(SUM(c_r) AS BIGINT) AS tot_r
      FROM counts),
    lr AS (
      SELECT bucket,
             CAST(FLOOR(ln((CAST(c_t + 1 AS DOUBLE) * CAST(tot_r + 64 AS DOUBLE))
                           / (CAST(c_r + 1 AS DOUBLE) * CAST(tot_t + 64 AS DOUBLE)))
                        * 1000000000 + 0.5) AS BIGINT) AS lr_nano
      FROM counts CROSS JOIN tot)
    SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lr_nano) AS BIGINT) AS weight_nano
    FROM b JOIN lr USING (bucket)
    GROUP BY 1
    """,
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data-selection weights (Xie et al. 2023): hashed-unigram
    bucket LMs for a curated target domain (sources src0-src3) vs the
    raw corpus; per-doc weight = integer sum of per-bucket nano
    fixed-point log ratios, so summation order can't move the value and
    DuckDB replays the whole pipeline including the 60-bit portable
    bucket hash (`operators/trainprep.py::dsir_logratio_weights`)."""
    from ..operators.trainprep import dsir_logratio_weights

    return dsir_logratio_weights(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        target_pred=F.col("source").isin(*_DSIR_TARGET),
    )


@register(
    "source_mix_temperature",
    oracle="""
    WITH w AS (
      SELECT source AS "group", CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY 1),
    wf AS (
      SELECT *, CAST(FLOOR(POWER(CAST(n_tokens AS DOUBLE), 0.3)
                           * 1000000 + 0.5) AS BIGINT) AS w_fp
      FROM w),
    tot AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS tw FROM wf),
    q AS (
      SELECT wf.*, (w_fp * 1000000) // tw AS share_micro,
             (w_fp * 10000) // tw AS base, (w_fp * 10000) % tw AS rem
      FROM wf CROSS JOIN tot),
    ranked AS (
      SELECT q.*, ROW_NUMBER() OVER (ORDER BY rem DESC, "group") AS rk,
             CAST(10000 - (SELECT SUM(base) FROM q) AS BIGINT) AS leftover
      FROM q)
    SELECT "group", n_docs, n_tokens, w_fp,
           CAST(share_micro AS BIGINT) AS share_micro,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS quota
    FROM ranked
    """,
)
def q_source_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed (alpha=0.3, the mT5 rule) source-mix quotas
    over a 10k-doc budget: token share ** alpha upweights tail sources,
    largest-remainder apportionment makes the integer quotas sum to
    exactly 10000 (`operators/trainprep.py::source_temperature_quota`).
    The only float is one pow per source, micro-fixed before the pure
    int64 apportionment."""
    from ..operators.trainprep import source_temperature_quota

    return source_temperature_quota(
        _docs(spark, sf_dir), "doc_id", "text", "source", alpha=0.3, budget_docs=10_000
    )


# --------------------------------------------------------------------------
# Corpus retention funnel (r13): the whole prep pipeline, one scoreboard
# --------------------------------------------------------------------------


def _funnel_oracle() -> str:
    from .dedup import _portable_minhash_sql

    corpus = "(SELECT * FROM documents WHERE doc_id % 23 <> 0)"
    return f"""
    WITH RECURSIVE {_portable_minhash_sql(source=corpus)},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM vpairs
      UNION SELECT doc_b, doc_a FROM vpairs),
    reach(doc, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.doc, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
    cc AS (SELECT doc, MIN(r) AS canonical FROM reach GROUP BY doc),
    labeled AS (
      SELECT d.doc_id, d.source, d.n_chars, COALESCE(cc.canonical, d.doc_id) AS canonical
      FROM documents d LEFT JOIN cc ON cc.doc = d.doc_id
      WHERE d.doc_id % 23 <> 0),
    surv AS (
      SELECT doc_id,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY canonical
                                          ORDER BY n_chars DESC, doc_id) = 1
                  THEN 1 ELSE 0 END AS is_survivor
      FROM labeled),
    {_QUALITY_FEATS_CTE},
    qg AS (
      SELECT doc_id, n_tokens,
             CASE WHEN {_GATE_PASSES_SQL} THEN 1 ELSE 0 END AS passes
      FROM feats),
    {_csh_cte()},
    {_BSH_CTE},
    cont AS (
      SELECT doc_id, 1 AS contaminated
      FROM (SELECT doc_id,
                   CAST('0x' || substring(md5(s), 2, 15) AS BIGINT) AS h
            FROM csh)
      WHERE h IN (SELECT h FROM bsh)
      GROUP BY 1)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(qg.passes) AS BIGINT) AS n_quality,
           CAST(SUM(surv.is_survivor) AS BIGINT) AS n_unique,
           CAST(SUM(1 - COALESCE(cont.contaminated, 0)) AS BIGINT) AS n_clean,
           CAST(SUM(qg.passes * surv.is_survivor
                    * (1 - COALESCE(cont.contaminated, 0))) AS BIGINT) AS n_final,
           CAST(SUM(qg.n_tokens * qg.passes * surv.is_survivor
                    * (1 - COALESCE(cont.contaminated, 0))) AS BIGINT) AS tokens_final
    FROM documents d
    JOIN qg ON qg.doc_id = d.doc_id
    JOIN surv ON surv.doc_id = d.doc_id
    LEFT JOIN cont ON cont.doc_id = d.doc_id
    WHERE d.doc_id % 23 <> 0
    GROUP BY d.source
    """


@register("corpus_retention_funnel", oracle=_funnel_oracle())
def q_corpus_retention_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prep pipeline's SCOREBOARD, per source: how many documents
    enter, pass the Gopher quality gates, survive keep-longest near-dup
    collapse (portable LSH -> verify -> CC -> survivorship), are free of
    benchmark 5-gram contamination, and clear ALL THREE -- plus the final
    token yield.  This is the one-row-per-source answer to "what did the
    pipeline keep and why"; DuckDB replays every stage including the
    transitive closure, so the whole composition is hash-verified
    end-to-end.  Scale: each stage is the already-audited plan (gates
    pipeline into the scan, LSH never goes all-pairs, the benchmark hash
    set broadcasts); the funnel adds only doc-keyed joins and one
    groupBy(source)."""
    from pyspark.sql import Window as W

    from ..operators.dedup import connected_components, minhash_portable_lsh

    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 23 != 0)
    benchmark = docs.filter(F.col("doc_id") % 23 == 0)

    qg = quality_gates(corpus, "doc_id", "text").select(
        "doc_id", "n_tokens", F.col("passes").cast("long").alias("passes")
    )
    pairs = minhash_portable_lsh(corpus, "doc_id", "text", threshold=0.7)
    cc = connected_components(pairs)
    labeled = corpus.select("doc_id", "n_chars").join(
        cc, F.col("doc_id") == cc["doc"], "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("canonical"), F.col("doc_id")).alias("canonical"),
        "n_chars",
    )
    surv = labeled.select(
        "doc_id",
        (
            F.row_number().over(
                W.partitionBy("canonical").orderBy(F.desc("n_chars"), F.asc("doc_id"))
            )
            == 1
        )
        .cast("long")
        .alias("is_survivor"),
    )
    cont = decontaminate_ngrams(corpus, benchmark, "doc_id", "text", n=5).select(
        "doc_id", F.col("contaminated").cast("long").alias("contaminated")
    )
    joined = (
        corpus.select("doc_id", "source")
        .join(qg, "doc_id")
        .join(surv, "doc_id")
        .join(cont, "doc_id", "left")
        .withColumn("contaminated", F.coalesce(F.col("contaminated"), F.lit(0)))
    )
    keep = (
        F.col("passes") * F.col("is_survivor") * (F.lit(1) - F.col("contaminated"))
    )
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("passes").cast("long").alias("n_quality"),
        F.sum("is_survivor").cast("long").alias("n_unique"),
        F.sum(F.lit(1) - F.col("contaminated")).cast("long").alias("n_clean"),
        F.sum(keep).cast("long").alias("n_final"),
        F.sum(F.col("n_tokens") * keep).cast("long").alias("tokens_final"),
    )


@register(
    "zipf_vocabulary_audit",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents),
    freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
    stats AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_types
      FROM freq),
    ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rk
      FROM freq QUALIFY rk <= 100),
    pts AS (
      SELECT CAST(FLOOR(ln(CAST(rk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
             CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
      FROM ranked),
    reg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts)
    SELECT s.n_tokens, s.n_types, s.hapax_types,
           (s.n_types * 1000000) // s.n_tokens AS ttr_micro,
           (s.hapax_types * 1000000) // s.n_types AS hapax_share_micro,
           CASE WHEN r.k * r.sxx - r.sx * r.sx <> 0 THEN
             CAST(FLOOR((CAST(r.k * r.sxy - r.sx * r.sy AS DOUBLE)
                         / CAST(r.k * r.sxx - r.sx * r.sx AS DOUBLE))
                        * 1000000 + 0.5) AS BIGINT)
           END AS zipf_slope_micro
    FROM stats s CROSS JOIN reg r
    """,
)
def q_zipf_vocabulary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary diagnostics for LM-data curation, one row:
    token/type counts, type-token ratio, hapax share (both micro
    fixed-point), and the ZIPF SLOPE -- the OLS slope of ln(freq) on
    ln(rank) over the top-100 tokens (natural text sits near -1;
    boilerplate-heavy or templated corpora flatten it).  Exactness: each
    ln is one double op on an exact integer, micro-fixed per point;
    the regression sums are then pure int64 (headroom: ln(1e12)*1e6 ~
    2.8e7 per coordinate, k * sum(x*y) ~ 4e18 < 2^63 even at 100 TB
    token counts), and the final slope is one division of exact
    integers.  Scale: one groupBy(token) + one TakeOrdered(100) -- the
    100-row regression window is constant-size by construction."""
    from ..operators.dedup import tokenize

    docs = _docs(spark, sf_dir)
    freq = (
        docs.select(F.explode(tokenize("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    stats = freq.agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast("long").alias("hapax_types"),
    )
    from pyspark.sql import Window as W

    order = [F.desc("cnt"), F.asc("tok")]
    # TakeOrderedAndProject keeps the top-100 selection distributed; the
    # row_number window then runs over exactly 100 rows.
    topk = freq.orderBy(*order).limit(100)
    ranked = topk.withColumn("rk", F.row_number().over(W.orderBy(*order)))
    pts = ranked.select(
        F.floor(F.log(F.col("rk").cast("double")) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    reg = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return stats.crossJoin(F.broadcast(reg)).select(
        "n_tokens",
        "n_types",
        "hapax_types",
        F.expr("(n_types * 1000000) div n_tokens").alias("ttr_micro"),
        F.expr("(hapax_types * 1000000) div n_types").alias("hapax_share_micro"),
        # Degenerate-corpus guard (r13 advice): with a single distinct
        # token k=1 and the OLS denominator is 0 -- Spark's double
        # division would yield NaN while DuckDB's CAST(FLOOR(NaN))
        # errors, so both engines take an explicit NULL instead.
        F.when(
            F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx") != 0,
            F.floor(
                (
                    (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                    / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                )
                * 1_000_000
                + F.lit(0.5)
            ).cast("long"),
        ).alias("zipf_slope_micro"),
    )
