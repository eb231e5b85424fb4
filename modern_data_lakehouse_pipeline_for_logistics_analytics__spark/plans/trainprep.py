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


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


@register(
    "train_decontaminate_ngrams",
    oracle=f"""
    WITH {_TOK},
    csh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(ts[i:i+4], ' ')
                                   for i in range(1, len(ts) - 3)])) AS s
      FROM tok WHERE doc_id % 23 <> 0 AND len(ts) >= 5),
    bsh AS (
      SELECT DISTINCT
             CAST('0x' || substring(md5(unnest(list_distinct(
               [array_to_string(ts[i:i+4], ' ') for i in range(1, len(ts) - 3)]
             ))), 2, 15) AS BIGINT) AS h
      FROM tok WHERE doc_id % 23 = 0 AND len(ts) >= 5),
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
    feats AS (
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
      FROM tok t JOIN documents d ON d.doc_id = t.doc_id)
    SELECT doc_id, n_tokens, mean_tok_len, symbol_ratio, n_stop_hits,
           CAST(CASE WHEN n_tokens BETWEEN 40 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS gate_len,
           CAST(CASE WHEN mean_tok_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END AS BIGINT) AS gate_tok_len,
           CAST(CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS gate_symbols,
           CAST(CASE WHEN n_stop_hits >= 1 THEN 1 ELSE 0 END AS BIGINT) AS gate_stops,
           CAST(CASE WHEN n_tokens BETWEEN 40 AND 100000
                      AND mean_tok_len BETWEEN 2.0 AND 12.0
                      AND symbol_ratio <= 0.1
                      AND n_stop_hits >= 1 THEN 1 ELSE 0 END AS BIGINT) AS passes
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
             CAST(FLOOR(ln(CAST((c_t + 1) * (tot_r + 64) AS DOUBLE)
                           / CAST((c_r + 1) * (tot_t + 64) AS DOUBLE))
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
                           * 1000000000 + 0.5) AS BIGINT) AS w_fp
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
    The only float is one pow per source, nano-fixed before the pure
    int64 apportionment."""
    from ..operators.trainprep import source_temperature_quota

    return source_temperature_quota(
        _docs(spark, sf_dir), "doc_id", "text", "source", alpha=0.3, budget_docs=10_000
    )
