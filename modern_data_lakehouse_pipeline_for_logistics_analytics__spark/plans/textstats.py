"""Text-analysis plans over the ``documents`` fixture (north-star).

Every score is a deterministic pure function of the text; all ratios are
integer-count ratios (bit-identical across engines) rounded at 4dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import (
    fingerprints,
    language_votes,
    quality_features,
    token_counts,
)
from .registry import register, table_path


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "documents"))


@register(
    "text_quality_scores",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             LENGTH(text) AS nc,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS nt,
             len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS nd,
             LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct,
             LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS digits
      FROM documents),
    r AS (
      SELECT doc_id, nc, nt, punct, digits,
             CAST(FLOOR((nd / nt) * 10000 + 0.5) AS BIGINT) / CAST(10000.0 AS DOUBLE) AS distinct_ratio,
             CAST(FLOOR(((nc - (nt - 1)) / nt) * 10000 + 0.5) AS BIGINT) / CAST(10000.0 AS DOUBLE)
               AS mean_tok_len
      FROM base)
    SELECT doc_id,
           nc AS n_chars_m, nt AS n_tokens, mean_tok_len,
           punct AS punct_cnt, digits AS digit_cnt, distinct_ratio,
           CAST(FLOOR((LEAST(CAST(1.0 AS DOUBLE), nt / CAST(100.0 AS DOUBLE)) * 0.5
                 + distinct_ratio * 0.3
                 + CASE WHEN punct / nc < 0.1 THEN CAST(0.2 AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END) * 10000 + 0.5) AS BIGINT) / CAST(10000.0 AS DOUBLE)
             AS quality_score
    FROM r
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punct/digit/distinct-token features plus a
    composite score (filter-threshold shape used by pretraining pipelines)."""
    return quality_features(_docs(spark, sf_dir), "doc_id", "text")


# Shared language-ID CTE block: `s3` carries the vote columns and the
# (l3, m3) running argmax; the final `CASE WHEN votes_fr > m3 ...` IS
# lang_pred.  Single-sourced (r12) because two oracles now replay the
# predictor -- the votes query below and the kappa agreement audit
# (`plans/coverage7.py`) -- and a drifted copy would silently verify
# different predictions.
LANGID_VOTE_CTES = """v AS (
      SELECT doc_id,
             len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
                 ['der','die','und','das','ist'])) AS votes_de,
             len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
                 ['the','and','of','to','is'])) AS votes_en,
             len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
                 ['el','la','de','que','y'])) AS votes_es,
             len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
                 ['le','la','et','les','des'])) AS votes_fr
      FROM documents),
    s2 AS (SELECT *, CASE WHEN votes_en > votes_de THEN 'en' ELSE 'de' END AS l2,
                  GREATEST(votes_de, votes_en) AS m2 FROM v),
    s3 AS (SELECT *, CASE WHEN votes_es > m2 THEN 'es' ELSE l2 END AS l3,
                  GREATEST(m2, votes_es) AS m3 FROM s2)"""

LANGID_PRED_EXPR = "CASE WHEN votes_fr > m3 THEN 'fr' ELSE l3 END"


@register(
    "text_langid_votes",
    oracle=f"""
    WITH {LANGID_VOTE_CTES}
    SELECT doc_id, votes_de, votes_en, votes_es, votes_fr,
           {LANGID_PRED_EXPR} AS lang_pred
    FROM s3
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word-voting language ID with deterministic lexicographic
    tie-break (n-gram heuristic family; swap in a real classifier behind
    the same columns)."""
    return language_votes(_docs(spark, sf_dir), "doc_id", "text")


@register(
    "text_token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT)
             AS bpe_tokens
    FROM documents
    """,
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace and BPE-ish regex pretokenizer."""
    return token_counts(_docs(spark, sf_dir), "doc_id", "text")


@register(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text))) AS full_md5,
           list_aggregate(list_transform(
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
             t -> md5(t)), 'min') AS min_tok_md5,
           list_aggregate(list_transform(
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')),
             t -> md5(t)), 'max') AS max_tok_md5,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_m
    FROM documents
    """,
)
def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-text digest + min/max token digests
    (2-hash MinHash; the rolling-hash family)."""
    return fingerprints(_docs(spark, sf_dir), "doc_id", "text")


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df_t FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_t,
             CAST(FLOOR(tf.tf * LN((n.n_docs + 1) / (dfreq.df_t + 1)) * 1000000 + 0.5)
                  AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf, df_t, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
      FROM scored)
    SELECT doc_id, term, tf, df_t, score, rnk FROM ranked WHERE rnk <= 3
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per doc (keyword extraction): explode -> tf /
    document-frequency aggregations -> broadcast idf join -> per-doc
    top-k window.  Smoothed idf, half-up 6dp rounding, term tie-break."""
    from ..operators.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), "doc_id", "text", k=3)


@register(
    "text_top_bigram_share",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents),
    bg AS (
      SELECT doc_id, unnest([ts[i] || ' ' || ts[i+1] for i in range(1, len(ts))]) AS bigram
      FROM tok WHERE len(ts) >= 2),
    counts AS (
      SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    tops AS (
      SELECT doc_id, bigram, c,
             CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_bigrams,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram) AS rn
      FROM counts)
    SELECT doc_id, bigram AS top_bigram, CAST(c AS BIGINT) AS top_count, n_bigrams,
           CAST(FLOOR((c / n_bigrams) * 10000 + 0.5) AS BIGINT) / CAST(10000.0 AS DOUBLE)
             AS top_share
    FROM tops WHERE rn = 1
    """,
)
def q_top_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate signal (pretraining quality filters flag
    docs whose single most-frequent bigram dominates): per-doc top bigram
    and its share of all bigram occurrences.  Integer-ratio share with
    half-up 4dp rounding; deterministic tie-break on the bigram string.

    Bigram extraction is one narrow Arrow-batched mapInPandas pass --
    the transform/element_at higher-order-expression version is
    interpreted (no codegen) and measured 3x slower at sf0.1, the same
    lesson as ``operators.dedup.shingle_sets``.  Tokenization matches the
    oracle's split(lower(trim(x)), '\\s+') exactly."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.dedup import _spread
    from ..operators.textstats import round_half_up

    def gen(batches):
        for pdf in batches:
            ids: list = []
            grams: list = []
            for doc, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.lower().strip().split()
                ids.extend([doc] * max(0, len(toks) - 1))
                grams.extend(
                    " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
                )
            yield pd.DataFrame({"doc_id": ids, "bigram": grams})

    d = _spread(_docs(spark, sf_dir).select("doc_id", "text"))
    bg = d.mapInPandas(gen, schema="doc_id long, bigram string")
    counts = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    wdoc = Window.partitionBy("doc_id")
    wtop = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("bigram"))
    return (
        counts.withColumn("n_bigrams", F.sum("c").over(wdoc).cast("long"))
        .withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bigram").alias("top_bigram"),
            F.col("c").cast("long").alias("top_count"),
            "n_bigrams",
            round_half_up(F.col("c") / F.col("n_bigrams"), 4).alias("top_share"),
        )
    )


@register(
    "text_pii_pattern_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[\\w.+-]+@[\\w-]+\\.[\\w.]+')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '\\d{3}[-.]\\d{3,4}[-.]\\d{4}')) AS BIGINT)
             AS n_phoneish,
           CAST(len(regexp_extract_all(text, '\\d{4,}')) AS BIGINT) AS n_long_digit_runs
    FROM documents
    """,
)
def q_pii_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern scan (governance filter stage): per-doc counts of
    email-shaped, phone-shaped, and long-digit-run matches -- pure
    codegen regexp, one narrow projection.  Zero matches on clean docs
    is the expected output, not an error (one row per doc regardless)."""
    from pyspark.sql import functions as F

    d = _docs(spark, sf_dir)
    t = F.col("text")

    def n(pattern: str) -> F.Column:
        return F.size(F.regexp_extract_all(t, F.lit(f"({pattern})"), 1)).cast("long")

    return d.select(
        "doc_id",
        n(r"[\w.+-]+@[\w-]+\.[\w.]+").alias("n_emails"),
        n(r"\d{3}[-.]\d{3,4}[-.]\d{4}").alias("n_phoneish"),
        n(r"\d{4,}").alias("n_long_digit_runs"),
    )


@register(
    "heavy_hitter_tokens",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS item
      FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok)
    SELECT item, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(FLOOR((COUNT(*) / CAST(t.n_total AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
             / CAST(10000.0 AS DOUBLE) AS share
    FROM tok, tot t
    GROUP BY item, t.n_total
    HAVING COUNT(*) > CAST(t.n_total * 0.02 AS BIGINT)
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens (> 2% of all token occurrences): freqItems
    candidate pass + exact verify equals the full GROUP BY HAVING answer
    -- the oracle IS that full aggregate, so the candidates-then-verify
    shortcut is hash-proven lossless."""
    from ..operators.aggregates import heavy_hitters

    toks = _docs(spark, sf_dir).select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t")
    )
    return heavy_hitters(toks, "t", min_share=0.02)


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS) + shared-fingerprint near-dup candidates
# --------------------------------------------------------------------------

_WINNOW_K = 3
_WINNOW_W = 4
_WINNOW_MAX_DF = 50
_WINNOW_MIN_SHARED = 2


def _winnow_fp_sql(k: int, w: int) -> str:
    """Shared CTE block (DuckDB): winnowing selections over documents.
    Mirrors `operators/textstats.py::winnow_fingerprints` step for step;
    the 60-bit md5-slice hash is the portable base hash."""
    return f"""
    toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
             FROM documents),
    shl AS (
      SELECT doc_id,
             list_transform(
               generate_series(0, greatest(len(t) - {k}, 0)),
               i -> array_to_string(t[i + 1 : i + {k}], ' ')) AS shs
      FROM toks),
    sh AS (
      SELECT doc_id,
             CAST(generate_subscripts(shs, 1) - 1 AS BIGINT) AS pos,
             CAST('0x' || substring(md5(unnest(shs)), 2, 15) AS BIGINT) AS h
      FROM shl),
    mx AS (SELECT doc_id, MAX(pos) AS maxpos FROM sh GROUP BY doc_id),
    anch AS (SELECT doc_id,
                    CAST(unnest(generate_series(0, greatest(maxpos - {w - 1}, 0)))
                         AS BIGINT) AS s
             FROM mx),
    wins AS (SELECT a.doc_id, a.s, MIN(m.h) AS minh
             FROM anch a JOIN sh m ON m.doc_id = a.doc_id
                                  AND m.pos BETWEEN a.s AND a.s + {w - 1}
             GROUP BY a.doc_id, a.s),
    sel AS (SELECT wn.doc_id, wn.s, wn.minh, MAX(m.pos) AS selpos
            FROM wins wn JOIN sh m ON m.doc_id = wn.doc_id AND m.h = wn.minh
                                  AND m.pos BETWEEN wn.s AND wn.s + {w - 1}
            GROUP BY wn.doc_id, wn.s, wn.minh),
    dsel AS (SELECT DISTINCT doc_id, minh AS fp, selpos FROM sel),
    fps AS (SELECT doc_id, fp, CAST(COUNT(*) AS BIGINT) AS n_positions,
                   CAST(MIN(selpos) AS BIGINT) AS first_pos
            FROM dsel GROUP BY doc_id, fp)"""


@register(
    "text_winnow_fingerprints",
    oracle=f"WITH {_winnow_fp_sql(_WINNOW_K, _WINNOW_W)} SELECT * FROM fps",
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS local-fingerprint
    scheme): k-token shingle hashes, window-of-w minima, rightmost
    tie-break -- every selection replayed bit-for-bit by the DuckDB
    oracle (`operators/textstats.py::winnow_fingerprints`)."""
    from ..operators.textstats import winnow_fingerprints

    return winnow_fingerprints(
        _docs(spark, sf_dir), "doc_id", "text", k=_WINNOW_K, w=_WINNOW_W
    )


@register(
    "dedup_winnow_candidates",
    oracle=f"""
    WITH {_winnow_fp_sql(_WINNOW_K, _WINNOW_W)},
    rare AS (
      SELECT fp FROM fps GROUP BY fp
      HAVING COUNT(*) <= {_WINNOW_MAX_DF}),
    ff AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}
    """,
)
def q_winnow_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates from shared winnowing fingerprints: pairs of
    documents sharing >= {min_shared} selected fingerprints, after
    dropping fingerprints present in more than {max_df} documents (the
    stop-shingle guard -- the same hot-bucket discipline as the LSH
    family: a boilerplate shingle shared by every doc would otherwise
    drive the candidate join to sum(bucket^2)).  Winnowing's guarantee
    makes this the LOCAL near-dup detector: any shared token run of
    length >= w + k - 1 forces a shared fingerprint."""
    from ..operators.textstats import winnow_fingerprints

    fps = winnow_fingerprints(
        _docs(spark, sf_dir), "doc_id", "text", k=_WINNOW_K, w=_WINNOW_W
    ).select("doc_id", "fp")
    from ..operators.dedup import _cache_aged

    fps = _cache_aged("winnow_fps", fps)
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= _WINNOW_MAX_DF)
        .select("fp")
    )
    ff = fps.join(rare, "fp")
    a = ff.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = ff.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


# --------------------------------------------------------------------------
# BPE tokenizer training: learned merge table
# --------------------------------------------------------------------------

_BPE_ROUNDS = 8


def _bpe_oracle(rounds: int, final_select: str | None = None) -> str:
    """Unrolled MATERIALIZED-CTE replay of the BPE training loop: each
    round's symbol table t{r} is referenced four times (pair count,
    match join, next-symbol join, rebuild), so materialization is
    load-bearing -- inlined CTEs would re-evaluate the whole prefix
    exponentially.  ``final_select`` (with ``{T}`` standing for the
    final symbol table ``t{rounds}``) overrides the default merge-table
    output -- the encode query aggregates the final table instead."""
    parts = [
        """
    WITH wrd AS MATERIALIZED (
      SELECT tok AS wid, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
            FROM documents)
      GROUP BY tok),
    t0 AS MATERIALIZED (
      SELECT wid, n, CAST(g - 1 AS BIGINT) AS pos,
             CASE WHEN g <= length(wid) THEN substring(wid, g, 1)
                  ELSE '</w>' END AS sym
      FROM (SELECT wid, n, unnest(generate_series(1, length(wid) + 1)) AS g
            FROM wrd))"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""",
    pr{r} AS (SELECT a.sym AS x, b.sym AS y, CAST(SUM(a.n) AS BIGINT) AS cnt
              FROM t{p} a JOIN t{p} b ON b.wid = a.wid AND b.pos = a.pos + 1
              GROUP BY a.sym, b.sym),
    tp{r} AS MATERIALIZED (SELECT x, y, cnt FROM pr{r}
                           ORDER BY cnt DESC, x, y LIMIT 1),
    mk{r} AS (SELECT a.wid, a.pos
              FROM t{p} a JOIN t{p} b ON b.wid = a.wid AND b.pos = a.pos + 1
              JOIN tp{r} tp ON a.sym = tp.x AND b.sym = tp.y),
    gr{r} AS (SELECT wid, pos,
                     pos - ROW_NUMBER() OVER (PARTITION BY wid ORDER BY pos) AS grp
              FROM mk{r}),
    sl{r} AS MATERIALIZED (
      SELECT wid, pos FROM (
        SELECT wid, pos, MIN(pos) OVER (PARTITION BY wid, grp) AS rmin
        FROM gr{r})
      WHERE (pos - rmin) % 2 = 0),
    t{r} AS MATERIALIZED (
      SELECT tok.wid, tok.n,
             CAST(ROW_NUMBER() OVER (PARTITION BY tok.wid ORDER BY tok.pos) - 1
                  AS BIGINT) AS pos,
             CASE WHEN s.pos IS NOT NULL THEN tok.sym || nx.sym
                  ELSE tok.sym END AS sym
      FROM t{p} tok
      LEFT JOIN sl{r} s ON s.wid = tok.wid AND s.pos = tok.pos
      LEFT JOIN sl{r} d ON d.wid = tok.wid AND d.pos = tok.pos - 1
      LEFT JOIN t{p} nx ON nx.wid = tok.wid AND nx.pos = tok.pos + 1
      WHERE d.pos IS NULL)"""
        )
    if final_select is not None:
        parts.append("\n    " + final_select.format(T=f"t{rounds}"))
        return "".join(parts)
    finals = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, x, y, cnt FROM tp{r}"
        for r in range(1, rounds + 1)
    )
    parts.append(f"\n    {finals}")
    return "".join(parts)


@register("bpe_learned_merges", oracle=_bpe_oracle(_BPE_ROUNDS))
def q_bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING over the corpus: 8 merge rounds learned
    on the distinct-word frequency table (pair counting -> most
    frequent pair with lexicographic tie-break -> greedy left-to-right
    merge), each round replayed bit-for-bit by unrolled MATERIALIZED
    DuckDB CTEs.  Output: the learned merge table ``(merge_round, x,
    y, cnt)`` -- the artifact a tokenizer build would ship
    (`operators/trainprep.py::bpe_learn_merges`)."""
    from ..operators.trainprep import bpe_learn_merges

    docs = _docs(spark, sf_dir)
    merges = bpe_learn_merges(docs, "text", rounds=_BPE_ROUNDS)
    return spark.createDataFrame(
        merges, "merge_round long, x string, y string, cnt long"
    )


_BPE_ENCODE_FINAL = """, occ AS (
      SELECT source, tok AS wid, CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM (SELECT source,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
            FROM documents)
      GROUP BY source, tok),
    wtok AS (
      SELECT wid, CAST(COUNT(*) AS BIGINT) AS n_syms
      FROM {T} WHERE sym <> '</w>' GROUP BY wid),
    enc AS (
      SELECT source,
             CAST(SUM(n_occ) AS BIGINT) AS n_words,
             CAST(SUM(n_occ * n_syms) AS BIGINT) AS n_tokens,
             CAST(SUM(n_occ * length(wid)) AS BIGINT) AS n_chars
      FROM occ JOIN wtok USING (wid)
      GROUP BY source)
    SELECT source, n_words, n_tokens, n_chars,
           CAST((2 * n_tokens * 1000000 + n_words)
                // (2 * n_words) AS BIGINT) AS tokens_per_word_micro,
           CAST((2 * n_chars * 1000000 + n_tokens)
                // (2 * n_tokens) AS BIGINT) AS chars_per_token_micro
    FROM enc ORDER BY source"""


@register(
    "bpe_encode_corpus",
    oracle=_bpe_oracle(_BPE_ROUNDS, final_select=_BPE_ENCODE_FINAL),
)
def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-lifecycle completion: train the 8-round BPE vocabulary,
    then ENCODE the corpus with it and report per-source compression
    statistics (tokens per word, chars per token, exact micro
    fixed-point) -- the health check a pipeline runs on a candidate
    vocabulary before committing; rides the distinct-word symbol table,
    never re-scans raw text
    (`operators/trainprep.py::bpe_encode_stats`)."""
    from ..operators.trainprep import bpe_encode_stats

    return bpe_encode_stats(
        _docs(spark, sf_dir), "text", "source", rounds=_BPE_ROUNDS
    )


# --------------------------------------------------------------------------
# BM25 retrieval over the documents corpus
# --------------------------------------------------------------------------

_BM25_TERMS = ["scan", "join", "merge"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20


def _bm25_oracle() -> str:
    kp1 = repr(_BM25_K1 + 1.0)
    kb = repr(_BM25_K1 * _BM25_B)
    k1mb = repr(_BM25_K1 * (1.0 - _BM25_B))
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS dl,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_len FROM base),
    tok AS (SELECT doc_id, dl, unnest(toks) AS term FROM base),
    qtok AS (SELECT * FROM tok WHERE term IN ({terms})),
    tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM qtok GROUP BY doc_id, dl, term),
    tfd AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df_t
            FROM tf),
    sc AS (
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
      FROM tfd CROSS JOIN stats)
    SELECT doc_id, CAST(SUM(term_fp) AS BIGINT) AS score_fp,
           CAST(COUNT(*) AS BIGINT) AS n_hit_terms
    FROM sc GROUP BY doc_id
    ORDER BY score_fp DESC, doc_id LIMIT {_BM25_TOPN}
    """


@register("bm25_search_topdocs", oracle=_bm25_oracle())
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document retrieval for a fixed bag-of-terms query
    ('scan join merge'): Robertson/Lucene scoring with per-term
    micro-unit fixed-point contributions summed as BIGINT, so rankings
    can never flip on float addition order; top-20 docs
    (`operators/textstats.py::bm25_topk`)."""
    from ..operators.textstats import bm25_topk

    return bm25_topk(
        _docs(spark, sf_dir), "doc_id", "text", _BM25_TERMS,
        k1=_BM25_K1, b=_BM25_B, topn=_BM25_TOPN,
    )


@register(
    "kl_source_drift",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents),
    st AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_st
           FROM tok GROUP BY source, term),
    stw AS (SELECT *,
                   CAST(SUM(c_st) OVER (PARTITION BY term) AS BIGINT) AS c_t,
                   CAST(SUM(c_st) OVER (PARTITION BY source) AS BIGINT) AS n_s
            FROM st),
    tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM st),
    sc AS (
      SELECT source, n_s,
             CAST(FLOOR(
               (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
               * ln((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                    / (CAST(c_t AS DOUBLE) / CAST(n AS DOUBLE)))
               * CAST(1000000000.0 AS DOUBLE) + 0.5) AS BIGINT) AS term_fp
      FROM stw CROSS JOIN tot)
    SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(term_fp) AS BIGINT) AS kl_nano
    FROM sc GROUP BY source
    """,
)
def q_kl_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution --
    the drift number that catches one ingest source wandering
    off-distribution; nano-unit fixed-point term contributions summed
    as BIGINT (`operators/textstats.py::kl_source_drift`)."""
    from ..operators.textstats import kl_source_drift

    return kl_source_drift(_docs(spark, sf_dir), "source", "text")


# --------------------------------------------------------------------------
# Positional phrase search
# --------------------------------------------------------------------------

_PHRASES = ["key order", "stream data"]


def _phrase_oracle() -> str:
    branches = []
    for i, phrase in enumerate(_PHRASES):
        terms = phrase.split()
        joins = "".join(
            f" JOIN post p{j} ON p{j}.doc_id = p0.doc_id "
            f"AND p{j}.pos = p0.pos + {j} AND p{j}.term = '{t}'"
            for j, t in enumerate(terms[1:], start=1)
        )
        branches.append(
            f"SELECT '{phrase}' AS phrase, p0.doc_id, "
            f"CAST(COUNT(*) AS BIGINT) AS n_matches, "
            f"CAST(MIN(p0.pos) AS BIGINT) AS first_pos "
            f"FROM post p0{joins} WHERE p0.term = '{terms[0]}' "
            f"GROUP BY p0.doc_id"
        )
    vocab = sorted({t for p in _PHRASES for t in p.split()})
    inlist = ", ".join(f"'{t}'" for t in vocab)
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents),
    post AS MATERIALIZED (
      SELECT doc_id, CAST(generate_subscripts(ts, 1) - 1 AS BIGINT) AS pos,
             unnest(ts) AS term
      FROM toks)
    {" UNION ALL ".join(branches)}
    """


@register("phrase_search_positional", oracle=_phrase_oracle())
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-phrase retrieval over a positional inverted index: the
    postings build once, each phrase resolves as an adjacency equi-join
    chain -- exact match counts and first positions per document
    (`operators/textstats.py::phrase_search`)."""
    from ..operators.textstats import phrase_search

    return phrase_search(_docs(spark, sf_dir), "doc_id", "text", _PHRASES)


# --------------------------------------------------------------------------
# RAKE keyword extraction
# --------------------------------------------------------------------------

_RAKE_STOPS = ["the", "a", "and", "of", "to", "is"]


def _rake_oracle() -> str:
    stops = ", ".join(f"'{s}'" for s in _RAKE_STOPS)
    return f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(generate_subscripts(t, 1) - 1 AS BIGINT) AS pos,
             unnest(t) AS term
      FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS t
            FROM documents)),
    marked AS (
      SELECT doc_id, pos, term,
             SUM(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM tok),
    filtered AS (
      SELECT doc_id, grp, pos, term FROM marked
      WHERE term NOT IN ({stops})),
    members AS (
      SELECT doc_id, grp, pos, term,
             CAST(COUNT(*) OVER (PARTITION BY doc_id, grp) AS BIGINT)
               AS plen
      FROM filtered),
    words AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM members GROUP BY term),
    ws AS (
      SELECT term,
             CAST((2 * deg * 1000000 + freq) // (2 * freq) AS BIGINT)
               AS w_micro
      FROM words),
    ph AS (
      SELECT m.doc_id, m.grp,
             string_agg(m.term, ' ' ORDER BY m.pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM(ws.w_micro) AS BIGINT) AS score_micro
      FROM members m JOIN ws USING (term)
      GROUP BY m.doc_id, m.grp)
    SELECT phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MAX(score_micro) AS BIGINT) AS score_micro
    FROM ph GROUP BY phrase
    ORDER BY score_micro DESC, phrase LIMIT 20
    """


@register("rake_keyword_phrases", oracle=_rake_oracle())
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the document corpus: stopword-
    delimited candidate phrases scored by summed word deg/freq ratios in
    half-up micro fixed point -- the cheap corpus-triage keyword pass
    (`operators/textstats.py::rake_keywords`)."""
    from ..operators.textstats import rake_keywords

    return rake_keywords(
        _docs(spark, sf_dir), "doc_id", "text", _RAKE_STOPS, topn=20
    )
