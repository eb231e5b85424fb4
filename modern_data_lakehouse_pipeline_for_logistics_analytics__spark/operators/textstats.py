"""Text analysis operators for training-data pipelines (north-star
extension): language ID, quality scoring, token counting, fingerprinting.

All built-in string/array expressions -- whole-stage-codegen'd, no Python.
Accuracy of the heuristics is secondary to determinism: every score is a
pure function of the text, reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokenize


def round_half_up(col: F.Column, decimals: int) -> F.Column:
    """floor(x*10^d + 0.5)/10^d -- deterministic cross-engine rounding.

    Engine-native ROUND disagrees between Spark (decimal-string HALF_UP)
    and DuckDB (binary-value) when a ratio of small integers lands exactly
    on a .5 boundary whose double representation is inexact (e.g.
    3/160 = 0.01875).  floor over identical IEEE doubles is bit-identical
    everywhere.  Valid for the non-negative values used here."""
    p = 10**decimals
    return F.floor(col * p + F.lit(0.5)).cast("long") / F.lit(float(p))


def sql_round_half_up(expr: str, decimals: int) -> str:
    """DuckDB-side mirror of :func:`round_half_up`."""
    p = 10**decimals
    return f"CAST(FLOOR(({expr}) * {p} + 0.5) AS BIGINT) / {float(p)}"

#: Tiny per-language marker sets for the voting heuristic.  Real pipelines
#: swap in fastText/CLD3 behind the same column contract.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

#: BPE-ish pretokenizer: word pieces OR single non-space symbols.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic quality features: char/token counts, mean token
    length, punctuation density, digit density, distinct-token ratio.
    Output columns: id, n_chars_m, n_tokens, mean_tok_len, punct_cnt,
    digit_cnt, distinct_ratio, quality_score."""
    toks = tokenize(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    digits = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))
    distinct_ratio = round_half_up(F.size(F.array_distinct(toks)) / n_tokens, 4)
    mean_tok_len = round_half_up(
        (n_chars - (n_tokens - 1)) / n_tokens, 4
    )  # chars minus single-space separators, over token count
    score = round_half_up(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.5
        + distinct_ratio * 0.3
        + F.when(punct / n_chars < 0.1, 0.2).otherwise(0.0),
        4,
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars_m"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        punct.cast("long").alias("punct_cnt"),
        digits.cast("long").alias("digit_cnt"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality_score"),
    )


def language_votes(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word voting language ID.  Emits one vote column per language
    (count of marker hits) and the argmax with deterministic tie-break
    (language code ascending wins ties)."""
    toks = F.array_distinct(tokenize(text_col))
    vote_cols = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }
    # argmax with lexicographic tie-break: pack (votes, negated-lang-rank)
    best = None
    for lang in sorted(LANG_MARKERS):  # later langs only win with MORE votes
        v = vote_cols[lang]
        if best is None:
            best = F.struct(v.alias("v"), F.lit(lang).alias("lang"))
        else:
            best = F.when(v > best.getField("v"), F.struct(v.alias("v"), F.lit(lang).alias("lang"))).otherwise(best)
    out_cols = [F.col(id_col)] + [
        vote_cols[lang].cast("long").alias(f"votes_{lang}") for lang in sorted(LANG_MARKERS)
    ]
    return df.select(*out_cols, best.getField("lang").alias("lang_pred"))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish regex pieces
    (words / numbers / single symbols)."""
    ws = F.size(tokenize(text_col))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: full-text md5, min/max token-md5 (a 2-hash
    MinHash -- the rolling-hash family), and length.  All string-exact."""
    toks = F.array_distinct(tokenize(text_col))
    tok_hashes = F.transform(toks, lambda t: F.md5(t))
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("full_md5"),
        F.array_min(tok_hashes).alias("min_tok_md5"),
        F.array_max(tok_hashes).alias("max_tok_md5"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_m"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document -- the keyword/feature-
    extraction primitive, expressed entirely in codegen-able DataFrame
    ops (explode -> two aggregations -> window top-k; no Python).

    idf = ln((N+1)/(df_t+1)) (smoothed); score = tf * idf rounded half-up
    at 6dp so ranking ties break identically across engines (term asc is
    the final tie-break).  Shuffles: tokens by (doc, term), terms by term
    for document frequency (broadcast back), docs by id for the top-k
    window -- all map-side-combinable.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("term"),
    )
    n_docs = df.count()
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # Document frequency as a COUNT OVER (PARTITION BY term) on the tf
    # rows (each (doc, term) row is one document containing the term):
    # one linear pipeline -- a separate dfreq aggregate + join would
    # recompute the scan/explode/tf subtree once per branch (or force a
    # cache of it).
    from pyspark.sql import Window as _W

    scored = tf.withColumn(
        "df_t", F.count(F.lit(1)).over(_W.partitionBy("term"))
    ).withColumn(
        "score",
        round_half_up(
            F.col("tf") * F.log((F.lit(n_docs) + 1) / (F.col("df_t") + 1)), 6
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id", "term", "tf", "df_t", "score", F.col("rnk").cast("long").alias("rnk")
        )
    )


def unigram_surprisal(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """CCNet-style language-model quality score with the LM fitted
    IN-PLAN: per-document mean unigram surprisal ``avg(-ln p(tok))``
    under the corpus's own empirical unigram distribution.  Low scores =
    repetitive/boilerplate text, high scores = rare-token noise; both
    tails are what LM-data pipelines gate out (the full CCNet recipe
    swaps the empirical LM for a pretrained KenLM -- the plan shape is
    identical, the probability table is just loaded instead of
    aggregated).

    Three aggregates, all map-side combinable: token frequencies, the
    corpus total (1-row broadcast), and the per-doc mean over a hash join
    on the token -- no Python, no driver data.  Output:
    ``<id>, n_tokens, avg_surprisal`` (6dp; the only float is the final
    mean of ln values, and the oracle replays the same IEEE ops).
    """
    from .dedup import tokenize

    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = freq.agg(F.sum("n").cast("long").alias("tot"))
    scored = freq.crossJoin(F.broadcast(tot)).select(
        "tok", (-F.log(F.col("n") / F.col("tot"))).alias("s")
    )
    return (
        toks.join(scored, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("s"), 6).alias("avg_surprisal"),
        )
    )


def bigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean bigram negative log-probability under the
    corpus's own add-one-smoothed bigram LM -- the next model up from
    ``unigram_surprisal`` in the CCNet-style quality ladder (a real
    pipeline swaps in a pretrained KenLM; the plan shape is identical).

    ``P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 .) + V)`` with V = corpus
    vocabulary size; score = mean over the doc's bigrams of ``-ln P``.

    Determinism: each bigram's ``-ln P`` is quantized to 1e-9 units
    (floor half-up) BEFORE the per-doc mean, so the document sum is
    exact BIGINT arithmetic under ANY partitioning -- unlike a float
    ``avg``, whose partial-sum order is engine- and partition-dependent.
    Only the final sum/count ratio crosses back into doubles.

    Shape: bigrams come from ONE in-row ``arrays_zip(slice, slice)``
    expansion (codegen, no position self-join); then three map-side
    combinable aggregates (bigram counts, context counts, per-doc mean)
    and two hash joins on the bigram/context keys.  The token-array
    frame and the pair frame are keyed/aged caches: without them the
    scan+tokenize pipeline would run once per consumer (four times --
    r8 review finding).  Output: ``<id>, n_bigrams, avg_logprob`` (6dp).
    """
    from .dedup import _cache_aged, tokenize

    toks = _cache_aged(
        "bigram_toks", df.select(F.col(id_col), tokenize(text_col).alias("__ts"))
    )
    n = F.size("__ts")
    pairs = toks.filter(n >= 2).select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice("__ts", 1, n - 1).alias("w1"),
                F.expr("slice(__ts, 2, size(__ts) - 1)").alias("w2"),
            )
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    pairs = _cache_aged("bigram_pairs", pairs)
    vocab = (
        toks.select(F.explode("__ts").alias("t"))
        .agg(F.countDistinct("t").alias("v"))
        .first()["v"]
    )
    cb = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cbg"))
    cw = pairs.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("cctx"))
    p = (F.col("cbg") + 1).cast("double") / (F.col("cctx") + F.lit(vocab)).cast("double")
    scored = cb.join(cw, "w1").select(
        "w1", "w2",
        F.floor(-F.log(p) * 1_000_000_000 + F.lit(0.5)).cast("long").alias("s_fp"),
    )
    agg = (
        pairs.join(scored, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("s_fp").cast("long").alias("sum_fp"),
        )
    )
    avg = F.col("sum_fp").cast("double") / (
        F.col("n_bigrams").cast("double") * 1_000_000_000.0
    )
    return agg.select(id_col, "n_bigrams", round_half_up(avg, 6).alias("avg_logprob"))


def repetition_profile(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, flag_ratio: float = 0.02
) -> DataFrame:
    """C4-style repetition filter feature: per document, the share of
    trigram INSTANCES taken by the single most repeated trigram
    (multiset counts -- NOT the deduped shingle sets the Jaccard family
    uses; repetition is precisely what dedup throws away).  Boilerplate
    and looping generations show a dominant repeated n-gram; natural
    prose stays near 1/n_grams.

    Pure codegen: one in-row window expansion (no distinct), one
    (doc, gram) count, one per-doc max/sum rollup; ratios exact via the
    floor half-up formula.  Output: ``<id>, n_grams, top_count,
    rep_ratio, is_repetitive`` (flag as int for portable hashing).
    """
    from .dedup import tokenize

    toks = df.select(F.col(id_col), tokenize(text_col).alias("__ts"))
    idx = F.sequence(F.lit(0), F.size("__ts") - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at("__ts", (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    g = toks.filter(F.size("__ts") >= n).select(
        F.col(id_col), F.explode(grams).alias("g")
    )
    counts = g.groupBy(id_col, "g").agg(F.count(F.lit(1)).cast("long").alias("c"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.max("c").cast("long").alias("top_count"),
    )
    ratio = round_half_up(
        F.col("top_count").cast("double") / F.col("n_grams").cast("double"), 6
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "top_count",
        ratio.alias("rep_ratio"),
        (ratio >= flag_ratio).cast("long").alias("is_repetitive"),
    )


def vocab_oov_stats(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 500
) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build the top-``vocab_size``
    corpus vocabulary (count desc, token asc -- total order, so the
    boundary is deterministic), then score every document's
    out-of-vocabulary exposure: ``n_tokens, n_oov, oov_rate`` (6dp
    half-up, the shared cross-engine rounding).  The go/no-go check
    before committing a tokenizer: a corpus slice with high OOV under
    the deployed vocab wastes tokens as bytes/UNKs.

    Scale shape: ONE token explode feeds both the vocabulary aggregate
    (map-side-combinable count, top-V via TakeOrdered -- never a global
    sort) and the per-doc scoring; the vocabulary is broadcast (<= V
    rows) so scoring adds no shuffle beyond the per-doc groupBy."""
    from .dedup import _cache_aged

    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("tok"))
    toks = _cache_aged("vocab_toks", toks)
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("__in_vocab"))
    )
    per = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
    rate = round_half_up(
        F.col("n_oov") / F.col("n_tokens").cast("double"), 6
    )
    return per.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "n_oov",
        rate.alias("oov_rate"),
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS scheme): hash every ``k``-token shingle, slide a window of
    ``w`` consecutive shingle hashes, and select each window's minimum
    (ties -> RIGHTMOST position, the standard rule that makes selections
    stable under context shifts).  The guarantee: any token run long
    enough to span ``w + k - 1`` tokens shares at least one selected
    fingerprint between two documents -- the local dedup/plagiarism
    primitive between exact hashing (too brittle) and MinHash (global,
    positionless).

    Implementation is position-arithmetic over the token ARRAY:

      1. shingles come from ``transform(sequence(...))`` over the
         tokenized array (codegen, per-row);
      2. each shingle EXPLODES into the <= ``w`` window ids that cover
         it (``sequence(greatest(pos-w+1, 0), least(pos, last_anchor))``)
         -- the blowup is bounded by ``w`` per shingle, O(n*w) total,
         NEVER an anchors-x-members product (a 20k-shingle document
         would otherwise materialize ~4e8 joined rows in one
         doc-keyed partition; r10 review finding);
      3. one groupBy (doc, window) takes ``min(struct(hash, -pos))`` --
         lexicographic struct ordering IS the rightmost-argmin rule
         (minimal hash, then maximal position) in a single map-side-
         combinable aggregate, no re-join;
      4. DISTINCT collapses windows that picked the same (hash, pos).

    Documents with fewer than ``w`` shingles fall back to one whole-doc
    window (the BETWEEN join clamps), so every non-empty document
    yields at least one fingerprint.  Hashes are the shared 60-bit
    portable base hash: the DuckDB oracle replays every selection
    bit-for-bit.

    Output: ``id_col, fp, n_positions, first_pos`` -- one row per
    distinct selected fingerprint per document."""
    from .dedup import portable_base_hash, tokenize

    toks = df.select(F.col(id_col), tokenize(text_col).alias("__t"))
    sh = toks.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, greatest(size(__t) - {k}, 0)), "
                f"i -> concat_ws(' ', slice(__t, i + 1, {k})))"
            )
        ).alias("pos", "__sh"),
    ).select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        portable_base_hash(F.col("__sh")).alias("__h"),
    )
    from pyspark.sql import Window

    shm = sh.withColumn(
        "__last", F.max("pos").over(Window.partitionBy(id_col)) - (w - 1)
    )
    cov = shm.select(
        F.col(id_col),
        "pos",
        "__h",
        F.explode(
            F.expr(
                f"sequence(greatest(pos - {w - 1}, 0L), "
                f"least(pos, greatest(__last, 0L)))"
            )
        ).alias("s"),
    )
    sel = (
        cov.groupBy(id_col, "s")
        .agg(
            F.min(
                F.struct(F.col("__h").alias("h"), (-F.col("pos")).alias("np"))
            ).alias("__m")
        )
        .select(
            F.col(id_col),
            F.col("__m.h").alias("fp"),
            (-F.col("__m.np")).alias("__selpos"),
        )
    )
    return (
        sel.distinct()
        .groupBy(id_col, "fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_positions"),
            F.min("__selpos").cast("long").alias("first_pos"),
        )
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topn: int = 20,
) -> DataFrame:
    """BM25 retrieval: rank documents against a bag-of-terms query with
    the Robertson/Lucene scoring function --

        idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        s(d, t) = idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    -- the production ranking TF-IDF approximates.  Determinism across
    engines: every float CONSTANT is materialized in Python and inlined
    via repr (shortest round-trip, so both engines parse the identical
    double); each term's contribution is rounded half-up to MICRO units
    (floor(x*1e6+0.5) as BIGINT) BEFORE the per-document sum, so the
    score is a BIGINT sum -- float addition order across terms can
    never flip a ranking.  Output: ``id, score_fp (micro), n_hit_terms``
    for the top ``topn`` docs (score desc, id asc).

    Scale shape: the token explode filters to the query vocabulary
    immediately (a query has tens of terms; the surviving rows are a
    sliver of the corpus), per-term document frequency rides the tf
    rows as one COUNT window, N/avgdl is a single broadcast scalar,
    and the final top-n is TakeOrdered -- no global sort."""
    from pyspark.sql import Window

    from .dedup import tokenize

    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    kp1 = repr(k1 + 1.0)
    kb = repr(k1 * b)
    k1mb = repr(k1 * (1.0 - b))  # k1*(1-b+b*dl/avgdl) = k1mb + kb*dl/avgdl

    base = df.select(
        F.col(id_col), F.size(tokenize(text_col)).cast("long").alias("__dl"),
        tokenize(text_col).alias("__toks"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("__N"),
        F.sum("__dl").cast("long").alias("__L"),
    )
    tok = base.select(
        F.col(id_col), "__dl", F.explode("__toks").alias("term")
    ).filter(F.col("term").isin(query_terms))
    tf = tok.groupBy(id_col, "__dl", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    tf = tf.withColumn(
        "df_t", F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long")
    )
    scored = tf.crossJoin(F.broadcast(stats)).withColumn(
        "__term_fp",
        F.expr(
            f"CAST(FLOOR("
            f"  ln(1.0D + (CAST(__N - df_t AS DOUBLE) + 0.5D) / (CAST(df_t AS DOUBLE) + 0.5D))"
            f"  * (CAST(tf AS DOUBLE) * CAST({kp1} AS DOUBLE))"
            f"  / (CAST(tf AS DOUBLE) + CAST({k1mb} AS DOUBLE)"
            f"     + CAST({kb} AS DOUBLE) * CAST(__dl AS DOUBLE)"
            f"       / (CAST(__L AS DOUBLE) / CAST(__N AS DOUBLE)))"
            f"  * 1000000.0D + 0.5D) AS BIGINT)"
        ),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("__term_fp").cast("long").alias("score_fp"),
            F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        )
        .orderBy(F.desc("score_fp"), F.asc(id_col))
        .limit(topn)
    )


def kl_source_drift(
    df: DataFrame, source_col: str, text_col: str
) -> DataFrame:
    """Dataset-drift audit: KL divergence of each source's unigram
    token distribution from the whole-corpus distribution,
    ``KL(P_s || P_corpus) = sum_t p_s(t) * ln(p_s(t) / p_c(t))`` --
    the number a training-data pipeline watches to catch one ingest
    source wandering off-distribution (every token in a source also
    appears in the corpus, so p_c > 0 and the sum is well-defined;
    KL >= 0 with 0 iff the source matches the corpus mix exactly).

    Determinism across engines: each TERM contribution is rounded
    half-up to NANO units (floor(x*1e9+0.5) as BIGINT) before the
    per-source sum -- the same order-stable fixed-point discipline as
    ``bm25_topk`` -- so float addition order over thousands of terms
    can never change the reported divergence.

    Scale shape: one token explode -> one (source, term) count; the
    per-term corpus count and per-source token total ride the SAME
    aggregated rows as two window sums (no second scan of the corpus);
    the corpus total broadcasts as a single scalar.  Output one row
    per source: ``source, n_tokens, n_terms, kl_nano``."""
    from pyspark.sql import Window

    from .dedup import tokenize

    st = (
        df.select(F.col(source_col), F.explode(tokenize(text_col)).alias("term"))
        .groupBy(source_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
    )
    from .dedup import _cache_aged

    # Cached: the tot scalar and the scored branch both read st -- an
    # uncached frame would re-run the corpus explode + aggregate twice
    # (r10 review finding).
    st = _cache_aged("kl_st", st)
    st = st.withColumn(
        "c_t", F.sum("c_st").over(Window.partitionBy("term")).cast("long")
    ).withColumn(
        "n_s", F.sum("c_st").over(Window.partitionBy(source_col)).cast("long")
    )
    tot = st.agg(F.sum("c_st").cast("long").alias("__N"))
    scored = st.crossJoin(F.broadcast(tot)).withColumn(
        "__term_fp",
        F.expr(
            "CAST(FLOOR("
            "  (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
            "  * ln((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
            "       / (CAST(c_t AS DOUBLE) / CAST(__N AS DOUBLE)))"
            "  * 1000000000.0D + 0.5D) AS BIGINT)"
        ),
    )
    return scored.groupBy(source_col).agg(
        F.max("n_s").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("__term_fp").cast("long").alias("kl_nano"),
    )


def phrase_search(
    df: DataFrame, id_col: str, text_col: str, phrases: list[str]
) -> DataFrame:
    """Positional-index phrase search: build term postings ``(term,
    doc, pos)`` ONCE, then resolve each phrase as an adjacency chain
    -- term_i at position p + i for every i -- the way an inverted
    index with positions answers quoted queries (the retrieval
    primitive BM25's bag-of-terms scoring cannot express).

    Scale shape: the postings explode filters immediately to the
    phrase vocabulary (a few terms), is cached once across phrases,
    and each adjacency step is an equi-join on (doc, pos+i) carrying
    (doc, pos) pairs only.  Matches are exact and deterministic.

    Output: ``phrase, id, n_matches, first_pos`` -- one row per
    (phrase, document) with at least one occurrence."""
    from functools import reduce

    from .dedup import _cache_aged, tokenize

    if not phrases:
        raise ValueError("phrase_search needs at least one phrase")
    # Phrase terms go through the SAME normalization as the postings
    # (tokenize lowercases): a raw 'Key Order' must match, not silently
    # miss; an empty/whitespace phrase must fail loudly, not IndexError
    # (r10 review finding).
    terms_by_phrase = [p.lower().split() for p in phrases]
    for p_raw, ts in zip(phrases, terms_by_phrase):
        if not ts:
            raise ValueError(f"phrase_search: empty phrase {p_raw!r}")
    vocab = sorted({t for ts in terms_by_phrase for t in ts})
    post = (
        df.select(
            F.col(id_col),
            F.posexplode(tokenize(text_col)).alias("pos", "term"),
        )
        .filter(F.col("term").isin(vocab))
        .select(id_col, F.col("pos").cast("long").alias("pos"), "term")
    )
    post = _cache_aged("phrase_postings", post)
    outs = []
    for phrase, terms in zip(phrases, terms_by_phrase):
        cur = post.filter(F.col("term") == terms[0]).select(id_col, "pos")
        for i, t in enumerate(terms[1:], start=1):
            nxt = post.filter(F.col("term") == t).select(
                id_col, (F.col("pos") - i).alias("pos")
            )
            cur = cur.join(nxt, [id_col, "pos"])
        outs.append(
            cur.groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_matches"),
                F.min("pos").cast("long").alias("first_pos"),
            )
            .select(F.lit(phrase).alias("phrase"), id_col, "n_matches", "first_pos")
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: list[str],
    topn: int = 20,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are the
    maximal stopword-free token runs; each word scores ``deg/freq``
    (deg = sum of the lengths of the phrases its occurrences sit in,
    freq = its occurrence count); a phrase scores the sum of its words'
    scores -- the classic cheap keyword extractor a corpus-triage
    pipeline runs before anything neural.

    Determinism: deg and freq are exact BIGINT counts; each WORD score
    rounds half-up to micro units by integer div BEFORE the phrase sum
    (the order-stable fixed-point discipline), so identical phrase
    texts always carry identical BIGINT scores and the top-n is
    reproducible (ties break on phrase text).

    Scale shape: one posexplode; phrase ids are a per-doc running
    stopword count (window clustered on the doc id); word stats are one
    map-side-combinable vocab aggregate broadcast back onto the phrase
    members; the phrase rebuild groups (doc, phrase) -- bounded by
    phrase length -- and the final top-n is TakeOrderedAndProject.

    Output: ``phrase, n_words, n_occurrences, score_micro`` (top
    ``topn`` by score desc, phrase asc).
    """
    from pyspark.sql import Window

    from .dedup import _cache_aged, tokenize

    if not stopwords:
        raise ValueError("rake_keywords needs a stopword list")
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(tokenize(text_col)).alias("pos", "term"),
    )
    w_doc = (
        Window.partitionBy("__doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = toks.withColumn(
        "__grp",
        F.sum(F.when(F.col("term").isin(stopwords), 1).otherwise(0)).over(
            w_doc
        ),
    ).filter(~F.col("term").isin(stopwords))
    members = marked.withColumn(
        "__plen",
        F.count(F.lit(1))
        .over(Window.partitionBy("__doc", "__grp"))
        .cast("long"),
    )
    members = _cache_aged("rake_members", members)
    words = members.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("__plen").cast("long").alias("deg"),
    )
    scored = words.select(
        "term",
        F.expr(
            "CAST((2 * deg * 1000000 + freq) DIV (2 * freq) AS BIGINT)"
        ).alias("w_micro"),
    )
    phrases = (
        members.join(F.broadcast(scored), "term")
        .groupBy("__doc", "__grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "term"))),
                    lambda x: x["term"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("w_micro").cast("long").alias("score_micro"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.max("n_words").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score_micro").cast("long").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc("phrase"))
        .limit(topn)
    )


def jsd_source_drift(df: DataFrame, source_col: str, text_col: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the whole-corpus distribution -- the symmetric, bounded
    ([0, ln 2]) sibling of ``kl_source_drift``, the number to alarm on
    when a source must be compared against others on one scale (KL is
    unbounded and asymmetric, so per-source KLs are not comparable).

    JSD(P_s || C) = 0.5*KL(P_s || M) + 0.5*KL(C || M), M = (P_s + C)/2.
    Terms ABSENT from the source still contribute -- there p = 0 and the
    term reduces to 0.5 * c * ln 2 -- so instead of materializing the
    full source x vocabulary cross (a blowup the KL shape never pays),
    the absent-term mass is folded CLOSED-FORM: it sums to
    0.5 * ln 2 * (1 - sum_{t in s} c_t / N), computable from the same
    in-source rows.  The in-source contributions are quantized half-up
    to NANO units per term before the per-source sum and the closed-form
    tail is quantized once -- the same order-stable fixed-point
    discipline as ``kl_source_drift``, so float addition order can never
    change the reported divergence.

    Scale shape: identical to ``kl_source_drift`` -- one token explode,
    one (source, term) aggregate (cached: the corpus total and the
    scored branch both read it), corpus/term/source totals as window
    sums on those same rows, corpus total broadcast as one scalar.

    Output one row per source: ``source, n_tokens, n_terms, jsd_nano``.
    """
    from pyspark.sql import Window

    from .dedup import _cache_aged, tokenize

    st = (
        df.select(F.col(source_col), F.explode(tokenize(text_col)).alias("term"))
        .groupBy(source_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
    )
    st = _cache_aged("jsd_st", st)
    st = st.withColumn(
        "c_t", F.sum("c_st").over(Window.partitionBy("term")).cast("long")
    ).withColumn(
        "n_s", F.sum("c_st").over(Window.partitionBy(source_col)).cast("long")
    )
    tot = st.agg(F.sum("c_st").cast("long").alias("__N"))
    scored = st.crossJoin(F.broadcast(tot)).withColumn(
        "__term_fp",
        F.expr(
            "CAST(FLOOR(("
            " 0.5D * (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
            "   * ln((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
            "        / ((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)"
            "            + CAST(c_t AS DOUBLE) / CAST(__N AS DOUBLE))"
            "           / 2.0D))"
            " + 0.5D * (CAST(c_t AS DOUBLE) / CAST(__N AS DOUBLE))"
            "   * ln((CAST(c_t AS DOUBLE) / CAST(__N AS DOUBLE))"
            "        / ((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE)"
            "            + CAST(c_t AS DOUBLE) / CAST(__N AS DOUBLE))"
            "           / 2.0D))"
            ") * 1000000000.0D + 0.5D) AS BIGINT)"
        ),
    )
    agg = scored.groupBy(source_col).agg(
        F.max("n_s").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("__term_fp").cast("long").alias("__in_fp"),
        F.sum("c_t").cast("long").alias("__cov"),
        F.max("__N").cast("long").alias("__N"),
    )
    return agg.select(
        source_col,
        "n_tokens",
        "n_terms",
        (
            F.col("__in_fp")
            + F.expr(
                "CAST(FLOOR(0.5D * ln(2.0D)"
                " * (CAST(__N - __cov AS DOUBLE) / CAST(__N AS DOUBLE))"
                " * 1000000000.0D + 0.5D) AS BIGINT)"
            )
        )
        .cast("long")
        .alias("jsd_nano"),
    )
