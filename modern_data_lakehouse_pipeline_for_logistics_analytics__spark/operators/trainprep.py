"""Training-corpus preparation operators (north-star extension): the
stages a large-scale LLM-data pipeline runs BETWEEN raw text and
training shards that the dedup/similarity families don't cover --
benchmark decontamination, C4-style span dedup, Gopher-style quality
gates, and fixed-size token chunking.

All built-in string/array/window expressions -- whole-stage-codegen'd,
no Python on any hot path; every output is a pure deterministic function
of the text, reproducible across engines (each operator has an exact
DuckDB oracle in ``plans/trainprep.py``).

Scale notes (100 TB corpus):
- decontamination joins corpus n-grams against the BENCHMARK n-gram set,
  which is tiny (eval sets are at most a few hundred MB) -> the
  benchmark side broadcasts and the corpus pass is map-side only (one
  shuffle for the per-doc overlap count, carrying 8-byte hashes, never
  text);
- span dedup shuffles (span_hash) rows -- the hash, not the span text --
  and the reassembly groupBy is the same shuffle width;
- quality gates and chunking are narrow (zero shuffles): pure per-row
  expressions, so they pipeline into whatever scan feeds them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_base_hash, tokenize, word_shingles


def _safe_shingles(toks: F.Column, n: int) -> F.Column:
    """word_shingles guarded for docs shorter than ``n`` tokens (the raw
    sequence() would run backwards and index element 0, which throws)."""
    return F.when(F.size(toks) >= n, word_shingles(toks, n)).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate_ngrams(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its distinct
    word ``n``-grams appear ANYWHERE in the benchmark (eval) set.

    The training-data hygiene step every serious pipeline runs: a corpus
    document sharing long n-grams with a benchmark leaks test data into
    training.  Join key is the 60-bit portable hash of the n-gram (8-byte
    shuffle rows; SQL-replayable), benchmark side is globally distinct
    and broadcast.  Docs shorter than ``n`` tokens have no n-grams and
    report 0 overlap.  Output: ``doc_id, n_overlap, contaminated``.
    """
    c_sh = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(_safe_shingles(tokenize(text_col), n)).alias("s"),
    ).select("doc_id", portable_base_hash(F.col("s")).alias("h"))
    b_sh = (
        benchmark.select(F.explode(_safe_shingles(tokenize(text_col), n)).alias("s"))
        .select(portable_base_hash(F.col("s")).alias("h"))
        .distinct()
    )
    hits = c_sh.join(F.broadcast(b_sh), "h", "left_semi")
    n_overlap = (
        hits.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    all_docs = corpus.select(F.col(id_col).alias("doc_id"))
    return all_docs.join(n_overlap, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
    )


def quality_gates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 40,
    max_tokens: int = 100_000,
    min_mean_tok_len: float = 2.0,
    max_mean_tok_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 1,
) -> DataFrame:
    """Gopher-style per-document quality gates: token-count bounds, mean
    token length bounds, symbol-to-char ratio cap, minimum stopword hits.

    Each gate is its own boolean column so a pipeline can inspect WHY a
    document failed (the aggregate pass rate per gate is the standard
    corpus-health dashboard); ``passes`` is their conjunction.  All
    arithmetic is integer counts or 4dp half-up-rounded ratios --
    bit-identical across engines.  Output: ``doc_id, n_tokens,
    mean_tok_len, symbol_ratio, n_stop_hits, gate_len, gate_tok_len,
    gate_symbols, gate_stops, passes``.
    """
    from .textstats import round_half_up

    stops = ["the", "a", "of", "to", "and", "in", "is"]
    toks = tokenize(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    symbols = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    mean_tok_len = round_half_up((n_chars - (n_tokens - 1)) / n_tokens, 4)
    symbol_ratio = round_half_up(symbols / n_chars, 4)
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in stops])))
    gate_len = (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    gate_tok_len = (mean_tok_len >= min_mean_tok_len) & (mean_tok_len <= max_mean_tok_len)
    gate_symbols = symbol_ratio <= max_symbol_ratio
    gate_stops = n_stop >= min_stop_hits
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        symbol_ratio.alias("symbol_ratio"),
        n_stop.cast("long").alias("n_stop_hits"),
        gate_len.alias("gate_len"),
        gate_tok_len.alias("gate_tok_len"),
        gate_symbols.alias("gate_symbols"),
        gate_stops.alias("gate_stops"),
        (gate_len & gate_tok_len & gate_symbols & gate_stops).alias("passes"),
    )


def span_dedup(
    df: DataFrame, id_col: str, text_col: str, span: int = 10
) -> DataFrame:
    """C4-style global span dedup: split each document into non-overlapping
    ``span``-token windows, keep only the FIRST occurrence of each
    distinct span across the whole corpus (ordered by doc then position),
    and reassemble the surviving text per document.

    This is the repetition/boilerplate removal stage (C4 dropped
    duplicate three-sentence spans corpus-wide).  The dedup window
    partitions on the 60-bit span hash -- the shuffle carries
    ``(hash, doc, span_no)`` rows, never the span text twice -- and
    survivor choice is deterministic (lowest ``(doc, span_no)`` wins).
    Output: ``doc_id, n_spans, n_kept, kept_text``.
    """
    toks = tokenize(text_col)
    n_spans = F.ceil(F.size(toks) / F.lit(span)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * span + 1, span)),
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(spans).alias("span_no", "span_text")
    ).withColumn("h", portable_base_hash(F.col("span_text")))
    w = Window.partitionBy("h").orderBy(F.asc("doc_id"), F.asc("span_no"))
    kept = exploded.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("span_no"), F.col("span_text")))
                ),
                lambda s: s.getField("span_text"),
            ),
        ).alias("kept_text"),
    )
    totals = df.select(
        F.col(id_col).alias("doc_id"),
        F.ceil(F.size(tokenize(text_col)) / F.lit(span)).cast("long").alias("n_spans"),
    )
    return totals.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_spans",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("kept_text"), F.lit("")).alias("kept_text"),
    )


def chunk_documents(
    df: DataFrame, id_col: str, text_col: str, chunk_tokens: int = 16
) -> DataFrame:
    """Fixed-size token chunking: split each document into consecutive
    ``chunk_tokens``-token pieces (trailing partial chunk kept) -- the
    shard-preparation step before tokenizer packing.

    Narrow (ZERO shuffles): sequence + slice + posexplode are all per-row
    expressions, so chunking pipelines directly into the scan and the
    downstream writer controls output partitioning.  Output: ``doc_id,
    chunk_no, n_tokens, chunk_text``.
    """
    toks = tokenize(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * chunk_tokens + 1, chunk_tokens),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_no", "chunk_toks"),
    ).select(
        "doc_id",
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.size(F.col("chunk_toks")).cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("chunk_toks")).alias("chunk_text"),
    )
