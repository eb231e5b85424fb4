"""Training-corpus preparation operators: semantics the oracle hash can't
express as readably -- planted contamination is found, gates fail for the
right reasons, span dedup removes exactly the repeated spans, chunking
reassembles losslessly."""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
    chunk_documents,
    decontaminate_ngrams,
    quality_gates,
    span_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_finds_planted_overlap(spark):
    """A corpus doc embedding a verbatim benchmark 5-gram is flagged with
    the right overlap count; clean docs and too-short docs report 0."""
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(
        spark,
        [
            # shares the 5-grams "alpha..epsilon" and "beta..zeta" -> 2
            (1, "intro words alpha beta gamma delta epsilon zeta trailing"),
            (2, "completely different words with no overlap at all here"),
            (3, "too short"),  # < 5 tokens: no n-grams at all
        ],
    )
    out = {r.doc_id: r for r in decontaminate_ngrams(corpus, bench, "doc_id", "text", n=5).collect()}
    assert out[1].n_overlap == 2 and out[1].contaminated
    assert out[2].n_overlap == 0 and not out[2].contaminated
    assert out[3].n_overlap == 0 and not out[3].contaminated


def test_quality_gates_fail_reasons(spark):
    """Each gate trips independently and `passes` is their conjunction."""
    long_ok = "the quick brown fox jumps over a lazy dog near the river " * 5
    docs = _docs(
        spark,
        [
            (1, long_ok.strip()),                      # passes everything
            (2, "the short one"),                      # fails gate_len only
            (3, ("the " + "!@#$% " * 40).strip()),     # symbol ratio blown
            (4, ("zzz " * 50).strip()),                # no stopwords
        ],
    )
    out = {r.doc_id: r for r in quality_gates(docs, "doc_id", "text").collect()}
    assert out[1].passes
    assert not out[2].gate_len and out[2].gate_stops and not out[2].passes
    assert not out[3].gate_symbols and not out[3].passes
    assert not out[4].gate_stops and not out[4].passes


def test_span_dedup_removes_repeats(spark):
    """Corpus-wide: the SECOND doc repeating a 10-token span loses it,
    the first keeps it; within-doc order of survivors is preserved."""
    span_a = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    span_b = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    span_c = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    docs = _docs(
        spark,
        [
            (1, f"{span_a} {span_b}"),
            (2, f"{span_c} {span_a}"),  # span_a repeats -> doc 2 keeps only c
        ],
    )
    out = {r.doc_id: r for r in span_dedup(docs, "doc_id", "text", span=10).collect()}
    assert out[1].n_spans == 2 and out[1].n_kept == 2
    assert out[1].kept_text == f"{span_a} {span_b}"
    assert out[2].n_spans == 2 and out[2].n_kept == 1
    assert out[2].kept_text == span_c


def test_chunk_documents_lossless(spark):
    """Chunks reassemble to the tokenized text, sizes are chunk_tokens
    except a trailing partial, chunk_no is dense from 0."""
    text = " ".join(f"w{i}" for i in range(37))
    docs = _docs(spark, [(7, text)])
    rows = sorted(
        chunk_documents(docs, "doc_id", "text", chunk_tokens=16).collect(),
        key=lambda r: r.chunk_no,
    )
    assert [r.chunk_no for r in rows] == [0, 1, 2]
    assert [r.n_tokens for r in rows] == [16, 16, 5]
    assert " ".join(r.chunk_text for r in rows) == text
