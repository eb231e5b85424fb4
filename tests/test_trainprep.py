"""Training-corpus preparation operators: semantics the oracle hash can't
express as readably -- planted contamination is found, gates fail for the
right reasons, span dedup removes exactly the repeated spans, chunking
reassembles losslessly."""

from __future__ import annotations

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
    chunk_documents,
    decontaminate_ngrams,
    pack_sequences,
    quality_gates,
    span_dedup,
    token_budget_sample,
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


def test_pack_sequences_covers_stream_exactly(spark):
    """The emitted spans tile the concatenated token stream with no gaps
    or overlaps: every window except the last carries exactly
    window_tokens tokens, per-doc spans cover each document once, and the
    distributed offsets match a locally computed cumsum."""
    rows = [(i, " ".join(f"d{i}w{j}" for j in range(5 + (i * 7) % 23))) for i in range(40)]
    docs = _docs(spark, rows)
    W = 16
    out = pack_sequences(docs, "doc_id", "text", window_tokens=W).collect()
    # per-window totals: every window full except possibly the last
    per_window: dict = {}
    per_doc: dict = {}
    for r in out:
        per_window[r.window_id] = per_window.get(r.window_id, 0) + r.n_toks
        per_doc.setdefault(r.doc_id, []).append(r)
    n_total = sum(len(t.split()) for _, t in rows)
    assert sorted(per_window) == list(range(max(per_window) + 1))
    for wid, tot in per_window.items():
        assert tot == (W if wid < max(per_window) else n_total - W * max(per_window))
    # per-doc spans: contiguous from 0 to the doc's token count
    for (doc_id, text) in rows:
        spans = sorted(per_doc[doc_id], key=lambda r: r.tok_start)
        assert spans[0].tok_start == 0
        pos = 0
        for s in spans:
            assert s.tok_start == pos
            pos += s.n_toks
        assert pos == len(text.split())


def test_token_budget_sample_quota_semantics(spark):
    """Each group's selected set: deterministic across runs, starts
    before the budget line (overshoot at most ONE doc), and unselected
    docs all start at/after it."""
    from pyspark.sql import Row

    rows = [
        Row(doc_id=i, text=" ".join(f"w{j}" for j in range(10)), grp=f"g{i % 3}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows)
    out = token_budget_sample(docs, "doc_id", "text", "grp", budget_tokens=55).collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r.group, []).append(r)
    for g, rs in by_group.items():
        sel = [r for r in rs if r.selected]
        unsel = [r for r in rs if not r.selected]
        assert all(r.cum_before < 55 for r in sel)
        assert all(r.cum_before >= 55 for r in unsel)
        # 10-token docs, budget 55 -> exactly 6 selected (overshoot one doc)
        assert len(sel) == 6
    again = {
        (r.doc_id, r.selected)
        for r in token_budget_sample(docs, "doc_id", "text", "grp", budget_tokens=55).collect()
    }
    assert again == {(r.doc_id, r.selected) for r in out}


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


def test_quality_gates_empty_text_no_crash(spark):
    """Empty text (the exact garbage a gate filters) must flow through as
    a failed row, never DIVIDE_BY_ZERO under ANSI mode."""
    docs = _docs(spark, [(1, ""), (2, "the quick brown fox " * 15)])
    out = {r.doc_id: r for r in quality_gates(docs, "doc_id", "text").collect()}
    assert out[1].symbol_ratio == 0.0 and not out[1].passes
    assert out[2].passes


def test_token_budget_sample_keeps_null_groups(spark):
    """Docs with a NULL group must not silently vanish (the equi-join on
    raw group keys would drop them); they form their own quota group."""
    from pyspark.sql import Row

    rows = [Row(doc_id=i, text="w1 w2 w3 w4 w5", grp=None if i % 2 else "g") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = token_budget_sample(docs, "doc_id", "text", "grp", budget_tokens=12)
    rows_out = out.collect()
    assert len(rows_out) == 10
    nulls = [r for r in rows_out if r.group is None]
    assert len(nulls) == 5
    # 5-token docs, budget 12 -> 3 selected per group (third starts at 10 < 12)
    assert sum(1 for r in nulls if r.selected) == 3


def test_knuth_hash_large_ids_no_overflow(spark):
    """Snowflake-scale ids must neither overflow under ANSI nor desync
    from the SQL twin ((id % 2^31) * K) % 2^31."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        knuth_hash,
    )

    big = 1_600_000_000_000_000_000
    df = spark.createDataFrame([(big,), (7,)], "doc_id long")
    got = {r.doc_id: r.h for r in df.select("doc_id", knuth_hash(F.col("doc_id")).alias("h")).collect()}
    for i in (big, 7):
        assert got[i] == ((i % 2**31) * 2654435761) % 2**31
        assert 0 <= got[i] < 2**31


def _pack_reference(rows, W):
    """Exhaustive reference: concatenate tokens in doc_id order, cut into
    W-token windows, emit (window_id, doc_id, tok_start, n_toks)."""
    out, off = [], 0
    for doc_id, text in sorted(rows):
        n = len(text.split())
        first_w, last_w = off // W, (off + n - 1) // W
        for wid in range(first_w, last_w + 1):
            lo, hi = max(off, wid * W), min(off + n, (wid + 1) * W)
            out.append((wid, doc_id, lo - off, hi - lo))
        off += n
    return sorted(out)


def test_pack_sequences_property_vs_reference(spark):
    """Property sweep: the distributed two-phase prefix sum must equal the
    exhaustive single-threaded reference for arbitrary doc sizes, sparse/
    duplicate-free ids, and window sizes -- including windows larger than
    the whole stream and single-token docs."""
    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    sizes_s = st.lists(st.integers(min_value=1, max_value=9), min_size=1, max_size=8)
    ids_s = st.lists(st.integers(min_value=0, max_value=50), min_size=8, max_size=8, unique=True)
    w_s = st.sampled_from([1, 3, 7, 64])

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(sizes=sizes_s, ids=ids_s, W=w_s)
    def run(sizes, ids, W):
        rows = [(ids[i], " ".join(f"t{ids[i]}x{j}" for j in range(n))) for i, n in enumerate(sizes)]
        docs = _docs(spark, rows)
        got = sorted(
            (r.window_id, r.doc_id, r.tok_start, r.n_toks)
            for r in pack_sequences(docs, "doc_id", "text", window_tokens=W).collect()
        )
        assert got == _pack_reference(rows, W)

    run()


def _span_dedup_reference(rows, span):
    """Exhaustive reference: global first-occurrence span dedup in
    (doc_id, span_no) order."""
    seen, out = set(), {}
    for doc_id, text in sorted(rows):
        toks = text.lower().split()
        spans = [
            " ".join(toks[i * span : (i + 1) * span])
            for i in range((len(toks) + span - 1) // span or 1)
        ]
        kept = []
        for s in spans:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        out[doc_id] = (len(spans), len(kept), " ".join(kept))
    return out


def test_span_dedup_property_vs_reference(spark):
    """Property sweep: arbitrary corpora with planted repeats must match
    the exhaustive single-threaded reference exactly -- including docs
    losing ALL spans and span sizes that don't divide doc lengths."""
    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    # Small word alphabet forces cross-doc span collisions.
    word_s = st.sampled_from(["w1", "w2", "w3"])
    doc_s = st.lists(word_s, min_size=1, max_size=9).map(" ".join)
    corpus_s = st.lists(doc_s, min_size=1, max_size=6)
    span_s = st.sampled_from([2, 3, 10])

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=corpus_s, span=span_s)
    def run(texts, span):
        rows = list(enumerate(texts))
        got = {
            r.doc_id: (r.n_spans, r.n_kept, r.kept_text)
            for r in span_dedup(_docs(spark, rows), "doc_id", "text", span=span).collect()
        }
        assert got == _span_dedup_reference(rows, span)

    run()


# ------------------------------------------------------------ BPE encode
def test_bpe_encode_stats_hand_case(spark):
    # corpus: srcA = "aaab aaab ab", srcB = "ab b"
    # word freqs: aaab x2, ab x2, b x1.
    # round 1 pairs: (a,a)=4, (a,b)=4, (b,</w>)=5 -> merge (b,</w>).
    # round 2 pairs: (a,a)=4, (a,b</w>)=4 -> tie, lexicographic ->
    # merge (a,a) greedily (leftmost wins in 'aaa' run).
    # encodings after 2 rounds: aaab=[aa,a,b</w>] (3), ab=[a,b</w>] (2),
    # b=[b</w>] (1).
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        bpe_encode_stats,
    )

    df = spark.createDataFrame(
        [("srcA", "aaab aaab ab"), ("srcB", "ab b")],
        "source string, text string",
    )
    rows = {r["source"]: r for r in bpe_encode_stats(
        df, "text", "source", rounds=2
    ).collect()}
    a, b = rows["srcA"], rows["srcB"]
    # srcA: 3 words (aaab x2, ab x1), tokens 2*3+2=8, chars 2*4+2=10
    assert (a["n_words"], a["n_tokens"], a["n_chars"]) == (3, 8, 10)
    assert a["tokens_per_word_micro"] == (2 * 8 * 1000000 + 3) // 6
    assert a["chars_per_token_micro"] == (2 * 10 * 1000000 + 8) // 16
    # srcB: 2 words (ab, b), tokens 2+1=3, chars 2+1=3
    assert (b["n_words"], b["n_tokens"], b["n_chars"]) == (2, 3, 3)
    assert b["tokens_per_word_micro"] == 1500000
    assert b["chars_per_token_micro"] == 1000000


def test_bpe_encode_one_round_counts_merged_marker_tokens(spark):
    # rounds=1 merges (b,</w>): 'b' encodes to the single token 'b</w>'
    # (a merged marker symbol COUNTS; a bare marker would not).
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        bpe_encode_stats,
    )

    df = spark.createDataFrame(
        [("s", "aaab aaab ab"), ("t", "ab b")],
        "source string, text string",
    )
    rows = {r["source"]: r for r in bpe_encode_stats(
        df, "text", "source", rounds=1
    ).collect()}
    # aaab=[a,a,a,b</w>] (4), ab=[a,b</w>] (2), b=[b</w>] (1)
    assert rows["s"]["n_tokens"] == 2 * 4 + 2
    assert rows["t"]["n_tokens"] == 2 + 1
