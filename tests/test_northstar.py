"""Quality tests for the north-star operators (SURVEY.md section 7.1):
properties the DuckDB oracle cannot check -- LSH recall against brute
force, SimHash candidate recovery, multimodal schema/failure contracts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_minhash_lsh_recall(docs):
    """Every true near-dup pair (exact Jaccard >= 0.7) must be recovered by
    the MinHash-LSH pipeline -- with 32 perms / 8 bands, P(miss) for
    j >= 0.7 is (1 - 0.7^4)^8 ~= 9% per pair; the fixture's planted pairs
    are j >= 0.9 where P(miss) < 0.2%, so full recall is expected."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_dedup,
    )

    truth = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.7).collect()
    }
    assert truth, "fixture should contain planted near-duplicates"
    missed = truth - found
    assert len(missed) <= max(1, len(truth) // 10), f"LSH missed {len(missed)}/{len(truth)}"


def test_portable_minhash_recall_and_determinism(docs):
    """The portable (SQL-replicable) MinHash variant must recover planted
    near-dups like the blake2b variant -- same 32/8 banding, so the same
    P(miss) bound -- and must be run-to-run deterministic (its whole point
    is that an external engine can recompute it bit-for-bit)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        jaccard_pairs,
        minhash_portable_lsh,
    )

    truth = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in minhash_portable_lsh(docs, "doc_id", "text", threshold=0.7).collect()
    }
    assert truth, "fixture should contain planted near-duplicates"
    missed = truth - found
    assert len(missed) <= max(1, len(truth) // 10), f"LSH missed {len(missed)}/{len(truth)}"

    again = {
        (r.doc_a, r.doc_b)
        for r in minhash_portable_lsh(docs, "doc_id", "text", threshold=0.7).collect()
    }
    assert found == again


def test_portable_band_buckets_jvm_only_after_shingles(spark):
    """Everything past shingling in the portable pipeline is JVM built-ins:
    exactly ONE Python stage (the shingle mapInPandas) appears in the
    physical plan -- the signature aggregation, banding and bucket digests
    must not add Arrow round-trips.  Uses a fresh in-memory frame so a
    sibling test's cached shingle frame (whose InMemoryRelation text also
    says MapInPandas) can't distort the count."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        minhash_portable_band_buckets,
    )

    fresh = spark.createDataFrame(
        [(i, f"alpha beta gamma delta plan shape doc {i}") for i in range(10)],
        "doc_id long, text string",
    )
    plan = (
        minhash_portable_band_buckets(fresh, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1, plan
    assert "EvalPython" not in plan and "FlatMapGroupsInPandas" not in plan, plan
    # One shuffle total: the signature groupBy(doc).  Banding is a
    # Generate over the aggregated row -- no second Exchange.
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_portable_simhash_recovers_planted_neardups(docs):
    """Portable SimHash: planted near-dups (Jaccard >= 0.9 -> tiny
    Hamming distance on shared-shingle votes) must surface as verified
    candidates, and the candidate set must be run-to-run deterministic
    (the property its SQL oracle depends on)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        jaccard_pairs,
        simhash_portable_candidates,
        simhash_portable_signatures,
    )

    truth = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    }
    sigs = simhash_portable_signatures(docs, "doc_id", "text")
    found = {
        (r.doc_a, r.doc_b) for r in simhash_portable_candidates(sigs).collect()
    }
    assert truth, "fixture should contain planted near-duplicates"
    missed = truth - found
    assert len(missed) <= max(1, len(truth) // 4), f"missed {len(missed)}/{len(truth)}"

    again = {
        (r.doc_a, r.doc_b) for r in simhash_portable_candidates(sigs).collect()
    }
    assert found == again


def test_portable_hyperplane_recall_and_determinism(emb):
    """Portable hyperplane LSH mirrors the float-plane variant's bar: the
    fixture's pairs sit at cosine 0.4-0.6 (the hardest band for sign-LSH;
    48 planes / 12 bands of 4 -> per-pair miss ~3-13%), so recall must be
    >= 75%, every returned pair must BE an exact pair with identical 6dp
    cosine, and the result must be run-to-run deterministic (the property
    its SQL oracle relies on)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        cosine_pairs_above,
        hyperplane_portable_pairs,
    )

    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_pairs_above(emb, "vec_id", "embedding", threshold=0.4).collect()
    }
    assert exact, "fixture should contain near-dup embedding pairs"
    found = {
        (r.id_a, r.id_b): r.cos_sim
        for r in hyperplane_portable_pairs(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    assert set(found) <= set(exact), "portable LSH produced a non-exact pair"
    for k, v in found.items():
        assert abs(exact[k] - v) < 1e-12
    missed = set(exact) - set(found)
    assert len(missed) <= max(1, len(exact) // 4), f"missed {len(missed)}/{len(exact)}"

    again = {
        (r.id_a, r.id_b)
        for r in hyperplane_portable_pairs(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    assert set(found) == again


def test_portable_ann_topk_subset_of_bruteforce(emb):
    """Portable LSH ANN: every (query, neighbor) it returns must appear in
    the brute-force result with the SAME cosine, per-query results are
    capped at k, and the output is run-to-run deterministic.  (Recall is
    bucket-bound by construction; correctness here is subset+value
    fidelity -- the SQL oracle pins the exact candidate set.)"""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        cosine_topk,
        lsh_portable_topk,
    )
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(emb, queries, "vec_id", "embedding", k=1000).collect()
    }
    approx = [
        r for r in lsh_portable_topk(emb, queries, "vec_id", "embedding", k=10).collect()
    ]
    assert approx, "portable ANN returned nothing"
    per_query: dict = {}
    for r in approx:
        per_query.setdefault(r.query_id, []).append(r)
        key = (r.query_id, r.neighbor_id)
        assert key in brute and abs(brute[key] - r.cos_sim) < 1e-12
    for rows in per_query.values():
        assert len(rows) <= 10
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))

    again = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in lsh_portable_topk(emb, queries, "vec_id", "embedding", k=10).collect()
    }
    assert {(r.query_id, r.neighbor_id, r.rank) for r in approx} == again


def test_training_prep_lsh_matches_exact_path(spark, sf_dir):
    """The LSH-path training prep must produce the SAME splits as the
    exact-pair flagship on the fixture: portable MinHash-LSH recall is
    1.0 for the planted near-dups here (pinned by the recall tests), so
    the two compositions remove identical duplicate sets."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans import QUERIES

    exact = {
        (r.split, r.n_docs, r.sum_doc_ids)
        for r in QUERIES["docs_training_prep"](spark, sf_dir).collect()
    }
    lsh = {
        (r.split, r.n_docs, r.sum_doc_ids)
        for r in QUERIES["docs_training_prep_lsh"](spark, sf_dir).collect()
    }
    assert exact == lsh


def test_simhash_recovers_planted_neardups(docs):
    """Planted near-dups (Jaccard >= 0.9) have near-identical token sets,
    so their SimHashes agree on at least one 16-bit chunk almost surely."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        jaccard_pairs,
        simhash_candidate_pairs,
        simhash_signatures,
    )

    truth = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    }
    sigs = simhash_signatures(docs, "doc_id", "text")
    cands = {(r.doc_a, r.doc_b) for r in simhash_candidate_pairs(sigs).collect()}
    missed = truth - cands
    assert len(missed) <= max(1, len(truth) // 5), f"SimHash missed {len(missed)}/{len(truth)}"


def test_connected_components_match_union_find(docs):
    """Spark label propagation must produce exactly the components a
    driver-side union-find computes from the same pairs."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
    )

    pairs = jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    edge_list = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    assert edge_list

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edge_list:
        union(a, b)
    want = {x: find(x) for x in parent}

    got = {r.doc: r.canonical for r in connected_components(pairs).collect()}
    assert got == want


def test_simhash_deterministic(docs):
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        simhash_signatures,
    )

    a = {(r.doc, r.simhash) for r in simhash_signatures(docs, "doc_id", "text").collect()}
    b = {(r.doc, r.simhash) for r in simhash_signatures(docs, "doc_id", "text").collect()}
    assert a == b


def test_lsh_topk_consistent_with_bruteforce(emb):
    """LSH ANN returns a subset of the brute-force candidate space with
    identical cosine values for any (query, neighbor) pair both report."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
    )

    queries = emb.filter(F.col("vec_id") < 5)
    brute = cosine_topk(emb, queries, "vec_id", "embedding", k=500)
    brute_map = {(r.query_id, r.neighbor_id): r.cos_sim for r in brute.collect()}
    approx = lsh_topk(emb, queries, "vec_id", "embedding", k=10, n_planes=8).collect()
    assert approx, "LSH should return same-bucket candidates"
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in brute_map:
            assert abs(brute_map[key] - r.cos_sim) < 1e-9


def test_ivf_topk_recall(emb):
    """IVF with nprobe=4/16 must recover a solid share of the true top-10
    (embeddings are near-orthogonal random vectors -- the hardest case for
    coarse quantization -- so the bar is recall@10 >= 0.3 and exact
    cosine agreement on everything returned)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    queries = emb.filter(F.col("vec_id") < 5)
    brute = cosine_topk(emb, queries, "vec_id", "embedding", k=10)
    truth = {}
    for r in brute.collect():
        truth.setdefault(r.query_id, {})[r.neighbor_id] = r.cos_sim
    approx = ivf_topk(emb, queries, "vec_id", "embedding", k=10, n_clusters=16, nprobe=4)
    rows = approx.collect()
    assert rows
    hits = total = 0
    for r in rows:
        if r.neighbor_id in truth.get(r.query_id, {}):
            hits += 1
            assert abs(truth[r.query_id][r.neighbor_id] - r.cos_sim) < 1e-9
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.3, f"IVF recall@10 too low: {hits}/{total}"


def test_ivf_portable_topk_subset_and_determinism(emb):
    """Portable IVF (Knuth-sampled integer centroids): everything returned
    must appear in brute force with the SAME cosine, ranks must be dense
    per query, probing must actually prune (candidates < full corpus per
    query unless nprobe == n_clusters), and two runs must agree
    bit-for-bit (the property the SQL oracle hash-verifies)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        cosine_topk,
        ivf_portable_topk,
    )

    queries = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(emb, queries, "vec_id", "embedding", k=1000).collect()
    }
    rows = ivf_portable_topk(
        emb, queries, "vec_id", "embedding", k=10, n_clusters=16, nprobe=4
    ).collect()
    assert rows, "portable IVF returned nothing"
    per_query: dict = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r)
        key = (r.query_id, r.neighbor_id)
        assert key in brute and abs(brute[key] - r.cos_sim) < 1e-12
    for q_rows in per_query.values():
        assert len(q_rows) <= 10
        assert sorted(r.rank for r in q_rows) == list(range(1, len(q_rows) + 1))
    again = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in ivf_portable_topk(
            emb, queries, "vec_id", "embedding", k=10, n_clusters=16, nprobe=4
        ).collect()
    }
    assert again == {(r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in rows}


def test_lsh_neardup_recall_vs_exact(emb):
    """Banded-LSH near-dup pairs: everything returned must BE an exact
    pair with an identical cosine (same threshold + same exact verify =>
    zero false positives), and recall must clear the regime's theoretical
    bound.  The fixture's pairs all sit at cosine 0.4-0.6 (angle 53-66
    degrees) -- the hardest band for sign-LSH: per-pair miss is
    (1 - p^4)^12 ~ 3-12% (p = 1 - angle/pi), so the bar is >= 75% recall.
    Production near-dup thresholds (>= 0.7) put the same config under 2%
    miss."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.similarity import (
        cosine_pairs_above,
        lsh_neardup_pairs,
    )

    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_pairs_above(emb, "vec_id", "embedding", threshold=0.4).collect()
    }
    assert exact, "fixture should contain near-dup embedding pairs"
    approx = {
        (r.id_a, r.id_b): r.cos_sim
        for r in lsh_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.4, n_bands=12
        ).collect()
    }
    assert set(approx) <= set(exact), "LSH produced a pair the exact operator lacks"
    for k, v in approx.items():
        assert abs(exact[k] - v) < 1e-12
    missed = set(exact) - set(approx)
    assert len(missed) <= max(1, len(exact) // 4), f"LSH missed {len(missed)}/{len(exact)}"


def _pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def test_multimodal_decode_contract(spark, sf_dir):
    """Decode stage: stable schema, ok-status stub decodes with plausible
    dims, unknown mime and unavailable decoder produce status rows, not
    task failures.  image/png payloads here are fake text bytes, so the
    expected status depends on the environment: PIL absent ->
    decoder_unavailable (soft import degrades); PIL present ->
    decode_error (real decoder rejects non-PNG bytes)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.multimodal import (
        DECODED_SCHEMA,
        attach_binary_payload,
        decode_media,
    )

    png_status = "decode_error" if _pil_available() else "decoder_unavailable"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = attach_binary_payload(docs, "doc_id", "text")
    # Mix in an unknown mime and a real-codec mime (fed fake bytes).
    # (r13: video/mp4 gained a real soft-imported decoder, so the
    # unknown-mime case needs a mime no decoder claims.)
    media = media.withColumn(
        "mime",
        F.when(F.col("doc_id") % 10 == 0, "application/x-unknown")
        .when(F.col("doc_id") % 10 == 1, "image/png")
        .otherwise(F.col("mime")),
    )
    out = decode_media(media)
    assert out.schema == DECODED_SCHEMA
    rows = out.collect()
    assert len(rows) == 50
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, []).append(r)
    assert "ok" in by_status and "unknown_mime" in by_status and png_status in by_status
    for r in by_status["ok"]:
        assert 64 <= r.width < 256 and 64 <= r.height < 256 and r.n_bytes > 0
    for r in by_status["unknown_mime"] + by_status[png_status]:
        assert r.width is None and r.height is None


def test_multimodal_real_png_decode(spark):
    """Skip-gated: with PIL installed, the image/png decoder resolves PIL
    inside the Python worker and returns real dimensions for a real PNG."""
    import pytest

    if not _pil_available():
        pytest.skip("PIL not installed in this environment")
    import base64

    # Smallest valid 1x1 PNG (public-domain bytes, RGBA).
    png_1x1 = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk"
        "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.multimodal import (
        decode_media,
    )

    media = spark.createDataFrame(
        [(1, "image/png", bytearray(png_1x1))], "doc_id long, mime string, content binary"
    )
    row = decode_media(media).collect()[0]
    assert row.status == "ok" and row.width == 1 and row.height == 1


def test_multimodal_wav_decode(spark):
    """REAL audio decode (stdlib wave -- always available, no skip gate):
    a generated 8 kHz stereo WAV yields channels/sample_rate/duration_ms
    from the header while image fields stay null; truncated WAV bytes hit
    the decode_error branch instead of failing the task."""
    import io
    import wave

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.multimodal import (
        decode_media,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01" * 2 * 4000)  # 4000 stereo frames = 500 ms
    wav = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "audio/wav", bytearray(wav)), (2, "audio/wav", bytearray(wav[:16]))],
        "doc_id long, mime string, content binary",
    )
    rows = {r.doc_id: r for r in decode_media(media).collect()}
    ok = rows[1]
    assert ok.status == "ok"
    assert ok.channels == 2 and ok.sample_rate == 8000 and ok.duration_ms == 500
    assert ok.width is None and ok.height is None
    assert rows[2].status == "decode_error"


def test_multimodal_decode_error_branch_and_batching(spark, sf_dir):
    """Every status branch fires (including decode_error from a decoder
    that raises mid-payload), and the Arrow batch size only changes HOW
    the work is chunked, never the result -- the scale-realistic contract
    (bounded memory per batch; corrupt payloads at 100 TB are a
    certainty, and one must never fail a task)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators import (
        multimodal,
    )

    def _boom(payload: bytes):
        raise ValueError("corrupt payload")

    def _absent(payload: bytes):
        raise NotImplementedError("codec not installed")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    media = multimodal.attach_binary_payload(docs, "doc_id", "text").withColumn(
        "mime",
        F.when(F.col("doc_id") % 4 == 0, "image/corrupt")
        # r13: video/mp4 gained a real decoder; unknown-mime needs a
        # mime no registry entry claims.
        .when(F.col("doc_id") % 4 == 1, "application/x-unknown")
        .when(F.col("doc_id") % 4 == 2, "image/uninstalled")
        .otherwise(F.col("mime")),
    )
    decoders = dict(multimodal.DECODERS)
    decoders["image/corrupt"] = _boom  # by-value registry: ships in the closure
    decoders["image/uninstalled"] = _absent  # env-independent unavailable branch
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        baseline = {
            (r.doc_id, r.status, r.width)
            for r in multimodal.decode_media(media, decoders).collect()
        }
        statuses = {s for _, s, _ in baseline}
        assert statuses == {"ok", "unknown_mime", "decoder_unavailable", "decode_error"}
        # tiny Arrow batches -> many decode_batches invocations, same rows
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = {
            (r.doc_id, r.status, r.width)
            for r in multimodal.decode_media(media, decoders).collect()
        }
        assert small == baseline
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_lsh_hot_bucket_cap(spark):
    """The hot-bucket guard drops over-full band buckets from candidate
    generation (size^2 blow-up control); uncapped output is unchanged."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    rows = [(d, 0, 999) for d in range(10)] + [(100, 1, 7), (101, 1, 7)]
    banded = spark.createDataFrame(rows, "doc long, band_no int, bucket long")
    uncapped = lsh_candidate_pairs(banded)
    assert uncapped.count() == 45 + 1  # C(10,2) from the hot bucket + 1
    capped = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(banded, max_bucket_size=5).collect()}
    assert capped == {(100, 101)}


def test_connected_components_string_ids(spark):
    """String doc ids must converge to the lexicographic-min canonical --
    the old sum(canonical) fixpoint either CAST-crashed on strings (ANSI)
    or silently exited after one round unconverged (None == None).  The
    length-8 chain needs >1 propagation round, so an early exit would
    leave the tail pointing at an intermediate label."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        connected_components,
    )

    chain = [(f"d{i}", f"d{i+1}") for i in range(7)]
    pairs = spark.createDataFrame(chain + [("x", "y")], "doc_a string, doc_b string")
    got = {r.doc: r.canonical for r in connected_components(pairs).collect()}
    assert got == {**{f"d{i}": "d0" for i in range(8)}, "x": "x", "y": "x"}


def test_minhash_lsh_degenerate_corpus_bounded(spark):
    """A boilerplate corpus (hundreds of identical docs -> every band
    bucket holds them all) must complete with a bounded candidate count:
    the flagship ``minhash_lsh_dedup`` wires the hot-bucket guard in BY
    DEFAULT, dropping over-full buckets.  The dropped docs are byte-equal,
    which exact dedup upstream collapses -- that's the documented recall
    trade."""
    import inspect

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        exact_dedup_groups,
        minhash_lsh_dedup,
    )

    # Guard is on by default in the flagship entry point.
    default = inspect.signature(minhash_lsh_dedup).parameters["max_bucket_size"].default
    assert default is not None and default > 0

    boiler = [(i, "the same boilerplate text repeated for every single doc here") for i in range(300)]
    near = [
        (1000, "a genuinely unique document about spark execution plans and shuffles"),
        (1001, "a genuinely unique document about spark execution plans and exchanges"),
    ]
    docs = spark.createDataFrame(boiler + near, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5, max_bucket_size=100).collect()
    }
    # The 300-doc hot bucket contributes zero of its C(300,2) pairs; the
    # genuine near-dup pair survives in its own small bucket.
    assert pairs == {(1000, 1001)}
    # ...and exact dedup still collapses the boilerplate docs.
    groups = exact_dedup_groups(docs, "doc_id", "text")
    assert groups.filter(F.col("n_copies") == 300).count() == 1


def test_simhash_cache_ages_out(spark):
    """The signatures cache is bounded to ONE frame per session: a call
    over a different input unpersists the superseded cache, while a
    repeat call over the same plan keeps it (CacheManager reuse)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators import (
        dedup as dmod,
    )

    docs_a = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    docs_b = spark.createDataFrame(
        [(i, f"epsilon zeta eta theta doc {i}") for i in range(20)],
        "doc_id long, text string",
    )

    sigs_a = dmod.simhash_signatures(docs_a, "doc_id", "text")
    dmod.simhash_candidate_pairs(sigs_a).count()
    first = dmod._sig_caches["simhash64"]
    assert first is not None and first.storageLevel.useMemory

    # Same logical plan -> cache kept (no unpersist, reuse preserved).
    dmod.simhash_candidate_pairs(sigs_a).count()
    assert first.storageLevel.useMemory

    # Different input -> superseded cache released.
    sigs_b = dmod.simhash_signatures(docs_b, "doc_id", "text")
    dmod.simhash_candidate_pairs(sigs_b).count()
    assert not first.storageLevel.useMemory
    assert dmod._sig_caches["simhash64"].storageLevel.useMemory


def test_jaccard_shingle_cache_ages_out(spark):
    """jaccard_pairs' shingle cache is bounded to ONE frame per session:
    a call over a different corpus releases the superseded cache instead
    of pinning shingle frames forever (the pre-r6 bench leak)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators import (
        dedup as dmod,
    )

    docs_a = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    docs_b = spark.createDataFrame(
        [(i, f"zeta eta theta iota kappa doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    dmod.jaccard_pairs(docs_a, "doc_id", "text", threshold=0.5).count()
    first = dmod._sig_caches["jaccard_sh"]
    assert first.storageLevel.useMemory
    dmod.jaccard_pairs(docs_b, "doc_id", "text", threshold=0.5).count()
    assert not first.storageLevel.useMemory
    assert dmod._sig_caches["jaccard_sh"].storageLevel.useMemory


def _scenario_jaccard(dmod, docs):
    dmod.jaccard_pairs(docs, "doc_id", "text", threshold=0.5).count()


def _scenario_simhash64(dmod, docs):
    dmod.simhash_candidate_pairs(dmod.simhash_signatures(docs, "doc_id", "text")).count()


def _scenario_simhash_portable(dmod, docs):
    dmod.simhash_portable_candidates(
        dmod.simhash_portable_signatures(docs, "doc_id", "text")
    ).count()


def _scenario_minhash_portable(dmod, docs):
    # Also exercises verify_cands / verify_sh via jaccard_verify_pairs.
    dmod.minhash_portable_lsh(docs, "doc_id", "text", threshold=0.3).count()


def _scenario_trainprep(dmod, docs):
    # pack_src / budget_src keys live in trainprep but age through the
    # same registry.
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
        pack_sequences,
        token_budget_sample,
    )

    pack_sequences(docs, "doc_id", "text", window_tokens=16).count()
    token_budget_sample(docs, "doc_id", "text", "doc_id", budget_tokens=50).count()


@pytest.mark.parametrize(
    "scenario",
    [
        _scenario_jaccard,
        _scenario_simhash64,
        _scenario_simhash_portable,
        _scenario_minhash_portable,
        _scenario_trainprep,
    ],
    ids=["jaccard_sh", "simhash64", "simhash_portable", "minhash_portable+verify",
         "pack_src+budget_src"],
)
def test_sig_caches_age_on_new_corpus(spark, scenario):
    """EVERY keyed signature cache ages: running an operator family over
    corpus A then corpus B must unpersist each superseded keyed frame and
    pin the replacement -- the generalization of the r5/r6 per-key leak
    regressions to the whole ``_sig_caches`` registry (a new key added
    without aging discipline fails here as soon as a scenario covers
    it)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators import (
        dedup as dmod,
    )

    docs_a = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    docs_b = spark.createDataFrame(
        [(i, f"zeta eta theta iota kappa doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    scenario(dmod, docs_a)
    snap = dict(dmod._sig_caches)
    assert snap, "scenario populated no signature caches"
    scenario(dmod, docs_b)
    superseded = [
        k
        for k, prev in snap.items()
        if dmod._sig_caches.get(k) is not None and dmod._sig_caches[k] is not prev
    ]
    assert superseded, "corpus B superseded no cache entries"
    for k in superseded:
        assert not snap[k].storageLevel.useMemory, f"{k}: superseded frame still pinned"
        assert dmod._sig_caches[k].storageLevel.useMemory, f"{k}: replacement not cached"


def test_release_caches_unpins_everything(spark):
    """release_caches() (the bench/batch-session boundary) unpersists and
    clears every registry entry so pinned storage returns to the
    execution pool between unrelated workloads."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators import (
        dedup as dmod,
    )

    docs = spark.createDataFrame(
        [(i, f"lambda mu nu xi omicron doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    dmod.jaccard_pairs(docs, "doc_id", "text", threshold=0.5).count()
    held = dict(dmod._sig_caches)
    assert held
    released = dmod.release_caches()
    assert released == len(held)
    assert not dmod._sig_caches
    for k, df in held.items():
        assert not df.storageLevel.useMemory, f"{k} still pinned after release"


def test_spread_skips_wide_input(spark, tmp_path):
    """_spread must NOT add an Exchange when the input is already wide --
    at 100 TB the corpus arrives as thousands of files, and a forced
    repartition would full-shuffle the raw text for nothing.  A narrow
    scan (one file) still gets spread.  The width probe must be pure plan
    inspection: no .rdd access (materializes AQE stages), no job."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        _spread,
    )

    par = spark.sparkContext.defaultParallelism

    # Non-scan frames (in-memory / post-shuffle) pass through untouched.
    mem = spark.range(0, 1000, 1, numPartitions=par).selectExpr(
        "id as doc", "cast(id as string) as text"
    )
    assert _spread(mem) is mem  # pass-through: no new plan node at all

    # A single-file parquet scan is under-partitioned -> spread to target.
    p = str(tmp_path / "narrow")
    mem.coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    assert len(narrow.inputFiles()) == 1
    assert _spread(narrow).rdd.getNumPartitions() == par

    # Projections above the scan must not hide the leaf file count.
    assert _spread(narrow.select("doc", "text")).rdd.getNumPartitions() == par

    # Explicit caller hint overrides plan inspection both ways.
    assert _spread(mem, n_partitions=1).rdd.getNumPartitions() == par
    assert _spread(narrow, n_partitions=par) is narrow

    # A shuffle-producing node above a narrow scan means the frame is
    # already at shuffle width -- no redundant repartition (r6 ADVICE:
    # the file-count estimate alone would report width 1 here).
    agged = narrow.groupBy("text").count()
    assert _spread(agged) is agged
    joined = narrow.join(mem.select("doc"), "doc")
    assert _spread(joined) is joined

    # A CACHED shuffled frame optimizes to InMemoryRelation (the shuffle
    # nodes vanish from the plan) and has no input files -- it must still
    # pass through rather than eat a redundant full repartition.
    cached = narrow.groupBy("text").count().cache()
    try:
        cached.count()  # materialize so the InMemoryRelation substitutes
        assert _spread(cached) is cached
    finally:
        cached.unpersist()


def test_sig_cache_concurrent_pipelines(spark):
    """The cache registries must survive concurrent pipelines: two threads
    interleaving dedup calls over DIFFERENT inputs plus a releaser thread
    hammering release_caches().  Correctness must hold in every thread
    (cache thrash costs recomputes, never wrong results) and the registry
    must end empty and consistent -- the r7 single-threaded assumption,
    now a lock-backed guarantee."""
    import threading

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators import (
        dedup as dmod,
    )

    docs_a = spark.createDataFrame(
        [(i, f"alpha beta gamma delta doc {i % 5}") for i in range(30)],
        "doc_id long, text string",
    )
    docs_b = spark.createDataFrame(
        [(i, f"omega psi chi phi doc {i % 7}") for i in range(30)],
        "doc_id long, text string",
    )
    errors: list = []
    expected = {}
    for tag, docs in (("a", docs_a), ("b", docs_b)):
        expected[tag] = dmod.jaccard_pairs(docs, "doc_id", "text", threshold=0.9).count()
    dmod.release_caches()

    def worker(tag, docs):
        try:
            for _ in range(3):
                got = dmod.jaccard_pairs(docs, "doc_id", "text", threshold=0.9).count()
                assert got == expected[tag], f"{tag}: {got} != {expected[tag]}"
        except Exception as exc:  # noqa: BLE001 -- surface in main thread
            errors.append(exc)

    def releaser():
        try:
            for _ in range(6):
                dmod.release_caches()
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=worker, args=("a", docs_a)),
        threading.Thread(target=worker, args=("b", docs_b)),
        threading.Thread(target=releaser),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    dmod.release_caches()
    assert not dmod._sig_caches and not dmod._pinned_finals


def test_pii_udtf_lateral_and_python_api(spark):
    """Spark 4 UDTF: variable rows per input row, via both the Python
    call form and a SQL LATERAL join; rows with no matches vanish (no
    null padding)."""
    from pyspark.sql import functions as F

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.udfs import (
        pii_matches_udtf,
    )

    PiiMatches = pii_matches_udtf()
    got = PiiMatches(F.lit("mail a.b@example.com or call 555-123-4567 now")).collect()
    assert {(r.kind, r.value) for r in got} == {
        ("email", "a.b@example.com"),
        ("phone", "555-123-4567"),
    }
    assert all(r.pos >= 0 for r in got)

    spark.udtf.register("pii_matches", PiiMatches)
    docs = spark.createDataFrame(
        [(1, "reach me at x@y.org"), (2, "nothing sensitive here")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("pii_docs")
    rows = spark.sql(
        "SELECT doc_id, m.kind, m.value FROM pii_docs, LATERAL pii_matches(text) m"
    ).collect()
    assert {(r.doc_id, r.kind, r.value) for r in rows} == {(1, "email", "x@y.org")}
