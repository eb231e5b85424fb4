"""Semantics of the r13 training-data operators, beyond oracle parity:
DSIR weights must rank target-domain docs above off-domain ones,
temperature quotas must sum exactly to the budget and compress the share
range, and keep-longest survivorship must pick the longest cluster
member with deterministic ties."""

from pyspark.sql import functions as F

from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.trainprep import (
    dsir_logratio_weights,
    source_temperature_quota,
)


def _corpus(spark):
    # Two vocabularies: target docs speak "alpha beta gamma", raw docs
    # speak "delta epsilon zeta"; one mixed doc.
    rows = [
        (1, "alpha beta gamma alpha beta", "t"),
        (2, "beta gamma alpha gamma", "t"),
        (3, "delta epsilon zeta delta", "r"),
        (4, "zeta epsilon delta zeta epsilon", "r"),
        (5, "alpha delta", "r"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, dom string")


def test_dsir_orders_target_domain_first(spark):
    out = {
        r.doc_id: r
        for r in dsir_logratio_weights(
            _corpus(spark), "doc_id", "text", target_pred=F.col("dom") == "t"
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].n_tokens == 5
    # Target-vocabulary docs must score strictly above raw-vocabulary docs;
    # the mixed doc lands in between.
    per_tok = {d: out[d].weight_nano / out[d].n_tokens for d in out}
    assert min(per_tok[1], per_tok[2]) > per_tok[5] > max(per_tok[3], per_tok[4])


def test_dsir_weight_is_integer_sum_of_bucket_ratios(spark):
    # A doc made of one repeated token must weigh exactly n * (the
    # single-token doc's weight): integer fixed-point, no float drift.
    rows = [(1, "omega", "t"), (2, "omega omega omega omega", "t"), (3, "other", "r")]
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    out = {
        r.doc_id: r.weight_nano
        for r in dsir_logratio_weights(
            df, "doc_id", "text", target_pred=F.col("dom") == "t"
        ).collect()
    }
    assert out[2] == 4 * out[1]


def test_temperature_quota_sums_to_budget_and_compresses(spark):
    rows = (
        [(i, "tok " * 100, "big") for i in range(60)]
        + [(100 + i, "tok " * 10, "mid") for i in range(20)]
        + [(200 + i, "tok", "small") for i in range(5)]
    )
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, source string"
    )
    out = {
        r.group: r
        for r in source_temperature_quota(
            df, "doc_id", "text", "source", alpha=0.3, budget_docs=1000
        ).collect()
    }
    assert sum(r.quota for r in out.values()) == 1000
    # alpha < 1 compresses: the big source's quota share must be far
    # below its raw token share; the small source's far above.
    tokens = {g: out[g].n_tokens for g in out}
    tot = sum(tokens.values())
    assert out["big"].quota / 1000 < tokens["big"] / tot
    assert out["small"].quota / 1000 > tokens["small"] / tot
    # Monotone: more tokens never means a smaller quota.
    assert out["big"].quota > out["mid"].quota > out["small"].quota


def test_temperature_alpha_one_recovers_proportional(spark):
    rows = [(1, "a " * 30, "x"), (2, "b " * 10, "y")]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows], "doc_id long, text string, source string"
    )
    out = {
        r.group: r.quota
        for r in source_temperature_quota(
            df, "doc_id", "text", "source", alpha=1.0, budget_docs=100
        ).collect()
    }
    assert out == {"x": 75, "y": 25}


def test_keep_longest_survivor_policy(spark, sf_dir):
    """Registered-query invariants on the fixture: one survivor per
    cluster, survivor length >= every member's length, singletons kept
    verbatim, and the keep-list size equals the cluster count."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        connected_components,
        minhash_portable_lsh,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.dedup import (
        q_dedup_keep_longest_survivor,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = q_dedup_keep_longest_survivor(spark, sf_dir).collect()
    assert len(kept) == len({r.canonical for r in kept})  # one per cluster

    pairs = minhash_portable_lsh(docs, "doc_id", "text", threshold=0.7)
    cc = {r.doc: r.canonical for r in connected_components(pairs).collect()}
    chars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    by_cluster: dict = {}
    for d in chars:
        by_cluster.setdefault(cc.get(d, d), []).append(d)
    assert len(kept) == len(by_cluster)
    for r in kept:
        members = by_cluster[r.canonical]
        assert r.n_members == len(members)
        best = max(members, key=lambda d: (chars[d], -d))
        assert r.kept_doc == best and r.kept_chars == chars[best]


def test_retention_funnel_invariants(spark, sf_dir):
    """Funnel monotonicity and cross-query consistency: each stage count
    is bounded by n_docs, n_final is bounded by every single gate, and
    the per-source totals reconcile with the standalone queries."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.trainprep import (
        q_corpus_retention_funnel,
        q_decontaminate,
        q_quality_gates,
    )

    rows = q_corpus_retention_funnel(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_docs
        for stage in (r.n_quality, r.n_unique, r.n_clean):
            assert 0 <= stage <= r.n_docs
        assert r.n_final <= min(r.n_quality, r.n_unique, r.n_clean)
        # Two separate invariants (r13 advice: `==` binds before `or`,
        # so the old one-liner was vacuously true whenever both counts
        # were nonzero): tokens vanish iff docs vanish, and every
        # surviving doc carries at least one token.
        assert (r.tokens_final == 0) == (r.n_final == 0)
        if r.n_final:
            assert r.tokens_final >= r.n_final

    # Totals reconcile with the standalone stage queries (corpus split).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_ids = {r.doc_id for r in docs.filter("doc_id % 23 <> 0").select("doc_id").collect()}
    assert sum(r.n_docs for r in rows) == len(corpus_ids)
    qg = {r.doc_id: r.passes for r in q_quality_gates(spark, sf_dir).collect()}
    assert sum(r.n_quality for r in rows) == sum(qg[d] for d in corpus_ids)
    cont = {r.doc_id: r.contaminated for r in q_decontaminate(spark, sf_dir).collect()}
    assert sum(r.n_clean for r in rows) == sum(1 - cont[d] for d in corpus_ids)


def test_zipf_audit_values(spark):
    """Hand-checkable corpus: 'a' x 8, 'b' x 4, 'c' x 2, 'd' x 1 -> exact
    counts/ratios, hapax = 1 type ('d'), and the slope equals the same
    micro fixed-point OLS computed independently in Python (geometric
    freqs over ln-rank x: steeper than -1)."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans.trainprep import (
        q_zipf_vocabulary_audit,
    )
    import math

    rows = [(1, "a a a a a a a a"), (2, "b b b b c c"), (3, "d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = q_zipf_vocabulary_audit(spark, d).collect()[0]
    assert (out.n_tokens, out.n_types, out.hapax_types) == (15, 4, 1)
    assert out.ttr_micro == (4 * 1_000_000) // 15
    assert out.hapax_share_micro == 250_000
    # freq = 8,4,2,1 at ranks 1..4: ln(freq) = ln8 - (rk-1)ln2, and
    # x = ln(rk) is NOT linear in rk, so compute the exact micro OLS
    # the operator defines and compare.
    pts = [(int(math.log(rk) * 1e6 + 0.5), int(math.log(f) * 1e6 + 0.5))
           for rk, f in [(1, 8), (2, 4), (3, 2), (4, 1)]]
    k = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    expect = math.floor((k * sxy - sx * sy) / (k * sxx - sx * sx) * 1e6 + 0.5)
    assert out.zipf_slope_micro == expect
    assert -2_000_000 < out.zipf_slope_micro < -1_000_000  # steeper than -1: geometric freqs
