"""Similarity-search plans over the ``embeddings`` fixture (north-star).

Oracle cosine is computed in float64 via unnest (DuckDB's builtin
``list_cosine_similarity`` accumulates in float32 and cannot hash-match a
float64 engine); 6dp rounding absorbs summation-order ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    cosine_pairs_above,
    cosine_topk,
    hyperplane_portable_pairs,
    ivf_portable_topk,
    ivf_topk,
    lsh_neardup_pairs,
    lsh_portable_topk,
    lsh_topk,
    portable_planes,
)
from .registry import register, table_path

_COS_CTE = """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    nrm AS (SELECT vec_id, SQRT(SUM(v * v)) AS n FROM e GROUP BY 1)
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, "embeddings"))


@register(
    "embedding_neardup_pairs",
    oracle=_COS_CTE
    + """
    , dot AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.v * b.v) AS d
      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, ROUND(d / (na.n * nb.n), 6) AS cos_sim
    FROM dot JOIN nrm na ON na.vec_id = id_a JOIN nrm nb ON nb.vec_id = id_b
    WHERE ROUND(d / (na.n * nb.n), 6) >= 0.4
    """,
)
def q_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= 0.4): brute-force exact stage.
    At scale this runs per LSH bucket, not on all pairs."""
    return cosine_pairs_above(_emb(spark, sf_dir), "vec_id", "embedding", threshold=0.4)


@register("embedding_neardup_lsh")  # hash-derived planes -> rows-only
def q_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane LSH + exact verify
    on candidates only -- the path that replaces the all-pairs product at
    100 TB.  Recall vs the exact operator is measured in
    tests/test_northstar.py."""
    return lsh_neardup_pairs(
        _emb(spark, sf_dir), "vec_id", "embedding", threshold=0.4, n_bands=12
    )


def _portable_sig_ctes(n_planes: int = 48, bands: int = 12, dim: int = 64) -> str:
    """Shared CTE chain pl/e/q/dots/sig/bnd for the portable hyperplane
    oracles: integer quantization -> integer plane dots (coefficients
    injected from ``portable_planes``, single source with the Spark
    operator; NOTE the +1 on the dimension index -- generate_subscripts
    is 1-based where posexplode is 0-based) -> sign-bit signature ->
    chunk banding.  Ends with bnd(vec_id, band_no, val); e/nrm remain
    available for the exact-cosine verify downstream."""
    planes = portable_planes(n_planes, dim)
    values = ",\n        ".join(
        ", ".join(f"({p}, {i + 1}, {c})" for i, c in enumerate(row))
        for p, row in enumerate(planes)
    )
    rpb = n_planes // bands
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT vec_id, {j} AS band_no, (sig >> {j * rpb}) % {1 << rpb} AS val FROM sig"
        for j in range(bands)
    )
    return f"""pl(p, i, c) AS (
      VALUES {values}),
    e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    q AS (
      SELECT vec_id, i, CAST(FLOOR(v * 1000000) AS BIGINT) AS qv FROM e),
    dots AS (
      SELECT q.vec_id, pl.p, SUM(q.qv * pl.c) AS d
      FROM q JOIN pl ON q.i = pl.i
      GROUP BY 1, 2),
    sig AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN d >= 0 THEN CAST(POWER(2, p) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS sig
      FROM dots GROUP BY 1),
    bnd AS (
      {band_selects}),
    nrm AS (SELECT vec_id, SQRT(SUM(v * v)) AS n FROM e GROUP BY 1)"""


def _portable_hyperplane_sql(
    threshold: float = 0.4, n_planes: int = 48, bands: int = 12, dim: int = 64
) -> str:
    """DuckDB replay of the full portable near-dup pipeline: the shared
    sig/banding CTEs -> bucket self-join -> exact float64 cosine at 6dp
    on candidates."""
    return f"""
    WITH {_portable_sig_ctes(n_planes, bands, dim)},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.band_no = b.band_no AND a.val = b.val AND a.vec_id < b.vec_id),
    dot AS (
      SELECT c.id_a, c.id_b, SUM(a.v * b.v) AS d
      FROM cand c
      JOIN e a ON a.vec_id = c.id_a
      JOIN e b ON b.vec_id = c.id_b AND b.i = a.i
      GROUP BY 1, 2)
    SELECT id_a, id_b, ROUND(d / (na.n * nb.n), 6) AS cos_sim
    FROM dot
    JOIN nrm na ON na.vec_id = id_a
    JOIN nrm nb ON nb.vec_id = id_b
    WHERE ROUND(d / (na.n * nb.n), 6) >= {threshold}
    """


@register("embedding_neardup_portable", oracle=_portable_hyperplane_sql())
def q_neardup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH embedding near-dup with ENGINE-DETERMINISTIC bucket
    assignment: integer-quantized vectors x integer sha256-derived plane
    coefficients make every sign bit exact BIGINT arithmetic, so DuckDB
    replays banding bit-for-bit and the driver hash-verifies the full
    LSH pipeline (unlike ``embedding_neardup_lsh``, whose float-plane
    buckets are rows-only).  Candidates verify with the proven 6dp
    float64 cosine."""
    return hyperplane_portable_pairs(
        _emb(spark, sf_dir), "vec_id", "embedding", threshold=0.4
    )


@register(
    "ann_bruteforce_topk",
    oracle=_COS_CTE
    + """
    , dot AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.v * c.v) AS d
      FROM e q JOIN e c ON q.i = c.i AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 5
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id,
             ROUND(d / (nq.n * nc.n), 6) AS cos_sim
      FROM dot JOIN nrm nq ON nq.vec_id = query_id
               JOIN nrm nc ON nc.vec_id = neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 10
    """,
)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors (vec_id < 5): broadcast
    queries, stream the corpus, per-query top-k window.  Deterministic:
    ranked on 6dp-rounded cosine with id tie-break."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, "vec_id", "embedding", k=10)


@register("ann_lsh_topk")  # hash-derived planes -> rows-only
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k (8 random hyperplanes): the scale path.
    Recall vs brute force is measured in tests/test_northstar.py."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, queries, "vec_id", "embedding", k=10, n_planes=8)


@register(
    "ann_portable_topk",
    oracle=f"""
    WITH {_portable_sig_ctes()},
    qb AS (SELECT * FROM bnd WHERE vec_id < 5),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM qb q JOIN bnd c
        ON q.band_no = c.band_no AND q.val = c.val AND q.vec_id <> c.vec_id),
    dot AS (
      SELECT cd.query_id, cd.neighbor_id, SUM(a.v * b.v) AS d
      FROM cand cd
      JOIN e a ON a.vec_id = cd.query_id
      JOIN e b ON b.vec_id = cd.neighbor_id AND b.i = a.i
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id, ROUND(d / (nq.n * nc.n), 6) AS cos_sim
      FROM dot JOIN nrm nq ON nq.vec_id = query_id
               JOIN nrm nc ON nc.vec_id = neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 10
    """,
)
def q_ann_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 over PORTABLE LSH buckets (queries: vec_id < 5):
    integer signatures make the candidate set engine-deterministic, so
    DuckDB replays bucketing, exact 6dp cosine scoring and the
    rank-with-id-tie-break window -- the first hash-verified ANN scale
    path (``ann_lsh_topk``'s float-plane buckets are rows-only)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_portable_topk(emb, queries, "vec_id", "embedding", k=10)


@register("ann_ivf_topk")  # KMeans-derived buckets -> rows-only
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k: k-means coarse quantizer, nprobe=4 of 16 clusters.
    Recall vs brute force is measured in tests/test_northstar.py."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, "vec_id", "embedding", k=10, n_clusters=16, nprobe=4)


@register(
    "ann_ivf_portable_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    q AS (
      SELECT vec_id, i, CAST(FLOOR(v * 1000000) AS BIGINT) AS qv FROM e),
    nrm AS (SELECT vec_id, SQRT(SUM(v * v)) AS n FROM e GROUP BY 1),
    cent_ids AS (
      SELECT vec_id AS cluster FROM embeddings
      ORDER BY ((CAST(vec_id AS BIGINT) % 2147483648) * 2654435761) % 2147483648, vec_id
      LIMIT 16),
    centq AS (
      SELECT c.cluster, q.i, q.qv AS cqv
      FROM cent_ids c JOIN q ON q.vec_id = c.cluster),
    d2 AS (
      SELECT q.vec_id, c.cluster,
             CAST(SUM((q.qv - c.cqv) * (q.qv - c.cqv)) AS BIGINT) AS d2
      FROM q JOIN centq c ON q.i = c.i
      GROUP BY 1, 2),
    assigned AS (
      SELECT vec_id AS neighbor_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM d2)
      WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM d2 WHERE vec_id < 5)
      WHERE rn <= 4),
    cand AS (
      SELECT p.query_id, a.neighbor_id
      FROM probes p JOIN assigned a USING (cluster)
      WHERE p.query_id <> a.neighbor_id),
    dot AS (
      SELECT cd.query_id, cd.neighbor_id, SUM(a.v * b.v) AS d
      FROM cand cd
      JOIN e a ON a.vec_id = cd.query_id
      JOIN e b ON b.vec_id = cd.neighbor_id AND b.i = a.i
      GROUP BY 1, 2),
    scored AS (
      SELECT query_id, neighbor_id, ROUND(d / (nq.n * nc.n), 6) AS cos_sim
      FROM dot JOIN nrm nq ON nq.vec_id = query_id
               JOIN nrm nc ON nc.vec_id = neighbor_id),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 10
    """,
)
def q_ann_ivf_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 with an ENGINE-DETERMINISTIC coarse quantizer
    (queries: vec_id < 5): Knuth-hash corpus-sampled centroids + exact
    BIGINT squared-L2 assignment/probing make the inverted lists
    SQL-replayable, closing the hash-verification gap ``ann_ivf_topk``'s
    float KMeans buckets cannot (rows-only by construction).  Candidates
    score with the proven 6dp float64 cosine."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_portable_topk(
        emb, queries, "vec_id", "embedding", k=10, n_clusters=16, nprobe=4
    )


@register(
    "embedding_quantization_audit",
    oracle="""
    WITH ex AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    st AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY dim),
    qq AS (
      SELECT ex.dim, ex.v, st.mn, st.mx,
             CASE WHEN st.mx > st.mn THEN
               CAST(FLOOR((ex.v - st.mn) * CAST(255.0 AS DOUBLE)
                          / (st.mx - st.mn) + 0.5) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS q
      FROM ex JOIN st USING (dim)),
    ee AS (
      SELECT dim, mn, mx,
             CASE WHEN mx > mn THEN CAST(FLOOR(
               (v - (mn + CAST(q AS DOUBLE) * (mx - mn)
                          / CAST(255.0 AS DOUBLE)))
               * (v - (mn + CAST(q AS DOUBLE) * (mx - mn)
                            / CAST(255.0 AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS e
      FROM qq)
    SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(FLOOR(MIN(mn) * 1000000000.0 + 0.5) AS BIGINT) AS min_nano,
           CAST(FLOOR(MAX(mx) * 1000000000.0 + 0.5) AS BIGINT) AS max_nano,
           CAST(SUM(e) AS BIGINT) AS sq_err_nano
    FROM ee GROUP BY dim
    """,
)
def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization of the embedding corpus
    with its reconstruction-error audit -- which dimensions survive
    8-bit vector storage
    (`operators/similarity.py::scalar_quantization_audit`)."""
    from ..operators.similarity import scalar_quantization_audit

    return scalar_quantization_audit(
        _emb(spark, sf_dir), "vec_id", "embedding", levels=256
    )


_ANN_AUDIT_ORACLE = f"""
    WITH {_portable_sig_ctes()},
    t_dot AS (
      SELECT qe.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(qe.v * c.v) AS d
      FROM e qe JOIN e c ON qe.i = c.i AND qe.vec_id <> c.vec_id
      WHERE qe.vec_id < 5
      GROUP BY 1, 2),
    t_ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(d / (nq.n * nc.n), 6) DESC,
                                         neighbor_id) AS rank
      FROM t_dot JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = neighbor_id),
    truth AS (SELECT query_id, neighbor_id FROM t_ranked WHERE rank <= 10),
    qb AS (SELECT * FROM bnd WHERE vec_id < 5),
    l_cand AS (
      SELECT DISTINCT q2.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM qb q2 JOIN bnd c
        ON q2.band_no = c.band_no AND q2.val = c.val AND q2.vec_id <> c.vec_id),
    l_dot AS (
      SELECT cd.query_id, cd.neighbor_id, SUM(a.v * b.v) AS d
      FROM l_cand cd
      JOIN e a ON a.vec_id = cd.query_id
      JOIN e b ON b.vec_id = cd.neighbor_id AND b.i = a.i
      GROUP BY 1, 2),
    l_ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(d / (nq.n * nc.n), 6) DESC,
                                         neighbor_id) AS rank
      FROM l_dot JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = neighbor_id),
    lshk AS (SELECT query_id, neighbor_id FROM l_ranked WHERE rank <= 10),
    cent_ids AS (
      SELECT vec_id AS cluster FROM embeddings
      ORDER BY ((CAST(vec_id AS BIGINT) % 2147483648) * 2654435761) % 2147483648,
               vec_id
      LIMIT 16),
    centq AS (
      SELECT c.cluster, q.i, q.qv AS cqv
      FROM cent_ids c JOIN q ON q.vec_id = c.cluster),
    d2 AS (
      SELECT q.vec_id, c.cluster,
             CAST(SUM((q.qv - c.cqv) * (q.qv - c.cqv)) AS BIGINT) AS d2
      FROM q JOIN centq c ON q.i = c.i
      GROUP BY 1, 2),
    assigned AS (
      SELECT vec_id AS neighbor_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM d2)
      WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM d2 WHERE vec_id < 5)
      WHERE rn <= 4),
    i_cand AS (
      SELECT p.query_id, a.neighbor_id
      FROM probes p JOIN assigned a USING (cluster)
      WHERE p.query_id <> a.neighbor_id),
    i_dot AS (
      SELECT cd.query_id, cd.neighbor_id, SUM(a.v * b.v) AS d
      FROM i_cand cd
      JOIN e a ON a.vec_id = cd.query_id
      JOIN e b ON b.vec_id = cd.neighbor_id AND b.i = a.i
      GROUP BY 1, 2),
    i_ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(d / (nq.n * nc.n), 6) DESC,
                                         neighbor_id) AS rank
      FROM i_dot JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = neighbor_id),
    ivfk AS (SELECT query_id, neighbor_id FROM i_ranked WHERE rank <= 10),
    retr AS (
      SELECT 'portable_lsh' AS method, query_id, neighbor_id FROM lshk
      UNION ALL
      SELECT 'portable_ivf' AS method, query_id, neighbor_id FROM ivfk),
    methods AS (SELECT 'portable_lsh' AS method UNION ALL SELECT 'portable_ivf'),
    tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM truth),
    cnts AS (SELECT method, CAST(COUNT(*) AS BIGINT) AS n_retrieved
             FROM retr GROUP BY 1),
    hit AS (SELECT r.method, CAST(COUNT(*) AS BIGINT) AS n_hit
            FROM retr r JOIN truth t USING (query_id, neighbor_id) GROUP BY 1)
    SELECT m.method, tc.nt AS n_truth_pairs,
           CAST(COALESCE(c.n_retrieved, 0) AS BIGINT) AS n_retrieved,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           CASE WHEN tc.nt > 0 THEN
             (CAST(COALESCE(h.n_hit, 0) AS BIGINT) * 20000 + tc.nt) // (2 * tc.nt)
           END AS recall_bp
    FROM methods m
    CROSS JOIN tc
    LEFT JOIN cnts c USING (method)
    LEFT JOIN hit h USING (method)
    """


@register("ann_recall_audit", oracle=_ANN_AUDIT_ORACLE)
def q_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN QUALITY SCOREBOARD (r15, the embedding mirror of
    ``dedup_lsh_recall_audit``): one row PER SCALE PATH quantifying what
    the approximate index trades against exact brute force.  Ground
    truth is the exact cosine top-10 (queries vec_id < 5, the
    ``ann_bruteforce_topk`` semantics); each portable method's top-10 is
    scored as pair-level RECALL in exact basis points --
    ``n_hit / n_truth_pairs`` with half-up integer arithmetic -- so the
    recall VALUE itself is driver-hash-verified, not a pytest floor
    (closing the r14 verdict's last "quality asserted only in pytest"
    gap for the ANN family; the float twins ``ann_lsh_topk`` /
    ``ann_ivf_topk`` share these plans modulo hash-vs-learned
    parameters and keep their pytest recall floors in
    ``tests/test_northstar.py``).

    Methods: ``portable_lsh`` (sign-bit hyperplane banding,
    ``lsh_portable_topk``) and ``portable_ivf`` (Knuth-hash-sampled
    integer coarse quantizer, nprobe=4/16, ``ivf_portable_topk``).
    Every stage -- quantization, banding/assignment, candidate join,
    6dp float64 cosine, rank-with-id-tie-break, the basis-point recall
    arithmetic -- replays bit-for-bit in the DuckDB oracle.  Scale
    shape: the truth stage is brute force over a BOUNDED query panel
    (5 queries x corpus -- the audit slab pattern: at 100 TB you audit
    a sampled panel, never all queries), both method stages are the
    production candidate-bounded plans, and the scoreboard itself is a
    count-only aggregate (three tiny frames joined on a 2-row method
    axis)."""
    from ..operators.dedup import _cache_aged
    from ..operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    # Cache the two expensive branches (r15): ``truth`` (the exact
    # brute-force panel) feeds tc AND hits, ``retr`` (LSH + IVF top-10s)
    # feeds cnts AND hits -- uncached, every branch re-ran its whole
    # pipeline (the before-plan shows the brute-force join twice).  Both
    # frames are k-bounded (50 / 100 rows); the cache costs nothing and
    # halves the corpus-side work.
    truth = _cache_aged(
        "ann_audit_truth",
        cosine_topk(emb, queries, "vec_id", "embedding", k=10).select(
            "query_id", "neighbor_id"
        ),
    )
    lsh = lsh_portable_topk(emb, queries, "vec_id", "embedding", k=10).select(
        "query_id", "neighbor_id"
    )
    ivf = ivf_portable_topk(
        emb, queries, "vec_id", "embedding", k=10, n_clusters=16, nprobe=4
    ).select("query_id", "neighbor_id")
    retr = _cache_aged(
        "ann_audit_retr",
        lsh.withColumn("method", F.lit("portable_lsh")).unionAll(
            ivf.withColumn("method", F.lit("portable_ivf"))
        ),
    )
    methods = spark.createDataFrame(
        [("portable_lsh",), ("portable_ivf",)], "method string"
    )
    tc = truth.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    cnts = retr.groupBy("method").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved")
    )
    hits = (
        retr.join(F.broadcast(truth), ["query_id", "neighbor_id"])
        .groupBy("method")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    # Post-agg sizes are unknown to the planner (SortMergeJoin on a
    # 2-row axis otherwise); both sides are method-axis-bounded.
    return (
        methods.join(F.broadcast(cnts), "method", "left")
        .join(F.broadcast(hits), "method", "left")
        .crossJoin(F.broadcast(tc))
        .select(
            "method",
            F.col("nt").alias("n_truth_pairs"),
            F.coalesce("n_retrieved", F.lit(0)).cast("long").alias("n_retrieved"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.when(
                F.col("nt") > 0,
                F.expr("(coalesce(n_hit, 0) * 20000 + nt) div (2 * nt)"),
            ).alias("recall_bp"),
        )
    )


_NPROBE_AXIS = [1, 2, 4, 8]

_NPROBE_SWEEP_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
    q AS (
      SELECT vec_id, i, CAST(FLOOR(v * 1000000) AS BIGINT) AS qv FROM e),
    nrm AS (SELECT vec_id, SQRT(SUM(v * v)) AS n FROM e GROUP BY 1),
    t_dot AS (
      SELECT qe.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(qe.v * c.v) AS d
      FROM e qe JOIN e c ON qe.i = c.i AND qe.vec_id <> c.vec_id
      WHERE qe.vec_id < 5
      GROUP BY 1, 2),
    t_ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(d / (nq.n * nc.n), 6) DESC,
                                         neighbor_id) AS rank
      FROM t_dot JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = neighbor_id),
    truth AS (SELECT query_id, neighbor_id FROM t_ranked WHERE rank <= 10),
    cent_ids AS (
      SELECT vec_id AS cluster FROM embeddings
      ORDER BY ((CAST(vec_id AS BIGINT) % 2147483648) * 2654435761) % 2147483648,
               vec_id
      LIMIT 16),
    centq AS (
      SELECT c.cluster, q.i, q.qv AS cqv
      FROM cent_ids c JOIN q ON q.vec_id = c.cluster),
    d2 AS (
      SELECT q.vec_id, c.cluster,
             CAST(SUM((q.qv - c.cqv) * (q.qv - c.cqv)) AS BIGINT) AS d2
      FROM q JOIN centq c ON q.i = c.i
      GROUP BY 1, 2),
    assigned AS (
      SELECT vec_id AS neighbor_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM d2)
      WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, cluster, rn AS probe_rank FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM d2 WHERE vec_id < 5)
      WHERE rn <= 8),
    cand AS (
      SELECT p.query_id, a.neighbor_id, p.probe_rank
      FROM probes p JOIN assigned a USING (cluster)
      WHERE p.query_id <> a.neighbor_id),
    c_dot AS (
      SELECT cd.query_id, cd.neighbor_id, cd.probe_rank, SUM(a.v * b.v) AS d
      FROM cand cd
      JOIN e a ON a.vec_id = cd.query_id
      JOIN e b ON b.vec_id = cd.neighbor_id AND b.i = a.i
      GROUP BY 1, 2, 3),
    scored AS (
      SELECT query_id, neighbor_id, probe_rank,
             ROUND(d / (nq.n * nc.n), 6) AS cos_sim
      FROM c_dot JOIN nrm nq ON nq.vec_id = query_id
                 JOIN nrm nc ON nc.vec_id = neighbor_id),
    axis AS (SELECT unnest({_NPROBE_AXIS}) AS nprobe),
    fan AS (
      SELECT x.nprobe, s.query_id, s.neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY x.nprobe, s.query_id
                                ORDER BY s.cos_sim DESC, s.neighbor_id) AS rank
      FROM scored s JOIN axis x ON s.probe_rank <= x.nprobe),
    topk AS (SELECT nprobe, query_id, neighbor_id FROM fan WHERE rank <= 10),
    tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM truth),
    cnts AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_retrieved
             FROM topk GROUP BY 1),
    hit AS (SELECT k.nprobe, CAST(COUNT(*) AS BIGINT) AS n_hit
            FROM topk k JOIN truth t USING (query_id, neighbor_id) GROUP BY 1)
    SELECT x.nprobe, tc.nt AS n_truth_pairs,
           CAST(COALESCE(c.n_retrieved, 0) AS BIGINT) AS n_retrieved,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           CASE WHEN tc.nt > 0 THEN
             (CAST(COALESCE(h.n_hit, 0) AS BIGINT) * 20000 + tc.nt) // (2 * tc.nt)
           END AS recall_bp
    FROM axis x
    CROSS JOIN tc
    LEFT JOIN cnts c USING (nprobe)
    LEFT JOIN hit h USING (nprobe)
    """


@register("ann_ivf_nprobe_sweep", oracle=_NPROBE_SWEEP_ORACLE)
def q_ann_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe TUNING TABLE (r15, the index-tuning mirror of
    ``dedup_threshold_sweep``): for each nprobe in {1, 2, 4, 8}, the
    pair-level recall@10 of the portable IVF index against exact brute
    force -- the one-query answer to "how many clusters must I probe".

    Verify-once / fan-out shape: candidates are generated and
    exact-cosine-scored ONCE at max_nprobe=8
    (``ivf_portable_scored_candidates``; each candidate carries the
    probe rank of the cluster it came through), then a 4-row broadcast
    nprobe axis re-ranks each query's candidate subset per cutoff --
    probing fewer clusters only ever SHRINKS the candidate set, so the
    nprobe=n result is exactly the rank-filter ``probe_rank <= n``.
    No re-scoring per cutoff, no second corpus pass.  Recall is
    computed in exact half-up basis points against the bounded
    5-query exact panel (the audit-slab pattern of
    ``ann_recall_audit``), and every stage -- quantization, centroid
    sampling, BIGINT L2 probing, 6dp cosine, the per-nprobe rank
    window, the recall arithmetic -- replays bit-for-bit in the DuckDB
    oracle.  Every axis row is present even at zero hits (LEFT join
    from the axis)."""
    from ..operators.dedup import _cache_aged
    from ..operators.similarity import cosine_topk, ivf_portable_scored_candidates

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    # Same logical plan as ann_recall_audit's truth -> one shared cache
    # entry when both audits run in a session (r15; truth feeds tc AND
    # hits below, so uncached it ran the brute-force panel twice).
    truth = _cache_aged(
        "ann_audit_truth",
        cosine_topk(emb, queries, "vec_id", "embedding", k=10).select(
            "query_id", "neighbor_id"
        ),
    )
    scored = ivf_portable_scored_candidates(
        emb, queries, "vec_id", "embedding", n_clusters=16, max_nprobe=8
    )
    axis = spark.createDataFrame([(n,) for n in _NPROBE_AXIS], "nprobe long")
    from pyspark.sql import Window

    fan = scored.join(F.broadcast(axis), F.col("probe_rank") <= F.col("nprobe"))
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    # topk feeds cnts AND hits; uncached, the scored-candidate pipeline
    # (quantize + probe + exact cosine) ran once per branch (r15).
    # Axis-x-k-bounded rows (<= 200): the cache is free.
    topk = _cache_aged(
        "nprobe_topk",
        fan.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("nprobe", "query_id", "neighbor_id"),
    )
    tc = truth.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    cnts = topk.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved")
    )
    hits = (
        topk.join(F.broadcast(truth), ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    # Broadcast the axis-bounded aggregate sides (planner sees unknown
    # post-agg sizes and picks SortMergeJoin on a 4-row frame otherwise).
    return (
        axis.join(F.broadcast(cnts), "nprobe", "left")
        .join(F.broadcast(hits), "nprobe", "left")
        .crossJoin(F.broadcast(tc))
        .select(
            "nprobe",
            F.col("nt").alias("n_truth_pairs"),
            F.coalesce("n_retrieved", F.lit(0)).cast("long").alias("n_retrieved"),
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.when(
                F.col("nt") > 0,
                F.expr("(coalesce(n_hit, 0) * 20000 + nt) div (2 * nt)"),
            ).alias("recall_bp"),
        )
    )
