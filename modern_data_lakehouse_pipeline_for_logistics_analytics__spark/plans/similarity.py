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
