"""Governance / privacy operators: pseudonymization and k-anonymity
suppression.

Training-data and analytics exports both need the same two moves before
data leaves the trust boundary: (1) replace direct identifiers with a
salted one-way hash (joinable across tables, not reversible), and
(2) suppress quasi-identifier combinations too rare to hide in -- a
(segment, nation) pair shared by 2 customers re-identifies them even
with the key hashed, the classic k-anonymity failure.

Both steps are exact string/integer transforms (sha256 + a group-size
join), so a SQL oracle replays the output bit-for-bit -- governance
transforms are precisely where silent cross-engine drift is least
acceptable.

Scale posture: the group-size table is one aggregate over the quasi
columns (dim-bounded cardinality, broadcast back); hashing is
whole-stage codegen.  No Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonymize(col, salt: str):
    """Salted sha256 hex of a column -- deterministic (joins still work),
    one-way.  The salt must stay OUT of exported data; rotate it to
    unlink releases."""
    return F.sha2(F.concat(F.lit(salt + ":"), col.cast("string")), 256)


def k_anonymize(
    df: DataFrame,
    id_col: str,
    quasi_cols: list[str],
    k: int,
    salt: str,
) -> DataFrame:
    """Pseudonymize ``id_col`` and NULL-suppress every quasi-identifier
    of rows whose quasi combination has fewer than ``k`` members.

    Output: ``<id>_h``, the (possibly suppressed) quasi columns, the
    group size ``qgroup_n``, and ``suppressed`` (0/1).  Rows are never
    dropped -- suppression keeps the population statistics usable while
    removing the re-identifying cells.  The group-size join is
    NULL-SAFE: a NULL quasi value is its own (usually sparse) group, and
    plain equality would silently drop exactly the rows k-anonymity
    exists to protect.
    """
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("qgroup_n"))
    sized = sizes.select(
        *[F.col(q).alias(f"__q_{q}") for q in quasi_cols], "qgroup_n"
    )
    cond = None
    for q in quasi_cols:
        c = F.col(q).eqNullSafe(F.col(f"__q_{q}"))
        cond = c if cond is None else (cond & c)
    joined = df.join(F.broadcast(sized), on=cond).drop(
        *[f"__q_{q}" for q in quasi_cols]
    )
    risky = F.col("qgroup_n") < k
    out_cols = [pseudonymize(F.col(id_col), salt).alias(f"{id_col}_h")]
    for q in quasi_cols:
        out_cols.append(F.when(~risky, F.col(q)).alias(q))
    out_cols.append(F.col("qgroup_n"))
    out_cols.append(risky.cast("long").alias("suppressed"))
    return joined.select(*out_cols)


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    salt: str,
    sensitivity: int = 1,
) -> DataFrame:
    """Differentially-private style noisy group counts: Laplace
    (sensitivity/epsilon) noise added to each group's exact count via
    the inverse-CDF transform ``-b * sign(u - 1/2) * ln(1 - 2|u - 1/2|)``.

    REPLAYABILITY CAVEAT, stated plainly: the uniform draw ``u`` is
    derived from the salted portable hash of the group key -- a
    deterministic pseudo-sample, so the whole release replays
    bit-for-bit on any engine (and the SQL oracle verifies it).  That
    determinism is exactly what a production DP release must NOT have
    across releases: swap the salt per release (fresh independent
    noise per salt) or swap in true RNG at the trust boundary; the
    noise SHAPE, scaling, and post-processing here are the production
    arithmetic.

    Exactness: ``u = (h mod 2^52 + 1/2) / 2^52`` lies strictly inside
    (0, 1), so ``1 - 2|u - 1/2|`` is in (2^-52, 1] and ln never sees 0;
    every float step (one ratio, one ln, one multiply) is IEEE-exact
    from integers, rounded half-up ONCE to nano units.  Output counts
    are ``count * 1e9 + noise_nano`` -- BIGINT nano units (headroom:
    group counts below ~9.2e9; beyond that report micro units).

    Scale shape: one map-side-combinable aggregate; the noise is pure
    codegen over the (few) group rows.

    Output: ``<group_cols>, n_exact, noisy_count_nano``.
    """
    from .dedup import portable_base_hash

    if epsilon <= 0:
        raise ValueError(f"dp_noisy_counts needs epsilon > 0, got {epsilon}")
    if sensitivity < 1:
        raise ValueError(f"sensitivity must be >= 1, got {sensitivity}")
    b_r = repr(float(sensitivity) / float(epsilon))
    # NULL group keys: concat_ws silently SKIPS nulls (two NULL-keyed
    # columns would collapse onto the bare salt and draw correlated
    # noise) while the SQL twin's || propagates NULL -- coalesce each
    # component to an explicit sentinel on BOTH sides instead (r10
    # review finding; the sentinel starts with \x00 so no real value
    # collides with it).
    key = F.concat_ws(
        "\x1f",
        F.lit(salt),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in group_cols
        ],
    )
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    g = g.withColumn("__h", portable_base_hash(key) % F.lit(1 << 52))
    noise = F.expr(
        f"CAST(FLOOR("
        f" -CAST({b_r} AS DOUBLE)"
        f" * (CASE WHEN __h >= {1 << 51} THEN 1.0D ELSE -1.0D END)"
        f" * ln(CAST(1 AS DOUBLE)"
        f"      - 2.0D * abs((CAST(__h AS DOUBLE) + 0.5D)"
        f"                   / CAST({1 << 52} AS DOUBLE) - 0.5D))"
        f" * 1000000000.0D + 0.5D) AS BIGINT)"
    )
    return g.select(
        *group_cols,
        "n_exact",
        (F.col("n_exact") * F.lit(1000000000) + noise)
        .cast("long")
        .alias("noisy_count_nano"),
    )
