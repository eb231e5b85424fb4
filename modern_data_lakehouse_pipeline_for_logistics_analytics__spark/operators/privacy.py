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
