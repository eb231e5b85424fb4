"""Bloom-filter semi-join pruning (runtime-filter style).

The 100 TB problem this solves: a selective dimension predicate should
cut the FACT scan's shuffle volume, not just the post-join output.  A
shuffle hash join on ``orders ⋈ customer`` still shuffles every orders
row even when the customer side keeps 0.1% of keys.  The fix used by
every warehouse engine (and by Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled``) is a runtime
filter: build a tiny Bloom filter over the build side's join keys, ship
it to the probe side, and drop non-matching rows BEFORE the shuffle.

This module implements the same idea with a PORTABLE hash family
(md5-based 60-bit base hash -> universal hashes mod the Mersenne prime
2^31-1, all arithmetic < 2^62), so the exact bit pattern of the filter
-- and therefore the exact set of bloom-surviving rows -- can be
replayed bit-for-bit in plain SQL by another engine (DuckDB oracle in
``plans/coverage3.py``).

Design choices, and why they hold at scale:

- Words are 32-bit (bit index ``pos % 32``), so every mask and every
  OR-merged word stays positive in signed-64 arithmetic on ANY SQL
  engine -- no sign-bit edge at 1<<63, no unsigned-shift portability
  trap.
- The filter is built with ONE map-side-combinable aggregate
  (``groupBy(word).agg(bit_or(mask))``) over the build keys: the
  shuffle carries at most ``num_bits/32`` rows regardless of build-side
  row count.
- The dense word array is collected to the driver and embedded as an
  array literal in the probe-side predicate.  This is the standard
  runtime-filter shape (Spark's BloomFilterAggregate does exactly this
  via a scalar subquery): the collect is bounded METADATA -- ``num_bits
  / 8`` bytes, 8 KiB for the default 2^16 bits, ~1 MiB for a 2^23-bit
  filter sized for ~1M build keys -- never data rows.
- False positives never escape: callers follow the bloom pre-filter
  with the exact join; the bloom only prunes, it never decides.

Reference parity: the reference repo joins nothing (SURVEY §2.3 J0 --
its pipeline is join-free by design), so this operator is part of the
engine-generalization surface, not a port.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import PORTABLE_P, portable_base_hash

#: Bits per filter word.  32 keeps every word and every single-bit mask
#: strictly positive in signed 64-bit integers, the common denominator
#: of Spark/DuckDB/ANSI arithmetic.
WORD_BITS = 32


def bloom_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) universal-hash pairs mod ``PORTABLE_P`` for
    the k probe hashes, derived from sha256 like the minhash family.
    Single source for the Spark operator AND the SQL oracle builder."""
    out = []
    for i in range(k):
        d = hashlib.sha256(f"bloom-portable:{i}".encode()).digest()
        a = int.from_bytes(d[:8], "big") % (PORTABLE_P - 1) + 1
        b = int.from_bytes(d[8:16], "big") % PORTABLE_P
        out.append((a, b))
    return out


def _positions(key: Column, num_bits: int, k: int) -> list[Column]:
    """Bit positions of ``key`` under the k portable hashes.

    ``h0 < P`` and ``a < P`` keep ``a*h0 + b < 2^62``: exact in BIGINT.
    """
    h0 = portable_base_hash(key.cast("string")) % PORTABLE_P
    return [((F.lit(a) * h0 + F.lit(b)) % PORTABLE_P) % num_bits for a, b in bloom_params(k)]


def bloom_build(df: DataFrame, key_col: str, num_bits: int = 1 << 16, k: int = 3) -> list[int]:
    """Aggregate the build side into a dense word array (Python ints).

    One distributed aggregate; the driver receives at most
    ``num_bits / WORD_BITS`` (word, bits) rows -- bounded metadata, the
    same collect bound Spark's own runtime bloom filter accepts.
    """
    if num_bits % WORD_BITS:
        raise ValueError(f"num_bits must be a multiple of {WORD_BITS}, got {num_bits}")
    # A NULL key can never equi-join, so it contributes no bits -- and
    # left unfiltered it would surface as a (NULL, NULL) aggregate row
    # that crashes the driver-side densify below.
    df = df.filter(F.col(key_col).isNotNull())
    masks = []
    for pos in _positions(F.col(key_col), num_bits, k):
        # 2^bit via pow: bit <= 31 so the double is exact; shiftleft/
        # shiftright builtins only take Python-int shift amounts.
        masks.append(
            F.struct(
                (pos / WORD_BITS).cast("long").alias("w"),
                F.pow(F.lit(2.0), pos % WORD_BITS).cast("long").alias("m"),
            )
        )
    exploded = df.select(F.explode(F.array(*masks)).alias("wm"))
    rows = (
        exploded.groupBy(F.col("wm.w").alias("w"))
        .agg(F.bit_or(F.col("wm.m")).alias("word"))
        .collect()
    )
    words = [0] * (num_bits // WORD_BITS)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_might_contain(key: Column, words: list[int], num_bits: int, k: int = 3) -> Column:
    """Probe predicate: true iff every one of the k bits is set.

    ``words`` is embedded as one array literal (plan-size = filter
    size); per-row work is k (multiply, mod, element_at, shift, mask)
    chains -- all whole-stage-codegen, no Python.
    """
    arr = F.lit(words)
    cond = F.lit(True)
    for pos in _positions(key, num_bits, k):
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + 1)
        # (word >> bit) & 1 without shift-by-column: word < 2^32 and
        # 2^bit <= 2^31 are both exact in doubles, so floor-divide by
        # 2^bit then take parity -- bit-identical to the shift.
        bit = (word / F.pow(F.lit(2.0), pos % WORD_BITS)).cast("long") % 2
        cond = cond & (bit == 1)
    return cond


def bloom_prune_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 1 << 16,
    k: int = 3,
    how: str = "left_semi",
) -> DataFrame:
    """Semi/inner join with bloom pre-pruning of the probe side.

    The exact join still runs (false positives must not escape), but on
    the bloom-surviving subset -- at 100 TB that is the difference
    between shuffling the full fact table and shuffling the ~selectivity
    fraction the dimension predicate actually keeps.

    Only ``left_semi``/``inner`` are meaningful: the bloom pre-filter
    DROPS probe rows before the join, so any outer flavor would silently
    lose rows that must survive with NULLs.  Loud guard, same contract
    style as fuzzy_join's max_dist check.
    """
    if how not in ("left_semi", "inner"):
        raise ValueError(
            f"bloom_prune_join supports how='left_semi'|'inner', got {how!r}: "
            "the bloom pre-filter drops probe rows, which corrupts outer joins"
        )
    words = bloom_build(build, build_key, num_bits, k)
    pruned = probe.filter(bloom_might_contain(F.col(probe_key), words, num_bits, k))
    dim = build.select(F.col(build_key).alias("__bloom_bk")).distinct()
    joined = pruned.join(F.broadcast(dim), on=F.col(probe_key) == F.col("__bloom_bk"), how=how)
    return joined.drop("__bloom_bk")


# --------------------------------------------------------------------------
# Bitmap indexes: EXACT mergeable distinct counting / set algebra over
# dense integer id spaces (the roaring-bitmap pattern, 32-bit words).
# --------------------------------------------------------------------------


def bitmap_registers(
    df: DataFrame, group_cols: list[str], id_col: str
) -> DataFrame:
    """Per-group bitmap words over a NON-NEGATIVE integer id column:
    word ``id div 32`` holds bit ``id mod 32`` (32-bit masks -- shifts
    come from ``pow(2.0, bit)`` which is exact to 2^31 and never trips
    the BIGINT sign bit).  One map-side-combinable ``bit_or`` collapses
    any number of rows to at most ``max_id/32`` word cells per group --
    the EXACT counterpart to the HLL registers: distinct counts,
    unions (bit_or), and intersections (bitwise AND on joined words)
    all come from the word frame without re-touching raw rows, and
    word frames MERGE across partitions/days by bit_or.

    Scale: cells shuffled, never ids; the id space must be dense-ish
    (cells ~ max_id/32 per group) -- the classic bitmap-index
    applicability condition; sparse 64-bit id spaces belong to HLL.

    Output: ``<group_cols>, word, bm``.
    """
    word = F.expr(f"CAST(({id_col}) div 32 AS BIGINT)")
    mask = F.expr(f"CAST(pow(2.0, ({id_col}) % 32) AS BIGINT)")
    return (
        df.select(*group_cols, word.alias("word"), mask.alias("__m"))
        .groupBy(*group_cols, "word")
        .agg(F.bit_or("__m").cast("long").alias("bm"))
    )


def bitmap_cardinality(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Exact distinct count per group from bitmap words: sum of
    ``bit_count`` over cells (both engines agree on BIGINT popcount).
    Output: ``<group_cols>, n_distinct``."""
    return regs.groupBy(*group_cols).agg(
        F.sum(F.expr("bit_count(bm)")).cast("long").alias("n_distinct")
    )


def bitmap_pair_overlap(
    regs: DataFrame, key_col: str, jaccard_scale: int = 1_000_000
) -> DataFrame:
    """Exact pairwise set algebra between every pair of groups in a
    single-key register frame: ``|A n B|`` by popcounting ANDed words,
    ``|A u B|`` by inclusion-exclusion, Jaccard as half-up fixed point.
    The word equi-join touches only cells both groups populate; group
    cardinalities ride in from ``bitmap_cardinality`` (broadcast-sized:
    one row per group).

    Output: ``<key>_a, <key>_b, n_a, n_b, n_both, n_union,
    jaccard_fp`` for every unordered pair with key_a < key_b (disjoint
    pairs appear with n_both = 0).
    """
    a = regs.select(
        F.col(key_col).alias("ka"), "word", F.col("bm").alias("bma")
    )
    b = regs.select(
        F.col(key_col).alias("kb"), "word", F.col("bm").alias("bmb")
    )
    both = (
        a.join(b, "word")
        .filter(F.col("ka") < F.col("kb"))
        .groupBy("ka", "kb")
        .agg(
            F.sum(F.expr("bit_count(bma & bmb)")).cast("long").alias("n_both")
        )
    )
    card = bitmap_cardinality(regs, [key_col])
    ca = card.select(F.col(key_col).alias("ka"), F.col("n_distinct").alias("n_a"))
    cb = card.select(F.col(key_col).alias("kb"), F.col("n_distinct").alias("n_b"))
    pairs = (
        ca.crossJoin(cb)
        .filter(F.col("ka") < F.col("kb"))
        .join(both, ["ka", "kb"], "left")
        .withColumn("n_both", F.coalesce("n_both", F.lit(0)).cast("long"))
        .withColumn(
            "n_union", (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("long")
        )
    )
    return pairs.select(
        F.col("ka").alias(f"{key_col}_a"),
        F.col("kb").alias(f"{key_col}_b"),
        "n_a",
        "n_b",
        "n_both",
        "n_union",
        F.expr(
            f"CAST((2 * n_both * {int(jaccard_scale)} + n_union)"
            " DIV (2 * n_union) AS BIGINT)"
        ).alias("jaccard_fp"),
    )
