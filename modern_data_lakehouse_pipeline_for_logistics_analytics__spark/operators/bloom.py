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
