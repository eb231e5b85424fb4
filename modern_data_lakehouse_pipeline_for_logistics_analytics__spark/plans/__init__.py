"""Named query plans exposed through ``__spark_entry__``.

Importing this package registers every query module; ``QUERIES`` /
``ORACLE`` are the registries the driver contract reads.

Registration ORDER is part of the driver contract: the driver verifies
exactly the first 50 registered queries each round.

STANDING ROTATION POLICY (r11, mechanical -- extends the r6 policy that
replaced the hand-edited ``_PRIORITY`` list):

1. ``cohort_digest_*`` queries register FIRST, every round.  Each one
   hash-digests the full result of ~30 member queries on BOTH engines
   (``cohorts.py``), so these ~8 pinned slots re-verify the ENTIRE
   oracle-backed registry every single round -- the structural fix for
   the refresh cycle that stretched to ~5 rounds once the registry
   outgrew the 50-slot window (r10 verdict items 2-3).
2. The remaining slots go to non-digest oracle-backed queries
   stalest-first: never-driver-verified queries first, then ascending
   last-verified round, ties broken by name for determinism -- so each
   query ALSO gets periodic individual driver evidence (the digest
   localizes a failure only to a cohort; the individual run pinpoints
   it).
3. Rows-only queries (registered in ``QUERIES`` but not ``ORACLE``)
   normally NEVER occupy window slots -- a rows-only query burns a slot
   on a permanent ``no_oracle`` row; pytest recall/property tests cover
   them.  TWO exceptions:
   (a) r13: a rows-only query with zero driver evidence in ANY round
       gets a one-time slot right after the digests, so every
       registered query has at least an executed ``spark_rows`` row;
   (b) r14 (judge item 2): a rows-only query whose NEWEST driver row
       (of any kind) is >= ``_ROWS_ONLY_STALE_ROUNDS`` rounds old gets
       a refresh slot, stalest-first, capped at
       ``_ROWS_ONLY_REFRESH_CAP`` per round -- the r13 rule alone let
       evidence from rounds 1-5 (pre-dating several reimplementations
       of the same operators) stand forever.  With 8 rows-only
       queries total the cap bounds the burn at 8 slots in the
       catch-up round and ~1 per round steady-state.
4. Last-verified rounds are read from the ``CORRECTNESS_r*.json`` files
   the driver writes at the repo root (a query counts as verified in
   round N iff its row has ``hash_match: true``).  No hand-maintained
   dict: the next round's window is derived from the previous round's
   evidence automatically, so a forgotten rotation cannot recur.

Net effect (247 cohort members as of r11; the count grows with every
``--add``): full-registry value evidence EVERY round via the digests,
plus an individual-evidence cycle of ceil(members / ~42) ~ 6 rounds
through the remaining slots.
"""

import json
import re
from pathlib import Path

from .registry import ORACLE, QUERIES, register

__all__ = ["QUERIES", "ORACLE", "register"]


def _load_all() -> None:
    """Import every query module (idempotent).  Import failures are LOUD:
    a silently-skipped module would shrink ``queries()`` with zero signal
    and the driver would just verify fewer queries."""
    for mod in (
        "relational",
        "joins",
        "windows",
        "scalars",
        "nested",
        "dedup",
        "similarity",
        "textstats",
        "eventtime",
        "multimodal",
        "extras",
        "analytics",
        "udfs",
        "subqueries",
        "maintenance",
        "coverage2",
        "tpch2",
        "tpch3",
        "product_analytics",
        "trainprep",
        "coverage3",
        "coverage4",
        "coverage5",
        "retrieval",
        "logistics",
        "coverage6",
        "coverage7",
        "coverage8",
        "star",
        "approx_cohort",  # digests the rows-only members vs pinned baselines
        "cohorts",  # must import LAST: digests read the full ORACLE registry
    ):
        try:
            __import__(f"{__name__}.{mod}")
        except Exception as exc:  # noqa: BLE001 -- re-raise with module context
            raise ImportError(f"query module {__name__}.{mod} failed to import: {exc}") from exc


#: Rows-only refresh policy (r14): a rows-only query's newest driver row
#: older than this many rounds (relative to the next round, i.e. newest
#: CORRECTNESS round + 1) is considered stale and re-queues for a window
#: slot.  8 rounds ~ the individual-evidence cycle length of the
#: oracle-backed population, so rows-only queries refresh no less often
#: than everyone else.
_ROWS_ONLY_STALE_ROUNDS = 8
_ROWS_ONLY_REFRESH_CAP = 8


def _last_verified_rounds() -> tuple[dict[str, int], dict[str, int]]:
    """(name -> latest round with a ``hash_match: true`` driver row,
    name -> latest round with ANY driver row at all).

    Read from the ``CORRECTNESS_r*.json`` files the driver commits at the
    repo root.  Absent name (or no files at all, e.g. an installed
    package without the driver artifacts) means never verified -> 0,
    which front-loads the query.  The "any row" map distinguishes
    rows-only queries that have at least a recorded ``no_oracle`` +
    spark_rows row from ones the driver has never executed (r12 verdict:
    ``dedup_clusters_lsh`` was the one registered query with zero driver
    evidence in any round), and carries the ROUND of the newest such row
    so the r14 staleness refresh can re-queue rows-only queries whose
    only evidence pre-dates reimplementation.  Malformed files are
    skipped: a corrupt artifact must not break ``queries()`` imports.
    """
    last: dict[str, int] = {}
    last_any: dict[str, int] = {}
    repo_root = Path(__file__).resolve().parents[2]
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            last_any[name] = max(last_any.get(name, 0), rnd)
            if row.get("hash_match") is True:
                last[name] = max(last.get(name, 0), rnd)
    return last, last_any


def _reorder() -> None:
    """Apply the standing rotation policy (module docstring): cohort
    digests pinned first (full-registry evidence every round), then
    rows-only queries with ZERO driver evidence in any round plus
    rows-only queries whose newest driver row is stale (r14 refresh,
    stalest-first, capped), then oracle-backed stalest-first
    (never-verified -> round 0, name tie-break), then the remaining
    rows-only queries in registration order."""
    last, last_any = _last_verified_rounds()
    digests = sorted(n for n in QUERIES if n.startswith("cohort_digest_"))
    rows_only = [n for n in QUERIES if n not in ORACLE and n not in digests]
    # Only front-load when driver artifacts exist at all: in an installed
    # package without CORRECTNESS files, last_any is empty and EVERY
    # rows-only query would jump the queue, displacing oracle evidence.
    rows_only_new: list[str] = []
    if last_any:
        next_round = max(last_any.values()) + 1
        never_seen = sorted(n for n in rows_only if n not in last_any)
        stale = sorted(
            (
                n
                for n in rows_only
                if n in last_any
                and next_round - last_any[n] >= _ROWS_ONLY_STALE_ROUNDS
            ),
            key=lambda n: (last_any[n], n),
        )[:_ROWS_ONLY_REFRESH_CAP]
        rows_only_new = never_seen + stale
    rows_only_tail = [n for n in rows_only if n not in rows_only_new]
    oracle_backed = sorted(
        (n for n in QUERIES if n in ORACLE and n not in digests),
        key=lambda n: (last.get(n, 0), n),
    )
    ordered = digests + rows_only_new + oracle_backed + rows_only_tail
    for registry in (QUERIES, ORACLE):
        snapshot = dict(registry)
        registry.clear()
        registry.update({n: snapshot[n] for n in ordered if n in snapshot})


_load_all()
_reorder()
