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
   NEVER occupy window slots -- a rows-only query burns a slot on a
   permanent ``no_oracle`` row; pytest recall/property tests cover them.
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
        "cohorts",  # must import LAST: digests read the full ORACLE registry
    ):
        try:
            __import__(f"{__name__}.{mod}")
        except Exception as exc:  # noqa: BLE001 -- re-raise with module context
            raise ImportError(f"query module {__name__}.{mod} failed to import: {exc}") from exc


def _last_verified_rounds() -> dict[str, int]:
    """name -> latest round with a ``hash_match: true`` driver row.

    Read from the ``CORRECTNESS_r*.json`` files the driver commits at the
    repo root.  Absent name (or no files at all, e.g. an installed
    package without the driver artifacts) means never verified -> 0,
    which front-loads the query.  Malformed files are skipped: a corrupt
    artifact must not break ``queries()`` imports.
    """
    last: dict[str, int] = {}
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
            if isinstance(row, dict) and row.get("hash_match") is True:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _reorder() -> None:
    """Apply the standing rotation policy (module docstring): cohort
    digests pinned first (full-registry evidence every round), then
    oracle-backed stalest-first (never-verified -> round 0, name
    tie-break), then rows-only queries in registration order."""
    last = _last_verified_rounds()
    digests = sorted(n for n in QUERIES if n.startswith("cohort_digest_"))
    oracle_backed = sorted(
        (n for n in QUERIES if n in ORACLE and n not in digests),
        key=lambda n: (last.get(n, 0), n),
    )
    rows_only = [n for n in QUERIES if n not in ORACLE and n not in digests]
    ordered = digests + oracle_backed + rows_only
    for registry in (QUERIES, ORACLE):
        snapshot = dict(registry)
        registry.clear()
        registry.update({n: snapshot[n] for n in ordered if n in snapshot})


_load_all()
_reorder()
