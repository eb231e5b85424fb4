"""Oracle-change snapshot for the verification rotation (r15, advice item).

The mechanical stalest-first rotation in ``plans/__init__._reorder``
ranks oracle-backed queries by their last hash-green driver round -- so
a query whose ORACLE (or implementation semantics) changed this round
keeps its old recent-verification rank and can sit unverified for up to
~8 rounds (r14 advice: ``zipf_vocabulary_audit`` and
``runs_test_daily_revenue`` changed in r14 but were absent from the r14
window).  This script records a content hash per registered oracle SQL
in ``plans/oracle_snapshot.json``; the rotation front-loads any query
whose CURRENT oracle hash differs from the snapshot, or whose snapshot
``round`` (the round the change shipped in) is newer than its last
hash-green driver round.

Run AFTER editing oracles, in the same commit: changed entries are
re-stamped with ``round = max(CORRECTNESS round) + 1`` (the upcoming
driver round); unchanged entries keep their existing stamp, so a query
stops being front-loaded as soon as a driver round >= its stamp
verifies it.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SNAP_PATH = os.path.join(
    REPO_ROOT,
    "modern_data_lakehouse_pipeline_for_logistics_analytics__spark",
    "plans",
    "oracle_snapshot.json",
)


def _next_round() -> int:
    rounds = [0]
    for name in os.listdir(REPO_ROOT):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def main() -> None:
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans import (
        ORACLE,
    )

    # --init stamps every entry round 0 (baseline: nothing front-loaded);
    # known r14-changed pairs are then stamped explicitly below.
    init = "--init" in sys.argv
    try:
        with open(SNAP_PATH) as fh:
            snap = json.load(fh)
    except OSError:
        snap = {}

    nxt = _next_round()
    changed = []
    for name, sql in ORACLE.items():
        h = hashlib.sha256(sql.encode()).hexdigest()[:16]
        prev = snap.get(name)
        if prev is None or prev["hash"] != h:
            snap[name] = {"hash": h, "round": 0 if init else nxt}
            changed.append(name)
    # Drop unregistered names so renames don't linger.
    for name in list(snap):
        if name not in ORACLE:
            del snap[name]
            changed.append(f"-{name}")
    if init:
        # r14 advice: these two changed in r14 (NULL-slope guard / oracle
        # NULL filter) and were not driver-verified that round.
        for name in ("zipf_vocabulary_audit", "runs_test_daily_revenue"):
            if name in snap:
                snap[name]["round"] = 14

    with open(SNAP_PATH, "w") as fh:
        json.dump(snap, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"{len(snap)} entries; {len(changed)} updated: {sorted(changed)[:20]}")


if __name__ == "__main__":
    main()
