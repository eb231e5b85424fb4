"""Build the r12 materialized-action budget file from battery passes.

Input: N bench JSON payloads produced by
``SPARK_GRAFT_BENCH_ACTION=materialize python bench.py`` on a quiet
host (each already a median-of-3 per query).  Output:
``BENCH_BUDGET_MATERIALIZED.json`` -- per-query budget = min of the
per-pass medians x2 (the r11 headroom rule: a 2x-contended host still
clears the 1.5x gate), with the source medians embedded so provenance
never leaves the artifact.

r12: this is now THE budget pipeline -- bench.py's default action is
``materialize`` and BENCH_BUDGET.json is the output of this script
(the r4-r11 count-action budgets are preserved as
``BENCH_BUDGET_COUNT_LEGACY.json`` for the historical record).  The
swap happens manually after validating a fresh gating pass against
the candidate file.

Usage: python scripts/seed_materialized_budgets.py /tmp/mat_battery_*.json
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    paths = sys.argv[1:]
    if len(paths) < 3:
        raise SystemExit("need >= 3 battery payloads for a stable min")
    passes = []
    for p in paths:
        with open(p) as fh:
            d = json.load(fh)
        if d.get("action") != "materialize":
            raise SystemExit(f"{p} is not a materialized-action payload")
        passes.append(d["queries"])
    names = set(passes[0])
    union = set(passes[0])
    for q in passes[1:]:
        names &= set(q)
        union |= set(q)
    if union - names:
        # A query missing from even one pass would be seeded with NO
        # budget and the gate would skip it forever (review finding) --
        # refuse, naming the offenders, instead of silently ungating.
        raise SystemExit(
            f"passes disagree on the query set; missing from some pass: "
            f"{sorted(union - names)} -- collect matched passes"
        )
    budgets = {}
    medians = {}
    for n in sorted(names):
        obs = [p[n] for p in passes]
        budgets[n] = round(min(obs) * 2, 4)
        medians[n] = obs
    out = {
        "action": "materialize",  # bench.py refuses to gate on a mismatch
        "budgets": budgets,
        "multiplier": 2.0,
        "source": "min of per-pass median-of-3 under SPARK_GRAFT_BENCH_ACTION=materialize",
        "passes": len(passes),
        "per_pass_medians": medians,
        "policy": (
            "r12 materialized re-baseline: budget = 2x the min of "
            f"{len(passes)} quiet-host materialized median-of-3 battery "
            "passes (post weak-query fixes: semdedup GEMM + scaled "
            "geometry, theilsen distributed median, resample input "
            "cache). Gate semantics unchanged (breach iff t > budget * "
            "1.5 * contention normalizer, confirmation retry). Sentinel "
            "tpch_q6_forecast_revenue quiet floor ~0.16-0.19s under "
            "count; materialized sentinel readings live in the per-pass "
            "medians here."
        ),
    }
    dest = os.path.join(REPO_ROOT, "BENCH_BUDGET_MATERIALIZED.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {dest}: {len(budgets)} budgets from {len(passes)} passes")


if __name__ == "__main__":
    main()
