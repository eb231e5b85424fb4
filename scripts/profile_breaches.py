"""Quiet-host profiling for bench-budget re-seeding (r11).

Runs each target query as median-of-3 (bench.py's exact timing policy),
FIVE times, with the contention sentinel (`tpch_q6_forecast_revenue`,
quiet ~0.16-0.19s) measured before and after every battery so each
median carries its own contention tag.  Output: one JSON line per query
with the 5 medians + sentinel readings, ready to paste into
BENCH_BUDGET.json provenance.

Usage: python scripts/profile_breaches.py [query ...]
Defaults to the 8 r10 driver-confirmed breach queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

R10_BREACHES = [
    "dedup_simhash_candidates",
    "cdc_apply_order_changes",
    "text_quality_scores",
    "dedup_jaccard_pairs",
    "ann_portable_topk",
    "tpch_q7_volume_shipping",
    "embedding_neardup_lsh",
    "dedup_clusters_lsh",
]

SENTINEL = "tpch_q6_forecast_revenue"


def main() -> None:
    targets = sys.argv[1:] or R10_BREACHES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        release_caches,
    )
    import __spark_entry__ as entrymod

    from bench import consume

    # Default mirrors bench.py's canonical action (r12: materialize) --
    # a breach re-profile under a different action would measure a
    # different plan and "not reproduce" spuriously (review finding).
    action = os.environ.get("SPARK_GRAFT_BENCH_ACTION", "materialize")
    spark = build_session(app_name="profile_breaches")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warmup (same as bench.py: UNDER the timed action, so the
    # hash-fold codegen is absorbed here and the first sentinel reading
    # is not mis-tagged as contention) + sentinel warm.
    consume(queries["courier_metrics"](spark, sf_dir), action)
    consume(queries[SENTINEL](spark, sf_dir), action)

    def median3(name: str) -> float:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            consume(queries[name](spark, sf_dir), action)
            runs.append(time.perf_counter() - t0)
        return round(sorted(runs)[1], 4)

    for name in targets:
        meds, sentinels = [], []
        for _ in range(5):
            sentinels.append(median3(SENTINEL))
            meds.append(median3(name))
            release_caches()
        sentinels.append(median3(SENTINEL))
        print(
            json.dumps(
                {
                    "query": name,
                    "action": action,
                    "medians": meds,
                    "min_median": min(meds),
                    "sentinels": sentinels,
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
