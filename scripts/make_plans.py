"""Regenerate the `explain('formatted')` sections of PLANS.md.

Usage:  python scripts/make_plans.py [query ...]
Prints each query's formatted physical plan at $SPARK_GRAFT_SF_DIR
(default sf0.1); paste the relevant operator trees into PLANS.md after
plan-affecting changes.  With no args, prints the headline evidence set.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

DEFAULT = [
    "courier_metrics",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "join_range_ship_window",
    "asof_prev_error_per_event",
    "window_latest_line_per_order",
    "window_ntile_spend_quartiles",
    "embedding_neardup_pairs",
    "dedup_minhash_lsh",
]


def main() -> None:
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT
    spark = build_session(app_name="make-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        if name not in queries:
            print(f"== {name}: NOT REGISTERED", file=sys.stderr)
            continue
        print(f"\n## {name}\n")
        queries[name](spark, sf_dir).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
