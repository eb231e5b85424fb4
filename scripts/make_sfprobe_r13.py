"""Synthesize the r13 10x scale-probe corpus (/tmp/sfprobe_r13) and time
the seven r12-verdict iterative heavies at sf0.1 vs the probe, one COLD
process per (query, scale) measurement under the MATERIALIZED bench
action -- same methodology as the r8/r11 probes recorded in PLANS.md.

Probe construction (from sf0.1):

- ``documents``: 10 replicas, doc_id shifted, TEXT CAESAR-SHIFTED per
  replica (bijective a-z/A-Z rotation).  Unlike the r11 probe's
  text-unchanged replicas (built for BPE's flat-vocabulary claim),
  identical text here would make every doc a 10-way EXACT duplicate:
  LSH band buckets would hold all 10 copies and candidate pairs would
  scale ~C(10,2)=45x per doc -- measuring duplicate-inflation, not data
  scaling.  A real 10x corpus grows near-dup pairs ~linearly; the
  per-replica rotation makes cross-replica shingle sets disjoint, so
  pairs/edges scale 10x and ``dedup_clusters_portable`` is probed in
  the regime its 100 TB claim describes.  For ``bpe_learned_merges``
  this same rotation means the distinct-word training table ALSO grows
  10x (vocabulary stress, strictly harder than Heaps-law reality); the
  complementary flat-vocab regime is the r11 probe row in PLANS.md.
- ``lineitem``: 10 replicas, l_orderkey/l_partkey/l_suppkey shifted --
  10 disjoint part<->supplier subgraphs, edge set 10x for the five
  graph fixed-point queries (pagerank/cheapest_reach/bfs/kcore/hits).
- ``supplier``: 10 replicas, s_suppkey shifted (seed selection sees the
  10x node set; acctbal ties across replicas break by key, which only
  relocates the seed set -- the timed work is the 10x edge relaxation).
- every other table copied through unchanged.

Usage:
  python scripts/make_sfprobe_r13.py build
  python scripts/make_sfprobe_r13.py run <query> <sf_dir>  # one cold timing
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from make_sfprobe_r11 import SHIFT, _copy_through, _replicate  # noqa: E402

DST = "/tmp/sfprobe_r13"

QUERIES_UNDER_TEST = [
    "pagerank_part_supplier",
    "cheapest_reach_part_supplier",
    "bfs_hops_part_supplier",
    "kcore_part_supplier",
    "hits_part_supplier",
    "dedup_clusters_portable",
    "bpe_learned_merges",
]


def build() -> None:
    from pyspark.sql import functions as F

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )

    spark = build_session(app_name="make-sfprobe-r13")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    az = "abcdefghijklmnopqrstuvwxyz"

    def caesar_text(p, k):
        if k == 0:
            return p
        rot = az[k:] + az[:k]
        return p.withColumn(
            "text", F.translate(F.col("text"), az + az.upper(), rot + rot.upper())
        )

    _replicate(spark, "documents", {"doc_id": SHIFT}, DST, extra=caesar_text)
    _replicate(
        spark,
        "lineitem",
        {"l_orderkey": SHIFT, "l_partkey": SHIFT, "l_suppkey": SHIFT},
        DST,
    )
    _replicate(spark, "supplier", {"s_suppkey": SHIFT}, DST)
    _copy_through(
        ["region", "nation", "customer", "part", "orders", "events", "embeddings"],
        DST,
    )
    spark.stop()


def run(query: str, sf_dir: str) -> None:
    """One cold-process measurement: build the tuned session, GC, run the
    query under the materialized consume three times (first = cold,
    includes scan + codegen; report all three and the warm median)."""
    from bench import consume

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.plans import (
        QUERIES,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )

    spark = build_session(app_name=f"sfprobe-r13-{query}")
    spark.sparkContext.setLogLevel("ERROR")
    times = []
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        consume(QUERIES[query](spark, sf_dir), "materialize")
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "query": query,
                "sf_dir": sf_dir,
                "cold": times[0],
                "warm": sorted(times[1:])[0:2],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        run(sys.argv[2], sys.argv[3])
