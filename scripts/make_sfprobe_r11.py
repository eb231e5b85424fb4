"""Synthesize the r11 10x scale-probe corpus (/tmp/sfprobe3) and run the
four r10-verdict heavy-tail queries against sf0.1 and the probe, one
COLD process per (query, scale) measurement -- same methodology as the
r8 probes recorded in PLANS.md.

Probe construction (from sf0.1):

- ``documents``: 10 replicas, doc_id shifted, TEXT UNCHANGED -- the
  vocabulary (and hence BPE's distinct-word training table) is constant
  while occurrence counts scale 10x, which is exactly the claim under
  test for ``bpe_learned_merges`` (near-flat wall).
- ``orders``: 10 replicas, o_orderkey/o_custkey shifted per replica --
  ``sortkey_pruning_audit``'s global-rank exchanges see 10x rows.
- ``lineitem``: 10 replicas, l_partkey/l_suppkey/l_orderkey shifted --
  10 disjoint part->supplier subgraphs for ``hits_part_supplier``.
- ``supplier``: 10 replicas, s_suppkey shifted, letters of s_name
  Caesar-shifted per replica (bijective per replica, so intra-replica
  name structure survives; cross-replica window pairs in the sorted
  neighborhood score low and stay linear) for ``er_golden_suppliers``.
- every other table copied through unchanged.

Usage:
  python scripts/make_sfprobe_r11.py build          # write /tmp/sfprobe3
  python scripts/make_sfprobe_r11.py run <query> <sf_dir>   # one cold timing
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sfprobe3"
R = 10
SHIFT = 10_000_000


def _replicate(spark, table: str, shifts: dict[str, int], dst: str, extra=None):
    """Shift-replicate a fixture table R times into ``dst`` (shared by
    every probe-corpus builder -- r12 review: build_events had inlined a
    diverging copy of this loop)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    parts = []
    for k in range(R):
        p = df
        for col, base in shifts.items():
            p = p.withColumn(col, F.col(col) + F.lit(k * base))
        if extra is not None:
            p = extra(p, k)
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
    print(f"{table}: {out.count()} rows", flush=True)


def _copy_through(tables: list[str], dst: str) -> None:
    import shutil

    for t in tables:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied", flush=True)


def build() -> None:
    from pyspark.sql import functions as F

    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )

    spark = build_session(app_name="make-sfprobe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    def caesar_name(p, k):
        if k == 0:
            return p
        # bijective per-replica letter map: rotate a-z / A-Z by k
        az = "abcdefghijklmnopqrstuvwxyz"
        src_s = az + az.upper()
        dst_s = az[k:] + az[:k] + (az[k:] + az[:k]).upper()
        return p.withColumn("s_name", F.translate(F.col("s_name"), src_s, dst_s))

    _replicate(spark, "documents", {"doc_id": SHIFT}, DST)
    _replicate(spark, "orders", {"o_orderkey": SHIFT, "o_custkey": SHIFT}, DST)
    _replicate(
        spark,
        "lineitem",
        {"l_orderkey": SHIFT, "l_partkey": SHIFT, "l_suppkey": SHIFT},
        DST,
    )
    _replicate(spark, "supplier", {"s_suppkey": SHIFT}, DST, extra=caesar_name)
    _copy_through(["region", "nation", "customer", "part", "events", "embeddings"], DST)
    spark.stop()


def build_events() -> None:
    """r12: /tmp/sfprobe4 -- events replicated 10x (event_id/user_id
    shifted per replica, so 10x users each with an intact per-user
    journey; channel mix and per-user path shapes are preserved) for
    probing the event-stream heavies (shapley/attribution/funnel);
    every other table copied through unchanged."""
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )

    dst = "/tmp/sfprobe4"
    spark = build_session(app_name="make-sfprobe4")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    _replicate(spark, "events", {"event_id": SHIFT, "user_id": SHIFT}, dst)
    _copy_through(
        ["region", "nation", "customer", "part", "supplier", "orders",
         "lineitem", "documents", "embeddings"],
        dst,
    )
    spark.stop()


def run(query: str, sf_dir: str) -> None:
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )
    import __spark_entry__ as entrymod
    from bench import consume

    # r12: probes honor SPARK_GRAFT_BENCH_ACTION (default materialize)
    # -- the r8-r11 probe tables timed `.count()`, which inherits the
    # count()-elimination blind spot for trailing-operator queries; the
    # action printed is the action that RAN (a MapType output falls back
    # to count and is labeled as such), and rows= rides the same timed
    # job (consume returns the cardinality), so the query executes once.
    action = os.environ.get("SPARK_GRAFT_BENCH_ACTION", "materialize")
    spark = build_session(app_name="sfprobe-run")
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()[query]
    fallbacks: set[str] = set()
    t0 = time.perf_counter()
    n = consume(q(spark, sf_dir), action, query, fallbacks)
    dt = time.perf_counter() - t0
    ran = "count(fallback)" if query in fallbacks else action
    print(
        f"PROBE {query} {sf_dir} action={ran} cold_sec={dt:.2f} rows={n}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    elif sys.argv[1] == "build-events":
        build_events()
    else:
        run(sys.argv[2], sys.argv[3])
