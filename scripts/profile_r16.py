"""r16 optimization-round profiler: isolate declared queries with the
noop sink (guide section 1.4) and capture their formatted plans.

For each query name given on the command line:
  - runs the query N times (default 3) under ``df.write.format("noop")``
    so the timed action is the computation, not the bench's hash-fold
    sink, and reports each run plus the median;
  - labels the jobs (``setJobDescription``, guide section 1.5);
  - writes ``plans/r16/<name>_<tag>.txt`` with ``explain("formatted")``
    (tag = --tag, default "before").

Caches are released between queries exactly like bench.py so a query's
median reflects its own intra-query cache reuse, never a predecessor's.

Usage:
  python scripts/profile_r16.py [--tag before|after] [--runs N] name ...
"""

from __future__ import annotations

import io
import statistics
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    args = sys.argv[1:]
    tag, runs = "before", 3
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--runs":
            runs = int(next(it))
        else:
            names.append(a)
    if not names:
        raise SystemExit(__doc__)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.session import (
        build_session,
    )
    from modern_data_lakehouse_pipeline_for_logistics_analytics__spark.operators.dedup import (
        release_caches,
    )
    import __spark_entry__ as entrymod

    spark = build_session(app_name="profile_r16")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    plan_dir = os.path.join(REPO_ROOT, "plans", "r16")
    os.makedirs(plan_dir, exist_ok=True)

    # Warmup mirrors bench.py: absorb JVM/codegen startup on the flagship.
    queries["courier_metrics"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_caches()

    out: dict[str, dict] = {}
    for name in names:
        if name not in queries:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            queries[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        spark.sparkContext._jvm.System.gc()
        ts = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{i} [{tag}]")
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        release_caches()
        med = round(statistics.median(ts), 4)
        out[name] = {"runs": ts, "median": med}
        print(f"{name}: median {med}s runs {ts}", file=sys.stderr)

    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
