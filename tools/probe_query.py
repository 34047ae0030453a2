"""Per-query measurement probe (optimization rounds — guide §1).

For each named query: time plan BUILD (python + py4j DataFrame
construction), ANALYSIS (`df.columns`), and N noop-sink executions
(guide §1.4 — noop computes every column, so the timed action is the
computation, not result serialization), plus executor CPU via the UI
REST endpoint when available.  Prints one JSON line per query.

Usage: python tools/probe_query.py [--runs N] [--sf DIR] name [name...]
       python tools/probe_query.py --explain plans/r14 --suffix before name...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trimet_bytes__data_engineering_project_spark.plans import QUERIES  # noqa: E402
from trimet_bytes__data_engineering_project_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="dir to write explain('formatted') into")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = get_session("probe", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import CpuProbe  # type: ignore

    # warm the session the same way bench.py does
    for warm in ("q01_count_on_date", "q11_trips_per_date_dayname", "x14_multimodal_features"):
        QUERIES[warm](spark, args.sf).collect()

    probe = CpuProbe(spark)
    probe.delta_cpu_seconds()
    for name in args.names:
        if name not in QUERIES:
            print(json.dumps({"name": name, "error": "unknown"}))
            continue
        spark.sparkContext.setJobDescription(name)
        rec: dict = {"name": name}
        t0 = time.perf_counter()
        df = QUERIES[name](spark, args.sf)
        rec["build_s"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        df.columns  # forces analysis
        rec["analyze_s"] = round(time.perf_counter() - t0, 4)
        walls, cpus = [], []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 4))
            c = probe.delta_cpu_seconds()
            cpus.append(round(c, 3) if c is not None else None)
        rec["noop_walls"] = walls
        rec["cpus"] = cpus
        # one collect run for the bench-comparable number
        t0 = time.perf_counter()
        n = len(QUERIES[name](spark, args.sf).collect())
        rec["collect_s"] = round(time.perf_counter() - t0, 4)
        rec["rows"] = n
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            plan = QUERIES[name](spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(args.explain, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
