"""Benchmark runner — driver contract (see repo brief).

Runs the full registered query corpus at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and
prints ONE JSON line with per-query wall seconds.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from trimet_bytes__data_engineering_project_spark.plans import QUERIES
from trimet_bytes__data_engineering_project_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_session("trimet-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: session bootstrap + parquet footers (q01), JVM locale /
    # date-formatter init (q11 is the first date_format user), and the
    # Python-worker pool spawn (x14 is the first mapInPandas user).
    # Without these, whichever query runs first absorbs multi-second
    # one-time JVM costs that say nothing about its plan.
    for warm in ("q01_count_on_date", "q11_trips_per_date_dayname", "x14_multimodal_features"):
        QUERIES[warm](spark, sf_dir).collect()

    # Per-query time = min of 2 consecutive runs: local[32] on a shared
    # box shows ±15% scheduling/GC jitter at sub-second query scales,
    # and min-of-2 is the standard way to measure the plan, not the
    # noise.  Each run re-plans and re-scans (no .cache() anywhere).
    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "query_corpus_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
