"""Per-query profiling helper for optimization rounds.

For each named query: N repeated noop-forced runs in one plan-warmed
session (same discipline as bench.py), reporting each run, the min
(the contention-robust floor), and the Spark job count of the final run
(fixed-cost proxy: every job is a driver round-trip + stage overhead).

Usage:
    python scripts/profile_queries.py q1,q2 [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from skiliopay_datapipeline_customer_spark.queries import all_queries  # noqa: E402
from skiliopay_datapipeline_customer_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else bench.HEADLINE
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark(app_name="profile")
    queries = all_queries()
    spark.range(1).count()
    tracker = spark.sparkContext.statusTracker()
    print(f"{'query':32s} {'min':>7s} {'jobs':>5s}  runs")
    for name in names:
        fn = queries[name]
        try:
            bench.force(fn(spark, warm_dir))  # plan warmup, untimed
        except Exception:
            pass
        bench.hygiene(spark)
        runs = []
        jobs = 0
        for _ in range(n):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            bench.force(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
            jobs = len(tracker.getJobIdsForGroup(None) or []) - j0
            bench.hygiene(spark)
        print(
            f"{name:32s} {min(runs):7.3f} {jobs:5d}  "
            + " ".join(f"{r:.2f}" for r in runs)
        )


if __name__ == "__main__":
    main()
