"""Memory-residue probe: back-to-back heavy runs with bench.hygiene between.

VERDICT r12 #4 evidence tool. For each of N identical runs of a query:
time it, run bench.hygiene, then record host-speed-independent JVM facts
via the management MXBeans — stored-RDD count/bytes (ContextCleaner
effectiveness), G1 Old Gen pool usage (the ~480 MB one-cycle-late py4j
detach residue measured in r12), and cumulative old-generation GC time
(the within-session degradation mechanism). A BOUNDED residue shows as
flat old-gen usage and flat run times across iterations; a LEAK shows as
monotone growth (r12 pre-fix: 88 -> 561/563/565 MB and 35.6 -> 57.5 ->
59.2 s over three dedup_clusters runs).

    SPARK_GRAFT_DRIVER_MEM=12g python scripts/probe_memory.py dedup_clusters 4 \
        --sf-dir testdata_local/sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from skiliopay_datapipeline_customer_spark.queries import all_queries  # noqa: E402
from skiliopay_datapipeline_customer_spark.session import get_spark  # noqa: E402


def jvm_facts(spark) -> dict:
    jvm = spark.sparkContext._jvm
    sc = spark.sparkContext._jsc.sc()
    stored = sc.getRDDStorageInfo()
    old_gen = None
    for pool in jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans().toArray():
        if "Old Gen" in pool.getName() or "Tenured" in pool.getName():
            old_gen = pool.getUsage().getUsed()
    old_gc_ms = 0
    for gc in jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans().toArray():
        if "Old" in gc.getName() or "MarkSweep" in gc.getName() or "Mixed" in gc.getName():
            old_gc_ms += gc.getCollectionTime()
    return {
        "stored_rdds": len(stored),
        "stored_mem_bytes": int(sum(s.memSize() for s in stored)),
        "old_gen_used_mb": round((old_gen or 0) / 1e6, 1),
        "old_gc_cum_ms": int(old_gc_ms),
    }


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "dedup_clusters"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    sf_dir = sf_dir or "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe-memory")
    spark.range(1).count()
    fn = all_queries()[name]
    recs = []
    print(json.dumps({"probe": "start", **jvm_facts(spark)}))
    for i in range(n):
        t0 = time.perf_counter()
        bench.force(fn(spark, sf_dir))
        dt = round(time.perf_counter() - t0, 3)
        bench.hygiene(spark)
        rec = {"run": i + 1, "sec": dt, **jvm_facts(spark)}
        recs.append(rec)
        print(json.dumps(rec))
    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "runs": [r["sec"] for r in recs],
        "old_gen_mb": [r["old_gen_used_mb"] for r in recs],
        "stored_rdds": [r["stored_rdds"] for r in recs],
        "flat": max(r["sec"] for r in recs) <= 1.6 * min(r["sec"] for r in recs),
    }))


if __name__ == "__main__":
    main()
