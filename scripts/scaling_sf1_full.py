"""Full-headline sf1 scaling record (VERDICT r12 #6).

bench.py --scaling covers the 13 SCALING_QUERIES shapes; the verdict asked
for the sf1 decade over ALL 26 headline queries. bench.py's driver-facing
surface is frozen this round (VERDICT #3: the plan_warmed field must be
its only diff), so the full-set record is produced here with the same
methodology (one session, per-SF page-cache warm, first-run compile
absorbed by a double run at the smallest SF, hygiene between timings) and
written to SCALING_SF1_r{N}.json.

    SPARK_GRAFT_DRIVER_MEM=12g python scripts/scaling_sf1_full.py 13
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


def main() -> None:
    round_num = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    sf_tokens = (
        sys.argv[sys.argv.index("--sfs") + 1].split(",")
        if "--sfs" in sys.argv
        else ["0.01", "0.1", "1"]
    )
    sf_dirs = [bench._resolve_sf_dir(s) for s in sf_tokens]
    sf_list = [os.path.basename(d).replace("sf", "") for d in sf_dirs]
    spark = get_spark(app_name="scaling-sf1-full")
    queries = all_queries()
    spark.range(1).count()
    for sf_d in sf_dirs:
        for name in sorted(os.listdir(sf_d)):
            if name.endswith(".parquet"):
                with open(os.path.join(sf_d, name), "rb") as f:
                    while f.read(1 << 24):
                        pass
    out: dict[str, dict] = {}
    last, prev = sf_list[-1], sf_list[-2]
    for name in bench.HEADLINE:
        fn = queries[name]
        rec: dict[str, float] = {}
        try:
            for i, sf_d in enumerate(sf_dirs):
                sf_key = os.path.basename(sf_d).replace("sf", "")
                if i == 0:
                    bench.force(fn(spark, sf_d))  # absorb codegen, untimed
                    bench.hygiene(spark)
                t0 = time.perf_counter()
                bench.force(fn(spark, sf_d))
                rec[sf_key] = round(time.perf_counter() - t0, 3)
                bench.hygiene(spark)
            rec["t_ratio_last_step"] = (
                round(rec[last] / rec[prev], 3) if rec.get(prev) else None
            )
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            rec["err"] = f"{type(exc).__name__}: {exc}"[:200]
        out[name] = rec
        print(json.dumps({name: rec}), file=sys.stderr)
    record = {
        "metric": "scaling_curve_full_headline",
        "unit": "sec",
        "sfs": [float(s) for s in sf_list],
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "1g(default)"),
        "machine": bench.machine_probe(spark),
        "queries": out,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SCALING_SF1_r{round_num:02d}.json",
    )
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({"written": path, "n": len(out)}))


if __name__ == "__main__":
    main()
