"""Dump `.explain("formatted")` for headline queries to plans/r<N>/.

Usage:
    python scripts/dump_plans.py before            # plans/r12/<q>_before.txt
    python scripts/dump_plans.py after             # plans/r12/<q>_after.txt
    python scripts/dump_plans.py after q1,q2       # subset

The plan is captured at the bench SF (SPARK_GRAFT_SF_DIR, default sf0.1)
with the bench session config, so the committed files show exactly what
the bench times: Exchange count, join strategy, PushedFilters/ReadSchema,
WholeStageCodegen spans, BatchEvalPython/ArrowEvalPython nodes.

Note: a few queries run bounded eager jobs at plan-BUILD time by design
(boundary samples, sketch grids, cached-stats materialization); building
their frames here executes those jobs, same as the bench does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from skiliopay_datapipeline_customer_spark.queries import all_queries  # noqa: E402
from skiliopay_datapipeline_customer_spark.session import get_spark  # noqa: E402

ROUND = os.environ.get("SPARK_GRAFT_ROUND", "12")


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    names = only or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{ROUND}",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
