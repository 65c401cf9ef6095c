"""Dump `.explain("formatted")` for headline queries to plans/r<N>/.

Usage:
    python scripts/dump_plans.py before            # plans/r12/<q>_before.txt
    python scripts/dump_plans.py after             # plans/r12/<q>_after.txt
    python scripts/dump_plans.py after q1,q2       # subset

The plan is captured at the bench SF (SPARK_GRAFT_SF_DIR, default sf0.1)
with the bench session config, so the committed files show exactly what
the bench times: Exchange count, join strategy, PushedFilters/ReadSchema,
WholeStageCodegen spans, BatchEvalPython/ArrowEvalPython nodes.

Two fidelity notes, stamped into every file header:

- ``dedup.materialize`` (the result-pinning localCheckpoint several
  candidate-pair/selection queries end with) is BYPASSED here: the real
  query returns a checkpointed frame whose explain is just
  ``Scan ExistingRDD``, which hides the computation the checkpoint
  executed. Bypassing only the final pin makes the dump show the plan
  that actually runs; nothing upstream changes (the eager
  materialize-before-join-planning counts inside the operators, e.g.
  ngram_jaccard_pairs, still run, so broadcast-vs-SMJ decisions are the
  production ones).
- a few queries run bounded eager jobs at plan-BUILD time by design
  (boundary samples, sketch grids, cached-stats materialization);
  building their frames here executes those jobs, same as the bench
  does.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from skiliopay_datapipeline_customer_spark.operators import dedup  # noqa: E402
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
    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{ROUND}",
    )
    os.makedirs(out_dir, exist_ok=True)
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except OSError:
        rev = "unknown"
    # bypass ONLY the final result-pinning checkpoint (see module
    # docstring) — every consumer resolves `materialize` through the
    # dedup module attribute at call time, so patching here covers them
    dedup.materialize = lambda df, *intermediates: df
    header = (
        f"-- plan dump: rev {rev}, sf_dir {sf_dir}, suffix {suffix}\n"
        "-- dedup.materialize (final localCheckpoint pin) bypassed so the\n"
        "-- dumped plan is the computation the checkpoint executes; all\n"
        "-- in-operator eager materializations still ran as in production.\n"
    )
    spark = get_spark(app_name="dump-plans")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(header)
            f.write(formatted_plan(df))
        print(f"wrote {path}")
        # the bypassed pin also skipped the intermediates' unpersist;
        # drop everything between queries so 30+ dumps in one session
        # can't accumulate dead cache
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
