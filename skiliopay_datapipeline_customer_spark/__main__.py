"""Command-line entry points — the engine twin of the reference's
`scripts/run_*.py` operational surface (SURVEY §3.4: run_ingestion /
run_processing / run_warehouse / run_training / check_daily_data, each a
thin script over the library).

    python -m skiliopay_datapipeline_customer_spark list
    python -m skiliopay_datapipeline_customer_spark run <query> [--sf-dir D] [--limit N] [--json]
    python -m skiliopay_datapipeline_customer_spark check <query> [--sf-dir D]
    python -m skiliopay_datapipeline_customer_spark quality [--sf-dir D]
    python -m skiliopay_datapipeline_customer_spark train [--sf-dir D] [--model gbt]

`run` executes one declared query and prints rows; `check` also runs the
query's DuckDB oracle and reports the comparison — the driver's correctness
gate as a shell one-liner. `quality` runs the composite data-quality gate
over the orders table; `train` runs the churn training task and prints the
deploy-gate decision (the reference's run_training.py + DAG evaluate_model
in one step).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(cpus: str = "8"):
    from .session import get_spark

    return get_spark(app_name="engine-cli", cpus=cpus)


def cmd_list(args) -> int:
    from .queries import ORACLES, all_queries

    for name in all_queries():
        tag = "oracle" if name in ORACLES else "rows-only"
        print(f"{name}\t{tag}")
    return 0


def cmd_run(args) -> int:
    from .queries import all_queries

    queries = all_queries()
    if args.query not in queries:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    df = queries[args.query](_spark(args.cpus), args.sf_dir)
    rows = df.limit(args.limit).collect()
    if args.json:
        print(json.dumps([r.asDict(recursive=True) for r in rows], default=str))
    else:
        for r in rows:
            print("\t".join(str(v) for v in r))
    return 0


def cmd_check(args) -> int:
    from .parity import compare_frames, duckdb_connection
    from .queries import ORACLES, all_queries

    queries = all_queries()
    if args.query not in queries:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    pdf = queries[args.query](_spark(args.cpus), args.sf_dir).toPandas()
    if args.query not in ORACLES:
        print(f"{args.query}: rows-only ({len(pdf)} rows, no oracle)")
        return 0
    con = duckdb_connection(args.sf_dir)
    try:  # close even when the oracle SQL errors (missing fixture table)
        problems = compare_frames(
            pdf, con.execute(ORACLES[args.query]).fetchdf()
        )
    finally:
        con.close()
    if problems:
        print(f"{args.query}: MISMATCH {problems}")
        return 1
    print(f"{args.query}: OK ({len(pdf)} rows match the oracle)")
    return 0


def cmd_quality(args) -> int:
    from pyspark.sql import functions as F

    from .io import table
    from .plans.quality import run_quality_checks

    orders = table(_spark(args.cpus), args.sf_dir, "orders")
    report = run_quality_checks(
        orders,
        key_columns=["o_orderkey"],
        completeness_columns=["o_orderkey", "o_custkey", "o_totalprice"],
        validity_rules={"neg_price": F.col("o_totalprice") < 0},
        outlier_columns=["o_totalprice"],
    )
    print(json.dumps({"overall": report.overall, "passed": report.passed,
                      "scores": report.scores}, default=str))
    return 0 if report.passed else 1


def cmd_train(args) -> int:
    from pyspark.sql import functions as F

    from .ml.dataset import FEATURE_COLS, LABEL_COL, churn_dataset
    from .ml.pipeline import deploy_gate, evaluate_classifier, train_classifier
    from .ml.split import stratified_split

    ds = stratified_split(
        churn_dataset(_spark(args.cpus), args.sf_dir), LABEL_COL, key_col="c_custkey"
    ).cache()
    model, transform = train_classifier(
        ds.filter(F.col("_split") == 0), FEATURE_COLS, LABEL_COL,
        model_type=args.model,
    )
    metrics = evaluate_classifier(
        transform(ds.filter(F.col("_split") == 2)), LABEL_COL
    )
    decision = deploy_gate(metrics)
    print(json.dumps({"metrics": metrics, "deploy": decision["deploy"]}))
    return 0 if decision["deploy"] else 1


def cmd_sql(args) -> int:
    from .sql import run_sql

    spark = _spark(args.cpus)
    rows = run_sql(spark, args.sf_dir, args.statement).limit(args.limit).collect()
    if args.json:
        print(json.dumps([r.asDict(recursive=True) for r in rows], default=str))
    else:
        for r in rows:
            print("\t".join(str(v) for v in r))
    return 0


def cmd_explain(args) -> int:
    from .plans.report import plan_digest
    from .queries import all_queries

    queries = all_queries()
    if args.query not in queries:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    df = queries[args.query](_spark(args.cpus), args.sf_dir)
    print(json.dumps(plan_digest(df)))
    return 0


def cmd_freshness(args) -> int:
    from .sources.snapshots import freshness_report

    layers = {}
    for spec in args.layer:
        # name is colon-free; the PATH may carry colons (s3a://bucket/...),
        # so split the name off the left and the prefix off the right
        name, rest = spec.split(":", 1)
        base_dir, prefix = rest.rsplit(":", 1)
        layers[name] = (base_dir, prefix)
    report = freshness_report(
        _spark(args.cpus), layers, expected_stamp=args.expected
    )
    print(json.dumps(report))
    return 0 if all(r["fresh"] for r in report) else 1


def cmd_dag(args) -> int:
    """Run the churn pipeline as the reference's task graph (quality check
    -> ingest -> process -> {warehouse, train} -> evaluate -> gated deploy),
    printing per-task states — `airflow dags trigger` without the daemon."""
    import tempfile

    from pyspark.sql import functions as F

    from .io import table
    from .ml.dataset import FEATURE_COLS, LABEL_COL, churn_dataset
    from .ml.pipeline import deploy_gate, evaluate_classifier, train_classifier
    from .ml.split import stratified_split
    from .pipelines.dag import ONE_FAILED, Dag, Task

    spark = _spark(args.cpus)
    out_dir = args.out or tempfile.mkdtemp(prefix="churn_dag_")
    dag = Dag("churn")
    dag.add(Task("check_data_quality",
                 lambda r: {"rows": table(spark, args.sf_dir, "customer").count()}))
    dag.add(Task("ingest_data", lambda r: args.sf_dir),
            upstream=["check_data_quality"])
    dag.add(
        Task(
            "process_data",
            lambda r: stratified_split(
                churn_dataset(spark, r["ingest_data"]), LABEL_COL,
                key_col="c_custkey",
            ).cache(),
        ),
        upstream=["ingest_data"],
    )
    dag.add(
        Task(
            "load_to_warehouse",
            lambda r: r["process_data"].write.mode("overwrite").parquet(
                f"{out_dir}/features.parquet"
            ),
        ),
        upstream=["process_data"],
    )

    def train(r):
        ds = r["process_data"]
        model, transform = train_classifier(
            ds.filter(F.col("_split") == 0), FEATURE_COLS, LABEL_COL,
            model_type=args.model,
        )
        return {"model": model, "transform": transform,
                "test": ds.filter(F.col("_split") == 2)}

    dag.add(Task("train_model", train), upstream=["process_data"])
    dag.add(
        Task(
            "evaluate_model",
            lambda r: evaluate_classifier(
                r["train_model"]["transform"](r["train_model"]["test"]), LABEL_COL
            ),
        ),
        upstream=["train_model"],
    )

    def deploy(r):
        decision = deploy_gate(r["evaluate_model"])
        if not decision["deploy"]:
            raise ValueError(f"below deploy thresholds: {decision['checks']}")
        r["train_model"]["model"].write().overwrite().save(f"{out_dir}/model")
        return f"{out_dir}/model"

    dag.add(Task("deploy_model", deploy), upstream=["evaluate_model"])
    dag.add(Task("notify_failure", lambda r: "alert", trigger_rule=ONE_FAILED),
            upstream=["load_to_warehouse", "deploy_model"])
    run = dag.run()
    print(json.dumps({
        "ok": run.ok,
        "out_dir": out_dir,
        "states": {t: {"state": st.state, "attempts": st.attempts,
                       "error": st.error} for t, st in run.states.items()},
        "metrics": run.results.get("evaluate_model"),
    }, default=str))
    return 0 if run.ok else 1


def cmd_maintain(args) -> int:
    """Run the lake-maintenance pair on a parquet directory: small-file
    compaction (OPTIMIZE) and, for the versioned snapshot layout, version
    vacuum (VACUUM RETAIN) — the operational half of the maintenance
    quartet (ANALYZE and Z-order are table/layout decisions, not routine)."""
    from .pipelines.wap import vacuum_versions
    from .sources.catalog import compact_small_files

    out = {}
    if args.vacuum_keep is not None:
        out["vacuum"] = vacuum_versions(args.path, keep_last=args.vacuum_keep)
    else:
        out["compact"] = compact_small_files(
            _spark(args.cpus), args.path,
            target_file_bytes=args.target_mb * 1024 * 1024,
        )
    print(json.dumps(out))
    return 0


def main(argv: list[str] | None = None) -> int:
    # --sf-dir/--cpus are accepted BOTH before and after the subcommand (the
    # module docstring advertises the postfix form). The shared parent uses
    # SUPPRESS defaults so a subparser only writes the attribute when the
    # flag is actually given — otherwise a subparser default would clobber a
    # value parsed by the root (the classic argparse parents gotcha).
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--sf-dir", default=argparse.SUPPRESS)
    common.add_argument("--cpus", default=argparse.SUPPRESS)
    p = argparse.ArgumentParser(prog="skiliopay_datapipeline_customer_spark")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--cpus", default="8")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", parents=[common])
    runp = sub.add_parser("run", parents=[common])
    runp.add_argument("query")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--json", action="store_true")
    checkp = sub.add_parser("check", parents=[common])
    checkp.add_argument("query")
    sub.add_parser("quality", parents=[common])
    trainp = sub.add_parser("train", parents=[common])
    trainp.add_argument("--model", default="gbt")
    sqlp = sub.add_parser("sql", parents=[common])
    sqlp.add_argument("statement")
    sqlp.add_argument("--limit", type=int, default=20)
    sqlp.add_argument("--json", action="store_true")
    explainp = sub.add_parser("explain", parents=[common])
    explainp.add_argument("query")
    dagp = sub.add_parser("dag", parents=[common])
    dagp.add_argument("--model", default="lr")
    dagp.add_argument("--out", default=None)
    maintp = sub.add_parser("maintain", parents=[common])
    maintp.add_argument("path")
    maintp.add_argument("--target-mb", type=int, default=128)
    maintp.add_argument("--vacuum-keep", type=int, default=None)
    freshp = sub.add_parser("freshness", parents=[common])
    freshp.add_argument(
        "--layer",
        action="append",
        required=True,
        help="name:base_dir:prefix (repeatable)",
    )
    freshp.add_argument("--expected", default=None)
    args = p.parse_args(argv)
    return {
        "list": cmd_list,
        "run": cmd_run,
        "check": cmd_check,
        "quality": cmd_quality,
        "train": cmd_train,
        "sql": cmd_sql,
        "freshness": cmd_freshness,
        "explain": cmd_explain,
        "maintain": cmd_maintain,
        "dag": cmd_dag,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
