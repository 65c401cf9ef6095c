"""Task-graph orchestrator tests — the reference DAG's semantics
(dags/churn_prediction_pipeline.py): retries, XCom result passing,
all_success/one_failed trigger rules, failure propagation, and the full
churn pipeline composed as a graph over the engine's own stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skiliopay_datapipeline_customer_spark.io import table
from skiliopay_datapipeline_customer_spark.pipelines.dag import (
    ALL_SUCCESS,
    FAILED,
    ONE_FAILED,
    SKIPPED,
    SUCCESS,
    UPSTREAM_FAILED,
    Dag,
    Task,
)


def _t(tid, fn=None, **kw):
    return Task(tid, fn or (lambda results: tid), **kw)


def test_topological_order_is_deterministic_and_respects_edges():
    runs = []
    for _ in range(3):
        dag = Dag("d")
        dag.add(_t("a"))
        dag.add(_t("c"), upstream=["a"])
        dag.add(_t("b"), upstream=["a"])
        dag.add(_t("d"), upstream=["b", "c"])
        runs.append(dag.run().order)
    assert runs[0] == runs[1] == runs[2]
    order = runs[0]
    assert order.index("a") < order.index("b") < order.index("d")
    assert order.index("a") < order.index("c") < order.index("d")


def test_results_pass_downstream_like_xcom():
    dag = Dag("d")
    dag.add(_t("load", lambda r: {"n": 21}))
    dag.add(
        _t("double", lambda r: r["load"]["n"] * 2), upstream=["load"]
    )
    run = dag.run()
    assert run.ok
    assert run.results["double"] == 42


def test_retries_with_delay_then_success():
    sleeps = []
    attempts = {"n": 0}

    def flaky(results):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    dag = Dag("d", sleeper=sleeps.append)
    dag.add(_t("flaky", flaky, retries=2, retry_delay_s=5.0))
    run = dag.run()
    assert run.states["flaky"].state == SUCCESS
    assert run.states["flaky"].attempts == 3
    assert sleeps == [5.0, 5.0]  # reference: retries=2, retry_delay=5min


def test_retries_exhausted_marks_failed_and_records_error():
    dag = Dag("d")
    dag.add(_t("boom", lambda r: 1 / 0, retries=1))
    run = dag.run()
    assert not run.ok
    st = run.states["boom"]
    assert st.state == FAILED and st.attempts == 2
    assert "ZeroDivisionError" in st.error


def test_failure_propagates_and_one_failed_terminal_fires():
    ran = []

    def track(tid, fail=False):
        def fn(results):
            ran.append(tid)
            if fail:
                raise RuntimeError("boom")
            return tid

        return fn

    dag = Dag("d")
    dag.add(_t("ingest", track("ingest")))
    dag.add(_t("process", track("process", fail=True)), upstream=["ingest"])
    dag.add(_t("train", track("train")), upstream=["process"])
    dag.add(_t("deploy", track("deploy")), upstream=["train"])
    dag.add(
        Task("on_success", track("on_success"), trigger_rule=ALL_SUCCESS),
        upstream=["deploy"],
    )
    dag.add(
        Task("on_failure", track("on_failure"), trigger_rule=ONE_FAILED),
        upstream=["deploy", "process"],
    )
    run = dag.run()
    assert run.states["process"].state == FAILED
    assert run.states["train"].state == UPSTREAM_FAILED
    assert run.states["deploy"].state == UPSTREAM_FAILED
    # the all_success terminal never ran; the one_failed terminal did
    assert run.states["on_success"].state == UPSTREAM_FAILED
    assert run.states["on_failure"].state == SUCCESS
    assert ran == ["ingest", "process", "on_failure"]


def test_one_failed_terminal_skipped_on_clean_run():
    dag = Dag("d")
    dag.add(_t("a"))
    dag.add(Task("alert", lambda r: "sent", trigger_rule=ONE_FAILED), upstream=["a"])
    run = dag.run()
    assert run.ok
    assert run.states["alert"].state == SKIPPED
    assert "alert" not in run.results


def test_skip_cascades_through_all_success_tasks():
    dag = Dag("d")
    dag.add(_t("a"))
    dag.add(Task("alert", lambda r: "sent", trigger_rule=ONE_FAILED), upstream=["a"])
    dag.add(_t("after_alert"), upstream=["alert"])
    run = dag.run()
    assert run.states["after_alert"].state == SKIPPED
    assert run.ok


def test_add_validates_ids_and_edges():
    dag = Dag("d")
    dag.add(_t("a"))
    with pytest.raises(ValueError, match="duplicate"):
        dag.add(_t("a"))
    with pytest.raises(ValueError, match="unknown upstream"):
        dag.add(_t("b"), upstream=["nope"])
    with pytest.raises(ValueError, match="trigger_rule"):
        Task("x", lambda r: None, trigger_rule="always")


def test_churn_pipeline_as_dag(spark, sf_dir, tmp_path):
    """The reference's eight-task graph (churn_prediction_pipeline.py:296-308)
    composed from the engine's own stages: quality check -> ingest ->
    process -> {warehouse load, train} -> evaluate -> deploy, with the gate
    raising exactly like evaluate_model's threshold check."""
    from skiliopay_datapipeline_customer_spark.ml.dataset import (
        FEATURE_COLS,
        LABEL_COL,
        churn_dataset,
    )
    from skiliopay_datapipeline_customer_spark.ml.pipeline import (
        deploy_gate,
        evaluate_classifier,
        train_classifier,
    )
    from skiliopay_datapipeline_customer_spark.ml.split import stratified_split

    dag = Dag("churn")
    dag.add(
        _t(
            "check_data_quality",
            lambda r: {"rows": table(spark, sf_dir, "customer").count()},
        )
    )
    dag.add(
        _t("ingest_data", lambda r: str(sf_dir)), upstream=["check_data_quality"]
    )
    dag.add(
        _t(
            "process_data",
            lambda r: stratified_split(
                churn_dataset(spark, r["ingest_data"]),
                LABEL_COL,
                key_col="c_custkey",
            ).cache(),
        ),
        upstream=["ingest_data"],
    )
    warehouse_path = str(tmp_path / "features.parquet")
    dag.add(
        _t(
            "load_to_warehouse",
            lambda r: r["process_data"].write.mode("overwrite").parquet(
                warehouse_path
            ),
        ),
        upstream=["process_data"],
    )

    def train(r):
        ds = r["process_data"]
        model, transform = train_classifier(
            ds.filter(F.col("_split") == 0), FEATURE_COLS, LABEL_COL, model_type="lr"
        )
        return {"model": model, "transform": transform, "test": ds.filter(F.col("_split") == 2)}

    dag.add(_t("train_model", train), upstream=["process_data"])
    dag.add(
        _t(
            "evaluate_model",
            lambda r: evaluate_classifier(
                r["train_model"]["transform"](r["train_model"]["test"]), LABEL_COL
            ),
        ),
        upstream=["train_model"],
    )

    def deploy(r):
        decision = deploy_gate(r["evaluate_model"])
        if not decision["deploy"]:  # the reference raises here (DAG:179-187)
            raise ValueError(f"model below deploy thresholds: {decision['checks']}")
        out = str(tmp_path / "model")
        r["train_model"]["model"].write().overwrite().save(out)
        return out

    dag.add(_t("deploy_model", deploy), upstream=["evaluate_model"])
    dag.add(
        Task("notify_failure", lambda r: "alert", trigger_rule=ONE_FAILED),
        upstream=["load_to_warehouse", "deploy_model"],
    )
    run = dag.run()
    assert run.ok, {t: s.error for t, s in run.states.items() if s.error}
    assert run.states["deploy_model"].state == SUCCESS
    assert run.states["notify_failure"].state == SKIPPED
    # the warehouse load is readable and row-complete
    assert (
        spark.read.parquet(warehouse_path).count()
        == run.results["process_data"].count()
    )
    run.results["process_data"].unpersist()
