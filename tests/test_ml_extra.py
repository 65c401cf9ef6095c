"""Scoring contract (M13), promotion gate (M12), tuning loop + tracker
(M9/M11) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from skiliopay_datapipeline_customer_spark.ml import (
    churn_dataset,
    stratified_split,
    train_classifier,
)
from skiliopay_datapipeline_customer_spark.ml.dataset import FEATURE_COLS, LABEL_COL
from skiliopay_datapipeline_customer_spark.ml.scoring import align_features, score_batch
from skiliopay_datapipeline_customer_spark.ml.tuning import RunTracker, tune


def test_score_batch_contract(spark, sf_dir):
    ds = stratified_split(
        churn_dataset(spark, sf_dir), LABEL_COL, key_col="c_custkey"
    ).cache()
    train = ds.filter(F.col("_split") == 0)
    test = ds.filter(F.col("_split") == 2)
    _, transform = train_classifier(
        train, FEATURE_COLS, LABEL_COL, model_type="rf", numTrees=10
    )
    scored = score_batch(transform, test, model_version="2.1.0")
    assert scored.count() == test.count()
    types = dict(scored.dtypes)
    assert types["churn_probability"] == "decimal(5,4)"
    assert types["confidence"] == "decimal(5,4)"
    assert types["prediction_timestamp"] == "timestamp"
    bad = scored.filter(
        (F.col("churn_probability") < 0)
        | (F.col("churn_probability") > 1)
        | (F.col("confidence") < 0.5)  # max of 2-class probs is ≥ 0.5
        | (~F.col("churn_prediction").isin(0, 1))
    )
    assert bad.count() == 0
    assert scored.first()["model_version"] == "2.1.0"
    ds.unpersist()  # session-scoped spark — don't leak storage into later tests


def test_align_features_fills_missing(spark, sf_dir):
    ds = churn_dataset(spark, sf_dir).drop("acctbal")
    aligned = align_features(ds, FEATURE_COLS)
    assert "acctbal" in aligned.columns
    assert aligned.agg(F.sum(F.abs("acctbal"))).first()[0] == 0.0


def test_tune_loop_and_tracker(spark, sf_dir, tmp_path):
    ds = churn_dataset(spark, sf_dir)
    tracker = RunTracker(str(tmp_path / "runs.jsonl"))
    best = tune(
        ds,
        FEATURE_COLS,
        LABEL_COL,
        key_col="c_custkey",
        n_trials=2,
        n_folds=2,
        tracker=tracker,
        model_type="rf",
    )
    assert best["cv_roc_auc_mean"] > 0.8
    assert set(best["params"]) == {
        "maxDepth",
        "maxIter",
        "stepSize",
        "subsamplingRate",
        "featureSubsetStrategy",
        "minInstancesPerNode",
        "minInfoGain",
    }
    assert best["sampler"] == "seeded-random"  # optuna absent in container
    # the resolved estimator kwargs replay through train_classifier: rf maps
    # maxIter→numTrees, drops stepSize, stringifies featureSubsetStrategy
    ep = best["estimator_params"]
    assert "numTrees" in ep and "stepSize" not in ep
    assert isinstance(ep["featureSubsetStrategy"], str)
    runs = tracker.runs()
    assert len(runs) == 2
    assert all("cv_roc_auc_mean" in r["metrics"] for r in runs)
    assert all(r["status"] == "FINISHED" for r in runs)
    # run params are the applied kwargs (+ the sampler's raw space.* point)
    assert all("numTrees" in r["params"] and "space.maxIter" in r["params"]
               for r in runs)
    # deterministic sampler: same trial index → same params
    from skiliopay_datapipeline_customer_spark.ml.tuning import _sample

    assert _sample(0, 42) == _sample(0, 42) and _sample(0, 42) != _sample(1, 42)


def test_tune_drives_optuna_tpe_when_importable(spark, sf_dir, monkeypatch, tmp_path):
    """M9: with optuna importable, tune() must run study.optimize with a
    seeded TPE sampler, suggest every SEARCH_SPACE dimension through the
    trial API, and report the sampler truthfully."""
    import sys
    import types

    from skiliopay_datapipeline_customer_spark.ml.tuning import SEARCH_SPACE

    suggested: list[tuple] = []
    created: dict = {}

    class StubTrial:
        def __init__(self, number):
            self.number = number

        def suggest_int(self, name, lo, hi):
            suggested.append((self.number, name, "int", lo, hi))
            return lo

        def suggest_float(self, name, lo, hi):
            suggested.append((self.number, name, "float", lo, hi))
            return lo

    class StubStudy:
        def optimize(self, objective, n_trials):
            self.values = [objective(StubTrial(t)) for t in range(n_trials)]

    stub = types.ModuleType("optuna")
    stub.create_study = lambda direction, sampler=None: created.update(
        direction=direction, sampler=sampler
    ) or StubStudy()
    stub.samplers = types.SimpleNamespace(
        TPESampler=lambda seed=None: f"tpe(seed={seed})"
    )
    monkeypatch.setitem(sys.modules, "optuna", stub)

    tracker = RunTracker(str(tmp_path / "optuna_runs.jsonl"))
    best = tune(
        churn_dataset(spark, sf_dir),
        FEATURE_COLS,
        LABEL_COL,
        key_col="c_custkey",
        n_trials=2,
        n_folds=2,
        tracker=tracker,
        model_type="rf",
    )
    assert best["sampler"] == "optuna-tpe"
    assert created == {"direction": "maximize", "sampler": "tpe(seed=42)"}
    # every dimension suggested through the trial API, both trials
    assert {(t, n) for t, n, *_ in suggested} == {
        (t, n) for t in (0, 1) for n in SEARCH_SPACE
    }
    # suggested bounds match the declared space
    for _, name, kind, lo, hi in suggested:
        slo, shi, is_int = SEARCH_SPACE[name]
        assert (lo, hi) == (slo, shi) and kind == ("int" if is_int else "float")
    assert len(tracker.runs()) == 2 and best["cv_roc_auc_mean"] > 0


def test_run_tracker_writes_through_to_mlflow_stub(monkeypatch, tmp_path):
    """M11: when mlflow is importable, every param/metric/artifact that
    reaches the JSONL record must also reach the real mlflow calls."""
    import sys
    import types

    calls: list[tuple] = []
    stub = types.ModuleType("mlflow")
    stub.start_run = lambda run_name=None: calls.append(("start_run", run_name))
    stub.log_params = lambda p: calls.append(("log_params", dict(p)))
    stub.log_metrics = lambda m: calls.append(("log_metrics", dict(m)))
    stub.log_artifact = lambda a: calls.append(("log_artifact", a))
    stub.end_run = lambda status="FINISHED": calls.append(("end_run", status))
    monkeypatch.setitem(sys.modules, "mlflow", stub)

    tracker = RunTracker(str(tmp_path / "mlf_runs.jsonl"))
    tracker.start_run("exp_1")
    tracker.log_params({"maxDepth": 5, "model_type": "gbt"})
    tracker.log_metrics({"roc_auc": 0.97, "note": "skipme"})  # non-numeric dropped
    tracker.log_artifact("/tmp/model.bin")
    tracker.end_run()

    (run,) = tracker.runs()
    assert run["params"] == {"maxDepth": 5, "model_type": "gbt"}
    assert run["metrics"] == {"roc_auc": 0.97}
    assert run["artifacts"] == ["/tmp/model.bin"]
    # identical payloads reached the mlflow sink, in call order
    assert calls == [
        ("start_run", "exp_1"),
        ("log_params", {"maxDepth": 5, "model_type": "gbt"}),
        ("log_metrics", {"roc_auc": 0.97}),
        ("log_artifact", "/tmp/model.bin"),
        ("end_run", "FINISHED"),
    ]
    # without the library the JSONL sink still records alone
    # setitem None (not delitem): deleting only drops the cache — a real
    # installed mlflow would be re-imported and receive the writes; None
    # forces ImportError, pinning the JSONL-only branch
    monkeypatch.setitem(sys.modules, "mlflow", None)
    tracker2 = RunTracker(str(tmp_path / "plain_runs.jsonl"))
    tracker2.start_run("exp_2")
    tracker2.log_metrics({"roc_auc": 0.5})
    tracker2.end_run()
    assert tracker2.runs()[0]["metrics"] == {"roc_auc": 0.5}


def test_failed_trial_terminates_run_in_both_sinks(monkeypatch, tmp_path):
    """A trial that raises mid-training must not leave the mlflow run active
    (which would wedge the next start_run) or drop the JSONL record — the
    run ends with status=FAILED in both sinks and the error propagates."""
    import sys
    import types

    import pytest

    from skiliopay_datapipeline_customer_spark.ml import tuning

    calls: list[tuple] = []
    stub = types.ModuleType("mlflow")
    stub.start_run = lambda run_name=None: calls.append(("start_run", run_name))
    stub.log_params = lambda p: calls.append(("log_params",))
    stub.log_metrics = lambda m: calls.append(("log_metrics",))
    stub.end_run = lambda status="FINISHED": calls.append(("end_run", status))
    monkeypatch.setitem(sys.modules, "mlflow", stub)

    def boom(*a, **k):
        raise RuntimeError("spark job failed")

    monkeypatch.setattr(tuning, "cross_validate", boom)
    tracker = tuning.RunTracker(str(tmp_path / "failed_runs.jsonl"))
    with pytest.raises(RuntimeError, match="spark job failed"):
        tuning.tune(
            None, [], "y", key_col="k", n_trials=1, tracker=tracker
        )
    (run,) = tracker.runs()
    assert run["status"] == "FAILED" and run["metrics"] == {}
    assert calls[-1] == ("end_run", "FAILED")


def test_logistic_regression_alternate(spark, sf_dir):
    from skiliopay_datapipeline_customer_spark.ml import (
        evaluate_classifier,
        feature_importances,
    )

    ds = stratified_split(
        churn_dataset(spark, sf_dir), LABEL_COL, key_col="c_custkey"
    ).cache()
    train = ds.filter(F.col("_split") == 0)
    test = ds.filter(F.col("_split") == 2)
    model, transform = train_classifier(train, FEATURE_COLS, LABEL_COL, model_type="lr")
    metrics = evaluate_classifier(transform(test), LABEL_COL)
    ds.unpersist()
    assert metrics["roc_auc"] > 0.9  # linearly separable on recency
    imps = feature_importances(model, FEATURE_COLS)
    assert len(imps) == len(FEATURE_COLS) and imps[0][1] >= imps[-1][1]


def test_quality_classifier_separates_planted_garbage(spark):
    """The trained quality tier must learn what the planted labels encode:
    clean prose-like docs score high, garbage (symbol soup, single-char
    spam, pathological word lengths) scores low — perfect ranking on a
    held-out split, and the filter keeps exactly the clean docs."""
    import random

    from skiliopay_datapipeline_customer_spark.ml.quality_model import (
        filter_by_quality,
        train_quality_model,
    )

    rng = random.Random(13)
    clean_words = (
        "the data table joins a stream of rows and the engine sorts "
        "them to build a clean daily report for the analyst team"
    ).split()
    rows = []
    for i in range(60):  # clean: natural-ish word lengths, stopwords present
        rows.append((i, " ".join(rng.choices(clean_words, k=40)), 1))
    for i in range(60, 120):  # garbage: three planted failure modes
        mode = i % 3
        if mode == 0:
            words = ["#$%&!*@" for _ in range(40)]
        elif mode == 1:
            words = [rng.choice("abcdefgh") for _ in range(40)]
        else:
            words = ["x" * 30 for _ in range(40)]
        rows.append((i, " ".join(words), 0))
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    train = df.filter(F.col("doc_id") % 2 == 0)
    held = df.filter(F.col("doc_id") % 2 == 1)

    score = train_quality_model(train)
    scored = {r.doc_id: r.quality_prob for r in score(held).collect()}
    labels = {r.doc_id: r.label for r in held.collect()}
    worst_clean = min(p for d, p in scored.items() if labels[d] == 1)
    best_garbage = max(p for d, p in scored.items() if labels[d] == 0)
    assert worst_clean > best_garbage  # perfect separation on held-out docs

    kept = {
        r.doc_id for r in filter_by_quality(held, score, min_prob=0.5).collect()
    }
    assert kept == {d for d, lab in labels.items() if lab == 1}


# ---- Embedding reduction / clustering (ml/embeddings.py) ----


def _planted_vectors(spark, n_per=30, dim=8):
    """Three well-separated blobs on coordinate axes, plus a tiny
    deterministic jitter so no two vectors are identical."""
    rows = []
    vid = 0
    for blob, axis in enumerate([0, 3, 6]):
        for i in range(n_per):
            v = [0.0] * dim
            v[axis] = 10.0
            v[(axis + 1) % dim] = (i % 7) * 0.01
            rows.append((vid, v, blob))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_pca_planted_line_captures_variance(spark):
    from skiliopay_datapipeline_customer_spark.ml.embeddings import pca_project

    # vectors on a 1-D line through dim 0 with tiny dim-1 noise
    rows = [(i, [float(i), (i % 3) * 1e-3, 0.0, 0.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    projected, var = pca_project(df, k=2)
    assert var[0] > 0.99          # the line IS the first component
    assert var == sorted(var, reverse=True)
    first = projected.orderBy("vec_id").collect()
    assert all(len(r["pca"]) == 2 for r in first)


def test_pca_projection_deterministic(spark, sf_dir):
    from skiliopay_datapipeline_customer_spark.io import table
    from skiliopay_datapipeline_customer_spark.ml.embeddings import pca_project

    emb = table(spark, sf_dir, "embeddings").limit(100)
    a, var_a = pca_project(emb, k=4)
    b, var_b = pca_project(emb, k=4)
    assert var_a == var_b
    assert a.orderBy("vec_id").collect() == b.orderBy("vec_id").collect()


def test_kmeans_recovers_planted_blobs(spark):
    from skiliopay_datapipeline_customer_spark.ml.embeddings import (
        kmeans_assign,
        kmeans_cluster_profile,
    )

    df = _planted_vectors(spark)
    assigned = kmeans_assign(df, k=3)
    # every blob maps to exactly one cluster and vice versa
    joined = assigned.join(df.select("vec_id", "label"), "vec_id")
    combos = joined.select("label", "cluster").distinct().collect()
    assert len(combos) == 3
    assert len({c["cluster"] for c in combos}) == 3

    profile = kmeans_cluster_profile(df, k=3).collect()
    assert [r["n_vecs"] for r in profile] == [30, 30, 30]
    assert all(r["purity"] == 1.0 for r in profile)


def test_target_encode_loo_excludes_own_label_and_smooths_singletons(spark):
    from pyspark.sql import functions as F

    from skiliopay_datapipeline_customer_spark.functions.encoding import (
        target_encode_loo,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 0), ("a", 1), ("b", 1), ("b", 0), ("c", 1)],
        ["cat", "y"],
    )
    rows = {
        (r["cat"], r["y"]): r["te"]
        for r in target_encode_loo(df, "cat", "y").collect()
    }
    # each encoding is the mean of the OTHER rows in the category
    assert abs(rows[("a", 1)] - 0.5) < 1e-12   # others: 0,1
    assert abs(rows[("a", 0)] - 1.0) < 1e-12   # others: 1,1
    assert abs(rows[("b", 1)] - 0.0) < 1e-12
    assert rows[("c", 1)] is None              # singleton, no smoothing
    # smoothing pulls toward the global prior; singleton = prior exactly
    prior = 4 / 6
    sm = {
        (r["cat"], r["y"]): r["te"]
        for r in target_encode_loo(df, "cat", "y", smoothing=2.0).collect()
    }
    assert abs(sm[("c", 1)] - prior) < 1e-12
    assert abs(sm[("a", 1)] - (1 + 2 * prior) / 4) < 1e-12


def test_hashed_features_fixed_width_and_deterministic(spark, sf_dir):
    from skiliopay_datapipeline_customer_spark.functions.encoding import (
        hashed_features,
    )
    from skiliopay_datapipeline_customer_spark.io import table

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    out = hashed_features(cust, ["c_mktsegment", "c_nationkey"], num_buckets=8)
    fh_cols = [c for c in out.columns if c.startswith("fh_")]
    assert len(fh_cols) == 8
    rows = out.orderBy("c_custkey").limit(50).collect()
    again = out.orderBy("c_custkey").limit(50).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    # every row distributes exactly len(cols)=2 units of ±1 mass: abs-sum
    # is 2 (distinct buckets / same bucket same sign) or 0 (opposite signs
    # colliding in one bucket) — never anything in between
    for r in rows:
        assert sum(abs(r[c]) for c in fh_cols) in (0, 2)


def test_discover_categories_guards_unbounded_vocabulary(spark, sf_dir):
    """F15/F16 vocabulary discovery is for enum columns: past max_categories
    it must raise toward hashed_features, not collect the column to the
    driver and expand a degenerate when-chain."""
    import pytest

    from skiliopay_datapipeline_customer_spark.functions.encoding import (
        discover_categories,
    )
    from skiliopay_datapipeline_customer_spark.io import table

    cust = table(spark, sf_dir, "customer")
    cats = discover_categories(cust, "c_mktsegment")
    assert cats == sorted(cats) and 0 < len(cats) <= 5
    with pytest.raises(ValueError, match="hashed_features"):
        discover_categories(cust, "c_custkey", max_categories=10)


def test_kmeans_lloyd_exact_recovers_planted_blobs(spark):
    """The exact-integer Lloyd tier must recover three well-separated
    planted blobs with purity 1.0 — and be deterministic across calls
    (md5-order init, integer arithmetic: no RNG, no partition
    dependence)."""
    from skiliopay_datapipeline_customer_spark.ml.embeddings import (
        kmeans_lloyd_exact,
        kmeans_profile_exact,
    )

    centers = [[5.0] * 8, [-5.0] * 8, [0.0] * 4 + [9.0] * 4]
    # place each of the 3 md5-order seeds in a DISTINCT blob: Lloyd is
    # greedy, and two seeds in one far-apart blob is a local optimum no
    # iteration count escapes — this test pins exact arithmetic and
    # determinism, not init robustness
    import hashlib as _h

    seed_ids = sorted(
        range(90), key=lambda i: _h.md5(f"km:{i}".encode()).hexdigest()
    )[:3]

    def blob(i: int) -> int:
        if i in seed_ids:
            return seed_ids.index(i)
        return i % 3

    rows = []
    for i in range(90):
        c = centers[blob(i)]
        rows.append((i, [v + ((i * 37) % 7 - 3) * 0.01 for v in c], blob(i)))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    prof = kmeans_profile_exact(df, k=3, iters=3).collect()
    assert sum(r["n_vecs"] for r in prof) == 90
    # every populated cluster is pure: blobs are far apart vs jitter
    assert all(r["purity"] == 1.0 for r in prof)
    assert sorted(r["majority_label"] for r in prof) == [0, 1, 2]
    a1 = {r["vec_id"]: r["cluster"] for r in kmeans_lloyd_exact(df, k=3).collect()}
    a2 = {r["vec_id"]: r["cluster"] for r in kmeans_lloyd_exact(df, k=3).collect()}
    assert a1 == a2


def test_kmeans_lloyd_exact_rejects_large_k():
    import pytest as _pytest

    from skiliopay_datapipeline_customer_spark.ml.embeddings import (
        kmeans_lloyd_exact,
    )

    with _pytest.raises(ValueError, match="k <= 16"):
        kmeans_lloyd_exact(None, k=17)
