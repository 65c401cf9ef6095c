"""Hyperparameter search + experiment tracking (M9/M11).

Reference parity: Optuna TPE over a 7-dim space maximizing CV ROC-AUC
(src/ml/model_trainer.py:430-498) and MLflow run logging (:234-313).

Engine form: the search is a DRIVER loop over Spark-trained models — the
idiomatic split (the reference reaches the same conclusion: the optimizer is
scalar-cheap, the training is the distributed part). When Optuna is
importable the loop IS ``study.optimize`` with a seeded TPE sampler over the
same 7 dimensions; otherwise a deterministic seeded sampler covers the
identical space. Tracking always writes the JSON-lines run log (the local
record the tests and the deploy gate read); when MLflow is importable every
param/metric/artifact is ALSO written through the real
``mlflow.log_params/log_metrics/log_artifact`` calls
(model_trainer.py:54-56,234-313).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .pipeline import cross_validate

# The reference's 7-dim XGBoost space (model_trainer.py:447-458) mapped onto
# the distributed GBT/RF stand-in's knobs: n_estimators→maxIter/numTrees,
# max_depth→maxDepth, learning_rate→stepSize, subsample→subsamplingRate,
# colsample_bytree→featureSubsetStrategy (fraction), and — Spark trees have
# no L1/L2 penalty — reg_alpha/reg_lambda map to the trees' own
# regularizers, minInfoGain (split-gain floor, the gamma/alpha analog) and
# minInstancesPerNode (leaf-weight floor, the lambda analog). Iteration
# range is scaled to the fixture size (the reference searches 100-1000
# trees over its 50 k-row frame).
SEARCH_SPACE = {
    # name: (low, high, is_int)
    "maxDepth": (3, 8, True),
    "maxIter": (10, 40, True),
    "stepSize": (0.05, 0.3, False),
    "subsamplingRate": (0.6, 1.0, False),
    "featureSubsetStrategy": (0.6, 1.0, False),
    "minInstancesPerNode": (1, 10, True),
    "minInfoGain": (0.0, 0.1, False),
}


def _sample(trial_idx: int, seed: int) -> dict:
    """Deterministic pseudo-random point from SEARCH_SPACE (no RNG state:
    hash-mixed like the fixture generator)."""
    import hashlib

    out = {}
    for i, (name, (lo, hi, is_int)) in enumerate(sorted(SEARCH_SPACE.items())):
        h = hashlib.md5(f"{seed}:{trial_idx}:{i}:{name}".encode()).digest()
        u = int.from_bytes(h[:8], "big") / 2**64
        v = lo + u * (hi - lo)
        out[name] = int(round(v)) if is_int else round(v, 4)
    return out


def _to_hp(params: dict, model_type: str) -> dict:
    """Search-space point → estimator kwargs. featureSubsetStrategy is a
    string-typed fraction on Spark's tree learners; RF's tree-count knob is
    numTrees and it has no stepSize."""
    hp = {
        "maxDepth": params["maxDepth"],
        "subsamplingRate": params["subsamplingRate"],
        "featureSubsetStrategy": str(params["featureSubsetStrategy"]),
        "minInstancesPerNode": params["minInstancesPerNode"],
        "minInfoGain": params["minInfoGain"],
    }
    if model_type == "rf":
        hp["numTrees"] = params["maxIter"]
    else:
        hp["maxIter"] = params["maxIter"]
        hp["stepSize"] = params["stepSize"]
    return hp


def _mlflow():
    """The real mlflow module when importable, else None — resolved at call
    time so a session that gains the library (or a test that stubs it into
    sys.modules) is picked up without restart."""
    try:
        import mlflow

        return mlflow
    except ImportError:
        return None


@dataclass
class RunTracker:
    """M11: params/metrics/artifacts per run. Always appends to a JSON-lines
    file (the engine's canonical record); writes through to real MLflow
    (start_run/log_params/log_metrics/log_artifact/end_run) when the library
    is importable — both sinks see the identical payloads."""

    path: str
    _current: dict = field(default_factory=dict)
    _mlf: object = field(default=None, repr=False)

    def start_run(self, name: str) -> None:
        self._current = {
            "run": name,
            "start": time.time(),
            "params": {},
            "metrics": {},
            "artifacts": [],
        }
        self._mlf = _mlflow()
        if self._mlf is not None:
            self._mlf.start_run(run_name=name)

    def log_params(self, params: dict) -> None:
        self._current["params"].update(params)
        if self._mlf is not None:
            self._mlf.log_params(params)

    def log_metrics(self, metrics: dict) -> None:
        numeric = {
            k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))
        }
        self._current["metrics"].update(numeric)
        if self._mlf is not None:
            self._mlf.log_metrics(numeric)

    def log_artifact(self, artifact_path: str) -> None:
        self._current.setdefault("artifacts", []).append(artifact_path)
        if self._mlf is not None:
            self._mlf.log_artifact(artifact_path)

    def end_run(self, status: str = "FINISHED") -> None:
        self._current["end"] = time.time()
        self._current["status"] = status
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(self._current) + "\n")
        if self._mlf is not None:
            self._mlf.end_run(status=status)

    def runs(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def tune(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    key_col: str,
    n_trials: int = 5,
    n_folds: int = 3,
    seed: int = 42,
    tracker: RunTracker | None = None,
    model_type: str = "gbt",
) -> dict:
    """Search loop maximizing CV ROC-AUC. Returns the best
    {params, cv_roc_auc_mean, cv_roc_auc_std, sampler}. Drives Optuna's TPE
    (seeded, direction=maximize — model_trainer.py:489-491) when the library
    is available; the deterministic fallback sampler covers the same space.
    """
    try:  # optional dependency, absent in this container
        import optuna
    except ImportError:
        optuna = None

    best: dict = {"cv_roc_auc_mean": -1.0}

    def run_trial(t_idx: int, params: dict) -> dict:
        nonlocal best
        hp = _to_hp(params, model_type)
        if tracker:
            tracker.start_run(f"trial_{t_idx}")
            # top-level params are the RESOLVED estimator kwargs — replayable
            # via train_classifier(model_type=..., **run["params"] sans
            # model_type); the sampler's raw point rides under space.* so
            # the record shows both what was proposed and what was trained.
            tracker.log_params(
                {
                    **hp,
                    "model_type": model_type,
                    **{f"space.{k}": v for k, v in params.items()},
                }
            )
        try:
            cv = cross_validate(
                df,
                feature_cols,
                label_col,
                key_col=key_col,
                n_folds=n_folds,
                model_type=model_type,
                seed=seed,
                **hp,
            )
        except BaseException:
            # a failed trial must still terminate the run in BOTH sinks:
            # an active mlflow run would wedge every subsequent start_run,
            # and the JSONL record keeps the two logs payload-identical.
            if tracker:
                tracker.end_run(status="FAILED")
            raise
        if tracker:
            tracker.log_metrics(
                {
                    "cv_roc_auc_mean": cv["cv_roc_auc_mean"],
                    "cv_roc_auc_std": cv["cv_roc_auc_std"],
                }
            )
            tracker.end_run()
        if cv["cv_roc_auc_mean"] > best["cv_roc_auc_mean"]:
            best = {
                "params": params,
                "estimator_params": hp,
                **{k: v for k, v in cv.items() if k != "folds"},
            }
        return cv

    if optuna is not None:

        def objective(trial):
            params = {
                name: (
                    trial.suggest_int(name, lo, hi)
                    if is_int
                    else trial.suggest_float(name, lo, hi)
                )
                for name, (lo, hi, is_int) in sorted(SEARCH_SPACE.items())
            }
            return run_trial(trial.number, params)["cv_roc_auc_mean"]

        study = optuna.create_study(
            direction="maximize", sampler=optuna.samplers.TPESampler(seed=seed)
        )
        study.optimize(objective, n_trials=n_trials)
        best["sampler"] = "optuna-tpe"
    else:
        for t in range(n_trials):
            run_trial(t, _sample(t, seed))
        best["sampler"] = "seeded-random"
    return best
