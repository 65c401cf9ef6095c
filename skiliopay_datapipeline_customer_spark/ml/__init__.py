"""ML layer (SURVEY §2.10 M1-M14), Spark ML pipelines replacing the
reference's sklearn/XGBoost stack (src/ml/model_trainer.py).

Design: deterministic, seed-stable everything — the reference pins seed 42
through split/CV/model (model_trainer.py:171-191,376-392) and so do we, but
with distributed-safe constructions (hash-ordered row_number instead of
sklearn's in-memory shuffles).
"""

from .dataset import churn_dataset
from .split import stratified_folds, stratified_split
from .scaler import fit_standard_scaler
from .pipeline import (
    evaluate_classifier,
    feature_importances,
    train_classifier,
    cross_validate,
)

__all__ = [
    "churn_dataset",
    "stratified_split",
    "stratified_folds",
    "fit_standard_scaler",
    "train_classifier",
    "evaluate_classifier",
    "feature_importances",
    "cross_validate",
]
