"""Batch scoring + serving output contract (M6/M13/M14).

Reference parity: batch predict loop (src/serving/api.py:369-421) becomes
ONE ``model.transform`` pass; the output matches the ``model_predictions``
DDL (init.sql:125-133): churn_probability DECIMAL(5,4), churn_prediction
{0,1}, model_version, prediction_timestamp, confidence = max class
probability (api.py:287-289).

Scale notes: scoring is a map-only job (the model broadcasts with the task
closure); alignment of missing feature columns is a select with lit(0)
fills (data_loader.py:199-205), no shuffle.
"""

from __future__ import annotations

from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_features(df: DataFrame, feature_cols: list[str]) -> DataFrame:
    """M14 column alignment: missing features filled with 0, order fixed
    (src/dashboard/data_loader.py:199-205)."""
    existing = set(df.columns)
    return df.select(
        *[c for c in df.columns if c not in feature_cols],
        *[
            (F.col(c) if c in existing else F.lit(0.0)).alias(c)
            for c in feature_cols
        ],
    )


def score_external_model(
    df: DataFrame,
    feature_cols: list[str],
    make_predict_fn,
    batch_size: int = 1024,
    out_col: str = "score",
) -> DataFrame:
    """External-model scoring via ``predict_batch_udf`` (SURVEY §2.12 model-
    apply mapping, src/ml/model_trainer.py:287-289 predict_proba): the model
    loads ONCE per executor (``make_predict_fn`` runs worker-side, so heavy
    artifacts never ship through the driver), inputs arrive as batched numpy
    arrays over Arrow, and the scoring job stays map-only.

    ``make_predict_fn`` must be a self-contained closure returning
    ``fn(*cols: np.ndarray) -> np.ndarray`` — the adapter for any pickled
    sklearn/xgboost/torch artifact the deployment mounts.
    """
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import DoubleType

    udf = predict_batch_udf(
        make_predict_fn, return_type=DoubleType(), batch_size=batch_size
    )
    return df.withColumn(out_col, udf(*[F.col(c) for c in feature_cols]))


def score_batch(
    transform,
    df: DataFrame,
    id_col: str = "c_custkey",
    model_version: str = "1.0.0",
) -> DataFrame:
    """One-pass batch scoring with the serving output contract."""
    probs = vector_to_array("probability")
    return transform(df).select(
        F.col(id_col).alias("user_id"),
        F.round(probs[1], 4).cast("decimal(5,4)").alias("churn_probability"),
        F.col("prediction").cast("int").alias("churn_prediction"),
        F.lit(model_version).alias("model_version"),
        F.current_timestamp().alias("prediction_timestamp"),
        F.round(F.array_max(probs), 4).cast("decimal(5,4)").alias("confidence"),
    )
