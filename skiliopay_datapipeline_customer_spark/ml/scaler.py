"""Train-only z-score scaler (M3/F14) with the reference's leakage
discipline: statistics are fit on the TRAIN split only and applied to every
split (src/ml/model_trainer.py:193-228).

Column-preserving (each feature stays a named double column) rather than
vector-assembled, matching the reference's DataFrame-in/DataFrame-out shape;
the model pipeline assembles vectors afterwards.

Scale notes: the fit is one agg pass (map-side partial); the transform is
pure column arithmetic — whole-stage-codegen, no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_standard_scaler(train: DataFrame, columns: list[str]):
    """Returns (params, transform) — params is {col: (mean, std)};
    transform applies (x - mean) / std to any DataFrame."""
    row = train.agg(
        *[F.avg(c).alias(f"{c}_mean") for c in columns],
        *[F.stddev_samp(c).alias(f"{c}_std") for c in columns],
    ).first()
    params = {
        c: (row[f"{c}_mean"], row[f"{c}_std"] if row[f"{c}_std"] else 1.0)
        for c in columns
    }

    def transform(df: DataFrame) -> DataFrame:
        return df.select(
            *[
                (
                    ((F.col(c) - F.lit(params[c][0])) / F.lit(params[c][1])).alias(c)
                    if c in params
                    else F.col(c)
                )
                for c in df.columns
            ]
        )

    return params, transform
