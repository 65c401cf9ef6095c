"""Classifier-based document quality filtering (the trained tier above the
rule-based gopher filter).

Modern corpus pipelines stack two quality gates: hard rule filters
(operators/textops.py::gopher_quality_flags — cheap, interpretable,
high-precision) and a TRAINED quality classifier scoring what the rules
can't express (the fasttext-classifier pattern from the GPT-3/CCNet
lineage, Brown et al. 2020 §A; public technique). This module is that
second tier on Spark ML:

- features are the engine's NATIVE text statistics (no Python in the
  per-document path — the same Column expressions the rule tier uses),
- the model is a Spark ML LogisticRegression on assembled vectors
  (ml/pipeline.py::train_classifier, model_type="lr"),
- scoring is model.transform — executor-side, batch-vectorized, no
  driver loop; at 100 TB the scoring pass is map-only.

The synthetic test corpus is uniformly clean (every document draws from
the same word list), so there is no real quality signal to learn on the
shipped tables; the planted-fixture test
(tests/test_ml_extra.py::test_quality_classifier_separates_planted_garbage)
carries the behavioral contract, per the repo's convention for detection
paths the test data cannot exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import textops as T

QUALITY_FEATURES = [
    "n_words",
    "mean_word_len",
    "symbol_ratio",
    "stopword_ratio",
    "punct_ratio",
    "uniq_word_ratio",
]


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality features as one narrow map-only projection."""
    col = F.col(text_col)
    toks = T.tokens(col)
    n_words = F.size(toks)
    safe_n = F.greatest(n_words, F.lit(1))
    mean_word_len = (
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / safe_n
    )
    symbols = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return df.select(
        id_col,
        n_words.cast("double").alias("n_words"),
        mean_word_len.cast("double").alias("mean_word_len"),
        (symbols / safe_n).cast("double").alias("symbol_ratio"),
        T.stopword_ratio(col).cast("double").alias("stopword_ratio"),
        T.punct_ratio(col).cast("double").alias("punct_ratio"),
        (F.size(F.array_distinct(toks)) / safe_n)
        .cast("double")
        .alias("uniq_word_ratio"),
    )


def train_quality_model(
    labeled_docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Fit the quality classifier on labeled documents (label 1 = keep).

    Returns ``score(df) -> DataFrame`` mapping any document frame to
    (id, quality_prob). The model is driver-held but model-sized (a
    coefficient vector); scoring ships it in the plan.
    """
    from .pipeline import train_classifier

    feats = quality_features(labeled_docs, text_col, id_col).join(
        labeled_docs.select(id_col, label_col), id_col
    )
    _model, transform = train_classifier(
        feats, QUALITY_FEATURES, label_col, model_type="lr"
    )

    def score(df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array

        scored = transform(quality_features(df, text_col, id_col))
        prob = vector_to_array("probability")[1]
        return scored.select(id_col, F.round(prob, 6).alias("quality_prob"))

    return score


def filter_by_quality(
    docs: DataFrame,
    score,
    min_prob: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus after the trained gate: documents scoring ≥ ``min_prob``.
    One scoring pass + one id-keyed semi-join — the classifier analogue of
    filtering on ``gopher_quality_flags.keep``."""
    keep = score(docs).filter(F.col("quality_prob") >= min_prob).select(id_col)
    return docs.join(keep, id_col, "left_semi")
