"""ML-layer declared queries (SURVEY §2.10).

``churn_training_dataset`` (M1) is SQL-expressible and oracle-checked; the
model queries (M4/M6) are genuinely non-SQL ops, so they register WITHOUT an
oracle — the driver records the weaker rows-only check, per contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ml.dataset import FEATURE_COLS, LABEL_COL, churn_dataset
from . import query


@query(
    "churn_training_dataset",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey,
           datediff('day', last_order, DATE '2001-08-02') AS recency_days,
           frequency, monetary,
           c_acctbal AS acctbal,
           CAST(last_order < DATE '2000-12-01' AS INT) AS churn_label
    FROM customer JOIN per_cust ON c_custkey = o_custkey
    ORDER BY c_custkey
    """,
)
def churn_training_dataset(spark, sf_dir):
    # avg_order_value (a sum/count division) is excluded from the hashed
    # surface: its true value can land exactly on a half-cent rounding
    # boundary, where double ulp noise flips round() between engines. It
    # remains a model feature in ml.dataset.
    return churn_dataset(spark, sf_dir).drop("avg_order_value").orderBy("c_custkey")


# M2/M4/M6: stratified split → GBT fit on train → score test split.
# Model inference is not SQL-expressible → rows-only check (no oracle).


@query("churn_predictions")
def churn_predictions(spark, sf_dir):
    from ..ml.pipeline import train_classifier
    from ..ml.split import stratified_split

    ds = stratified_split(
        churn_dataset(spark, sf_dir), LABEL_COL, key_col="c_custkey"
    ).cache()
    train = ds.filter(F.col("_split") == 0)
    test = ds.filter(F.col("_split") == 2)
    _, transform = train_classifier(
        train, FEATURE_COLS, LABEL_COL, model_type="gbt", maxIter=10
    )
    from pyspark.ml.functions import vector_to_array

    pred = (
        transform(test)
        .select(
            "c_custkey",
            LABEL_COL,
            F.col("prediction").cast("int").alias("prediction"),
            F.round(vector_to_array("probability")[1], 4).alias("churn_prob"),
        )
        .orderBy("c_custkey")
    )
    # pin the (eval-split-sized) scores and release the cached dataset —
    # a caller holding the lazy frame would otherwise leak the split cache
    # for the whole session, one copy per invocation (risk_tier_counts and
    # calibration_bins both re-enter here)
    from ..operators.dedup import materialize

    return materialize(pred, ds)


# Embedding-space reduction/clustering (LLM-pipeline family). Both fits are
# data-derived iterative estimators (eigendecomposition / Lloyd) -> genuinely
# non-SQL, registered rows-only; tests/test_ml_extra.py carries the variance-
# ordering, orthogonality, determinism, and label-recovery assertions.


@query("pca_projected_embeddings")
def pca_projected_embeddings(spark, sf_dir):
    # The driver canonicalizes even rows-only outputs with a pandas
    # sort_values(), which raises TypeError on list cells (the r7/r8
    # bpe/pca failure class) — so the DECLARED query flattens the k=8
    # projection to scalar pc_0..pc_7 doubles. Library users who want the
    # array keep ml.embeddings.pca_project.
    from ..io import table
    from ..ml.embeddings import pca_project

    emb = table(spark, sf_dir, "embeddings")
    projected, _ = pca_project(emb, k=8)
    return projected.select(
        "vec_id", *[F.col("pca")[i].alias(f"pc_{i}") for i in range(8)]
    ).orderBy("vec_id")


@query("kmeans_cluster_profile")
def kmeans_cluster_profile(spark, sf_dir):
    from ..io import table
    from ..ml.embeddings import kmeans_cluster_profile as profile

    emb = table(spark, sf_dir, "embeddings")
    return profile(emb, k=10)


# The dashboard's risk tiering of the predicted probability (pages.py:
# 253-256: <0.3 low / <0.7 medium / else high) rolled up over the scored
# test split — model-derived, so rows-only like its parent.


@query("risk_tier_counts")
def risk_tier_counts(spark, sf_dir):
    scored = churn_predictions(spark, sf_dir)
    tier = (
        F.when(F.col("churn_prob") < 0.3, "low")
        .when(F.col("churn_prob") < 0.7, "medium")
        .otherwise("high")
    )
    return (
        scored.groupBy(tier.alias("risk_tier"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("churn_prob"), 4).alias("avg_prob"),
            F.sum(F.col("churn_label").cast("long")).alias("n_actual_churned"),
        )
        .orderBy("risk_tier")
    )


# Calibration bins (reliability diagram): predicted-probability deciles vs
# observed churn rate — the diagnostic BEHIND the dashboard's probability
# display (a model can rank well yet be miscalibrated; threshold tuning
# assumes the probabilities mean something). One pass over the scored
# split; model-derived → rows-only.


@query("calibration_bins")
def calibration_bins(spark, sf_dir):
    scored = churn_predictions(spark, sf_dir)
    bin_col = F.least(F.floor(F.col("churn_prob") * 10), F.lit(9)).cast("int")
    return (
        scored.groupBy(bin_col.alias("prob_bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("churn_prob"), 4).alias("mean_predicted"),
            F.round(F.avg(F.col("churn_label").cast("double")), 4).alias(
                "observed_rate"
            ),
        )
        .orderBy("prob_bin")
    )
