"""Embedding-space reduction and clustering — PCA projection and k-means
over the ``embedding`` column, via Spark ML's JVM-side estimators.

The reference keeps its vector work in a single-node ANN helper; here the
fit stage is the distributed Spark ML implementation (tree-aggregated
Gram matrix for PCA, parallel Lloyd iterations for k-means) and the
transform stage is a map-only projection — the shape that survives a
100 TB corpus, since only k×dim model state ever reaches the driver.

Reference anchor: embedding handling in
/root/reference/src/processing/feature_engineering.py (vector features
feed the model layer; the reference has no distributed reduction tier).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import PCA
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VEC = "_vec"


def pca_project(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Project embeddings onto their top-``k`` principal components.

    Returns ``(projected, explained_variance)`` where ``projected`` has
    ``(id_col, pca array<double>)`` and the variance list is the per-
    component explained-variance ratio (descending by construction).

    Plan shape: the covariance/Gram accumulation is a tree-aggregate over
    executors (dim×dim partials, never row data, to the driver); the
    eigendecomposition is driver-side on a dim×dim matrix; the projection
    itself is a map-only matrix-vector product per row.
    """
    vecs = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias(_VEC)
    )
    model = PCA(k=k, inputCol=_VEC, outputCol="_pca").fit(vecs)
    projected = model.transform(vecs).select(
        id_col,
        F.transform(vector_to_array("_pca"), lambda x: F.round(x, 6)).alias("pca"),
    )
    return projected, [float(v) for v in model.explainedVariance]


def kmeans_assign(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Assign each embedding to one of ``k`` k-means clusters (fixed seed,
    k-means|| init — deterministic given the same data and parallelism).

    Returns ``(id_col, cluster int)``. Fit is Spark ML's distributed Lloyd
    loop (per-iteration broadcast of k×dim centroids, map-side assignment,
    one partial-aggregating shuffle per round); assignment is map-only.
    """
    vecs = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias(_VEC)
    )
    model = KMeans(k=k, seed=seed, featuresCol=_VEC, predictionCol="cluster").fit(
        vecs
    )
    return model.transform(vecs).select(
        id_col, F.col("cluster").cast("int").alias("cluster")
    )


def kmeans_cluster_profile(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = "label",
    seed: int = 7,
) -> DataFrame:
    """Cluster-level profile: size and (when a label column exists) the
    majority label and its purity — the quick "did clustering find the
    label structure" diagnostic over a corpus-scale embedding table.
    """
    assigned = kmeans_assign(df, k=k, id_col=id_col, vec_col=vec_col, seed=seed)
    if label_col is None:
        return (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_vecs"))
            .orderBy("cluster")
        )
    joined = assigned.join(df.select(id_col, label_col), id_col)
    per_label = joined.groupBy("cluster", label_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    top = per_label.groupBy("cluster").agg(
        F.sum("_n").alias("n_vecs"),
        # min_by over (-count, label): most-frequent label, smallest on
        # ties — negating the COUNT (not the label) keeps the tiebreak
        # valid for string labels, where -label would crash under ANSI
        F.min_by(
            F.col(label_col),
            F.struct((-F.col("_n")).alias("_neg"), F.col(label_col).alias("_l")),
        ).alias("majority_label"),
        F.max("_n").alias("_top_n"),
    )
    return top.select(
        "cluster",
        "n_vecs",
        "majority_label",
        F.round(F.col("_top_n") / F.col("n_vecs"), 4).alias("purity"),
    ).orderBy("cluster")
