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


def kmeans_lloyd_exact(
    df: DataFrame,
    k: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    salt: str = "km",
) -> DataFrame:
    """Deterministic, engine-portable Lloyd k-means over scaled-integer
    embeddings — every step is exact integer arithmetic, so a SQL oracle
    replays the clustering bit-for-bit (the oracle-checkable twin of the
    Spark ML tier in :func:`kmeans_assign`, whose k-means|| init depends
    on RDD partitioning and cannot be replayed outside Spark).

    Determinism ladder:
    - components quantize to ``round(x * scale)`` BIGINT (double multiply
      + HALF_UP round — identical IEEE ops on any engine);
    - init: the ``k`` vectors with the smallest ``md5(salt ':' id)``
      (pure data — no RDD sampling, no parallelism dependence), cluster
      j = position in that hash order;
    - assignment: argmin of exact integer squared L2, ties to the
      smallest cluster id, encoded as ``min(dist * 16 + j)`` (one BIGINT
      min per row; dist ≤ dim·(2·scale)² must stay < 2^63/16 — holds for
      unit-norm-ish embeddings at scale 1e6 up to dim ~1000);
    - update: new coordinate = round-half-away-from-zero of the RATIONAL
      mean S/N via the integer formula ``(2S + N) div (2N)`` (sign-
      split), so no engine's float division order can leak in; empty
      clusters keep their previous centroid.

    Per iteration the driver collects k×(dim+1) integers (model-sized,
    same budget class as the k×dim centroid means the similarity module
    already collects); assignments stay distributed map-side expressions
    against centroid LITERALS — at 100 TB each Lloyd round is one
    column-pruned scan + one k×dim-bounded partial-agg shuffle.

    Returns ``(id_col, cluster int)`` under the final centroids.
    """
    base, cents = kmeans_lloyd_fit(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        scale=scale, salt=salt,
    )
    return base.select(id_col, _lloyd_assign_expr(cents).alias("cluster"))


def quantize_vec_expr(vec_col, scale: int = 10**6, normalize: bool = False):
    """The shared scaled-integer quantization: ``round(x·scale)`` BIGINT
    per component (double multiply + HALF_UP round — identical IEEE ops on
    any engine; DuckDB mirror: ``CAST(round(CAST(x AS DOUBLE)·scale) AS
    BIGINT)``). With ``normalize=True`` the vector is L2-unit-normalized
    FIRST — the norm is a sequential fold (F.aggregate ↔ DuckDB list_sum,
    bit-identical per the lsh_ann_topk precedent) and the division is one
    IEEE op, so the normalized quantization is engine-portable too
    (verified component-exact over the full embeddings table). Unit-sphere
    quantization makes integer squared-L2 cosine-consistent — the space
    the PQ tier codes in."""
    raw = vec_col.cast("array<double>")
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                F.zip_with(raw, raw, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        # bind the norm ONCE per row as a lambda variable (single-element
        # array → transform → element_at) instead of inlining the O(dim)
        # fold into the per-element division AND the when() predicate —
        # the inlined form re-evaluated the fold ~dim+1 times per row
        # (O(dim²) map-side work). Same norm value, same one IEEE division
        # per element, so the DuckDB parity argument is unchanged.
        raw = F.element_at(
            F.transform(
                F.array(nrm),
                lambda n: F.when(
                    n > 0, F.transform(raw, lambda x: x / n)
                ).otherwise(raw),
            ),
            1,
        )
    return F.transform(
        raw, lambda x: F.round(x * F.lit(float(scale))).cast("long")
    )


def _lloyd_assign_expr(cents: list[list[int]], arr=None):
    """argmin of exact integer squared L2 against centroid LITERALS, ties
    to the smallest cluster id, encoded as ``min(dist·16 + j)`` over the
    quantized integer array ``arr`` (default: the ``_e`` column).

    The k distances ride ONE indexed `transform` over a 2-D centroid
    literal instead of k unrolled fold subtrees — identical math and fold
    order, but the expression tree is O(k·dim literals + 1 lambda) rather
    than O(k) aggregate trees; the unrolled form made Catalyst
    analysis/codegen the dominant cost (measured ~25 s of planning on the
    PQ tier's 8×16 assignment before this form)."""
    arr = F.col("_e") if arr is None else arr
    lit2d = F.array(
        *[
            F.array(*[F.lit(int(v)).cast("long") for v in c])
            for c in cents
        ]
    )
    keys = F.transform(
        lit2d,
        lambda c, j: F.aggregate(
            F.zip_with(arr, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        * 16
        + j.cast("long"),
    )
    return (F.array_min(keys) % 16).cast("int")


def kmeans_lloyd_fit(
    df: DataFrame,
    k: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    salt: str = "km",
    normalize: bool = False,
) -> tuple:
    """Run the exact-integer Lloyd loop and return ``(base, centroids)``
    where ``base`` is the quantized frame ``(id_col, _e array<long>)`` and
    ``centroids`` the final k×dim integer centroid list — for consumers
    that need the model itself (the IVF coarse quantizer) rather than just
    assignments. See :func:`kmeans_lloyd_exact` for the determinism
    ladder."""
    if k > 16:
        raise ValueError("kmeans_lloyd_exact encodes argmin as dist*16+j; k <= 16")

    base = df.select(
        F.col(id_col),
        quantize_vec_expr(F.col(vec_col), scale, normalize=normalize).alias("_e"),
    )

    seeds = (
        base.select(
            "_e",
            F.md5(
                F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    if not seeds:
        raise ValueError("kmeans_lloyd_fit: input frame is empty")
    if len(seeds) < k:
        raise ValueError(
            f"kmeans_lloyd_fit: k={k} exceeds the frame's {len(seeds)} rows "
            "— fewer seeds than clusters would silently fit a smaller model"
        )
    cents = [list(r["_e"]) for r in seeds]
    dim = len(cents[0])

    def _round_half_away(s: int, n: int) -> int:
        # exact rational round-half-away-from-zero; operands kept
        # non-negative so floor division == truncation on every engine
        if s >= 0:
            return (2 * s + n) // (2 * n)
        return -((-2 * s + n) // (2 * n))

    for _ in range(iters):
        assigned = base.withColumn("_c", _lloyd_assign_expr(cents))
        rows = (
            assigned.groupBy("_c")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                # global max |component|, piggybacked on the same shuffle:
                # feeds the min(dist·16+j) overflow guard below
                F.max(
                    F.array_max(F.transform("_e", lambda x: F.abs(x)))
                ).alias("_m"),
                *[
                    F.sum(F.element_at("_e", d + 1)).alias(f"_s{d}")
                    for d in range(dim)
                ],
            )
            .collect()
        )
        # enforce the documented encoding precondition dim·(2M)²·16 < 2^63
        # (centroids are rounded means, so |cent| ≤ M and per-dim squared
        # deltas are ≤ (2M)²): Spark's non-ANSI BIGINT wraps silently while
        # DuckDB's list_sum promotes to HUGEINT — an unchecked overflow
        # would be a silent engine/oracle divergence, not an error
        m_abs = max(int(r["_m"]) for r in rows)
        if dim * (2 * m_abs) ** 2 * 16 + 15 >= 2**63:
            raise ValueError(
                f"kmeans_lloyd_fit: scaled components reach |{m_abs}| at "
                f"dim={dim} — the min(dist*16+j) BIGINT encoding would "
                "overflow (need dim*(2*max|x*scale|)^2*16 < 2^63); lower "
                "`scale` or normalize the vectors"
            )
        by_cluster = {int(r["_c"]): r for r in rows}
        for j in range(k):
            r = by_cluster.get(j)
            if r is None:
                continue  # empty cluster keeps its previous centroid
            n = int(r["_n"])
            cents[j] = [
                _round_half_away(int(r[f"_s{d}"]), n) for d in range(dim)
            ]

    return base, cents


def kmeans_profile_exact(
    df: DataFrame,
    k: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Cluster profile (size, majority label, purity) over the exact
    Lloyd assignment — fully oracle-checkable, unlike the Spark ML tier
    (:func:`kmeans_cluster_profile`) whose k-means|| init no SQL engine
    can replay. Majority ties break to the smallest label."""
    assigned = kmeans_lloyd_exact(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    joined = assigned.join(df.select(id_col, label_col), id_col)
    per_label = joined.groupBy("cluster", label_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    top = per_label.groupBy("cluster").agg(
        F.sum("_n").alias("n_vecs"),
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
