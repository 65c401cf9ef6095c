"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: one map-side pass computing
dot/norms with higher-order functions (zip_with + aggregate — JVM-native,
no Python), then TakeOrdered for the top-k. At 100 TB the scale path is
LSH bucketing (random-hyperplane signs) so each query probes one bucket
family instead of the full corpus; both share the same cosine kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of `df` rows against ONE query vector.

    query_vec_df: single-row frame with the query vector under `vec_col`
    (broadcast — the corpus never shuffles).
    """
    q = F.broadcast(query_vec_df.select(F.col(vec_col).alias("_qvec")))
    a = as_double(F.col(vec_col))
    b = as_double(F.col("_qvec"))
    return (
        df.crossJoin(q)
        .select(id_col, F.round(cosine(a, b), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def lsh_bucket_id(vec_col, num_planes: int = 8):
    """Random-hyperplane LSH bucket: sign bits of dot(v, h_p) packed to int.

    Hyperplane components are deterministic pseudo-randoms derived from
    xxhash64(plane, dim) — reproducible across runs with zero data movement
    (no stored model needed).
    """
    v = as_double(vec_col)
    dim = F.size(vec_col)
    bits = []
    for p in range(num_planes):
        # h_p[i] in [-1, 1): hash(p, i) scaled; folded into the dot product
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), dim - 1),
                    lambda i, p=p: (
                        F.pmod(F.xxhash64(i.cast("string"), F.lit(p)), F.lit(2000003))
                        / F.lit(1000001.5)
                        - 1.0
                    ),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        bits.append((proj > 0).cast("int") * F.lit(2**p))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def lsh_topk(
    df: DataFrame,
    query_vec_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
) -> DataFrame:
    """ANN top-k: probe only the query's LSH bucket, then exact cosine.

    Recall < 1 by construction (single-probe); the 100 TB trade: the scan
    touches ~corpus/2^planes rows. Multi-probe = union over neighbor buckets.
    """
    bucketed = df.withColumn("_bucket", lsh_bucket_id(F.col(vec_col), num_planes))
    qb = F.broadcast(
        query_vec_df.select(
            F.col(vec_col).alias("_qvec"),
            lsh_bucket_id(F.col(vec_col), num_planes).alias("_qbucket"),
        )
    )
    a = as_double(F.col(vec_col))
    b = as_double(F.col("_qvec"))
    return (
        bucketed.join(qb, F.col("_bucket") == F.col("_qbucket"))
        .select(id_col, F.round(cosine(a, b), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )
