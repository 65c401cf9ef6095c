"""Deterministic churn-surface fixtures (FIXTURES.md §1).

Synthesizes the reference's 33-column ``users_raw`` table with hash-derived
uniforms (xxhash64(id, seed, salt) → [0,1)) so every run and every SF is
bit-identical — no RNG state, no collect, scales to any n as a map over
``spark.range``. The dirty variant injects the defect classes the validation
and quality operators (V1-V9) must catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COUNTRIES = ["Thailand", "Indonesia", "Malaysia", "Philippines", "Vietnam"]
SOURCES = ["organic", "referral", "ads_fb", "ads_ig", "influencer", "other"]
VERSIONS = ["1.x", "2.x", "3.x"]


def _u(salt: int, seed: int):
    """Uniform [0,1) from (row id, seed, salt) — deterministic, map-side."""
    return (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)), F.lit(1_000_000))
        / 1_000_000.0
    )


def _pick(values: list[str], salt: int, seed: int):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.floor(_u(salt, seed) * len(values)) + 1).cast("int"))


def synthesize_users_raw(spark: SparkSession, n: int = 2000, seed: int = 42) -> DataFrame:
    """Clean fixture honoring every schema constraint (churn_schema.json)."""
    base = spark.range(n)
    s90 = F.floor(_u(7, seed) * 200).cast("int")
    o90 = F.floor(_u(13, seed) * 30).cast("int")
    o2024 = F.floor(_u(15, seed) * 100).cast("int")
    aov = F.round(_u(16, seed) * 200, 2)
    return base.select(
        F.format_string("U%05d", F.col("id")).alias("user_id"),
        (13 + F.floor(_u(1, seed) * 88)).cast("int").alias("age"),
        _pick(COUNTRIES, 2, seed).alias("country"),
        F.format_string("City%02d", F.pmod(F.col("id"), F.lit(50))).alias("city"),
        F.floor(_u(3, seed) * 3651).cast("int").alias("reg_days"),
        _pick(SOURCES, 4, seed).alias("marketing_source"),
        F.floor(_u(5, seed) * (s90 + 1)).cast("int").alias("sessions_30d"),
        s90.alias("sessions_90d"),
        F.round(_u(8, seed) * 3600, 2).alias("avg_session_duration_90d"),
        F.round(_u(9, seed) * 20, 1).alias("median_pages_viewed_30d"),
        F.floor(_u(10, seed) * 50).cast("int").alias("search_queries_30d"),
        F.round(_u(11, seed), 4).alias("device_mix_ratio"),
        _pick(VERSIONS, 12, seed).alias("app_version_major"),
        F.floor(_u(14, seed) * (o90 + 1)).cast("int").alias("orders_30d"),
        o90.alias("orders_90d"),
        o2024.alias("orders_2024"),
        aov.alias("aov_2024"),
        F.round(aov * o2024, 2).alias("gmv_2024"),  # |gmv − aov×orders| ≤ .01
        F.floor(_u(17, seed) * 15).cast("int").alias("category_diversity_2024"),
        F.floor(_u(18, seed) * 366).cast("int").alias("days_since_last_order"),
        F.round(_u(19, seed), 4).alias("discount_rate_2024"),
        F.floor(_u(20, seed) * 5).cast("int").alias("refunds_count_2024"),
        F.round(_u(21, seed) * 0.3, 4).alias("refund_rate_2024"),
        F.floor(_u(22, seed) * 10).cast("int").alias("support_tickets_2024"),
        F.round(1 + _u(23, seed) * 4, 2).alias("avg_csat_2024"),
        F.round(_u(24, seed), 4).alias("emails_open_rate_90d"),
        F.round(_u(25, seed), 4).alias("emails_click_rate_90d"),
        F.floor(_u(26, seed) * 20).cast("int").alias("review_count_2024"),
        F.round(1 + _u(27, seed) * 4, 2).alias("avg_review_stars_2024"),
        F.floor(_u(28, seed) * 366).cast("int").alias("rfm_recency"),
        o2024.alias("rfm_frequency"),
        F.round(aov * o2024, 2).alias("rfm_monetary"),
        (_u(30, seed) < 0.3).cast("int").alias("churn_label"),  # rate ∈ (.05,.5)
    )


def synthesize_users_raw_dirty(
    spark: SparkSession, n: int = 2000, seed: int = 42
) -> DataFrame:
    """Dirty variant: ~2% nulls, duplicate keys, out-of-range ages, rates >1,
    negative gmv, 30d>90d inversions (FIXTURES.md dirty spec)."""
    clean = synthesize_users_raw(spark, n, seed).withColumn(
        "id", F.substring("user_id", 2, 5).cast("long")
    )
    dirty = (
        clean.withColumn(
            "age",
            F.when(_u(101, seed) < 0.02, F.lit(200))
            .when(_u(102, seed) < 0.02, F.lit(None))
            .otherwise(F.col("age"))
            .cast("int"),
        )
        .withColumn(
            "gmv_2024",
            F.when(_u(103, seed) < 0.02, F.lit(-50.0)).otherwise(F.col("gmv_2024")),
        )
        .withColumn(
            "refund_rate_2024",
            F.when(_u(104, seed) < 0.02, F.lit(1.7)).otherwise(
                F.col("refund_rate_2024")
            ),
        )
        .withColumn(
            "sessions_30d",
            F.when(
                _u(105, seed) < 0.02, F.col("sessions_90d") + 10
            ).otherwise(F.col("sessions_30d")),
        )
        .withColumn(
            "country",
            F.when(_u(106, seed) < 0.02, F.lit(None).cast("string")).otherwise(
                F.col("country")
            ),
        )
    )
    dirty = dirty.drop("id")
    # a few duplicated user_ids (whole-row dupes + key-only dupes)
    dupes = dirty.orderBy("user_id").limit(10)
    return dirty.unionByName(dupes)
