"""Multimodal declared queries. ``media_payload_stats`` is oracle-checked
(byte lengths are engine-independent); the mapInPandas decode/frame-sample
register rows-only (Python batch transforms aren't SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import table
from ..operators.multimodal import decode_media, frame_sample, synthetic_media
from . import query


@query(
    "media_payload_stats",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(CAST(text AS BLOB)) AS byte_len,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type
    FROM documents
    ORDER BY media_id
    """,
)
def media_payload_stats(spark, sf_dir):
    media = synthetic_media(table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.length("payload").cast("bigint").alias("byte_len"),
        "media_type",
    ).orderBy("media_id")


@query("media_decode_features")
def media_decode_features(spark, sf_dir):
    media = synthetic_media(table(spark, sf_dir, "documents"))
    return (
        decode_media(media)
        .select(
            "media_id",
            "byte_len",
            F.round("mean_byte", 4).alias("mean_byte"),
            F.round("byte_entropy", 4).alias("byte_entropy"),
            "width",
            "height",
        )
        .orderBy("media_id")
    )


@query("media_frame_sample")
def media_frame_sample(spark, sf_dir):
    media = synthetic_media(table(spark, sf_dir, "documents"))
    return (
        frame_sample(media, frame_bytes=64, every_n=4)
        .select("media_id", "frame_idx", F.length("frame").alias("frame_len"))
        .orderBy("media_id", "frame_idx")
    )
