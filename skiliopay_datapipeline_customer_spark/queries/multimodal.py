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


# REAL codec round-trip (stdlib-only PNG): encode genuine grayscale PNGs,
# decode them back (IHDR parse + IDAT inflate + filter strip) inside
# mapInPandas. Dimensions and pixels follow a closed form, so the DuckDB
# oracle recomputes the expected decode output analytically — if either the
# encoder or the decoder were wrong, the hash would not match.


@query(
    "png_roundtrip_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(8 + doc_id % 9 AS INT) AS width,
             CAST(8 + doc_id % 7 AS INT) AS height
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS media_id, width, height,
           round(avg(CAST((7 * r.range + doc_id) % 256 AS DOUBLE)), 6) AS mean_pixel
    FROM d CROSS JOIN range(0, 300) r
    WHERE r.range < width * height
    GROUP BY doc_id, width, height
    ORDER BY media_id
    """,
)
def png_roundtrip_decode(spark, sf_dir):
    from ..operators.multimodal import decode_png, synthetic_png_media

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (
        decode_png(synthetic_png_media(docs))
        .select(
            "media_id",
            "width",
            "height",
            F.round("mean_pixel", 6).alias("mean_pixel"),
        )
        .orderBy("media_id")
    )


# Audio twin of png_roundtrip_decode: real RIFF/WAVE PCM files encoded and
# decoded in-engine; the oracle recomputes sample stats analytically.


@query(
    "wav_roundtrip_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id, CAST(64 + doc_id % 97 AS INT) AS n_samples
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS media_id,
           CAST(8000 AS INT) AS sample_rate,
           n_samples,
           round(avg(abs(CAST((31 * r.range + doc_id) % 2001 - 1000 AS DOUBLE))), 6)
             AS mean_abs_sample
    FROM d CROSS JOIN range(0, 161) r
    WHERE r.range < n_samples
    GROUP BY doc_id, n_samples
    ORDER BY media_id
    """,
)
def wav_roundtrip_decode(spark, sf_dir):
    from ..operators.multimodal import decode_wav, synthetic_wav_media

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (
        decode_wav(synthetic_wav_media(docs))
        .select(
            "media_id",
            "sample_rate",
            "n_samples",
            F.round("mean_abs_sample", 6).alias("mean_abs_sample"),
        )
        .orderBy("media_id")
    )


# Real resize round-trip: encode PNGs, nearest-neighbor resize to 6x5,
# decode the RESIZED files. The oracle recomputes the sampled pixel grid
# analytically: resized pixel (x,y) = source ((x*sw)//6, (y*sh)//5).


@query(
    "png_resize_roundtrip",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(8 + doc_id % 9 AS BIGINT) AS sw,
             CAST(8 + doc_id % 7 AS BIGINT) AS sh
      FROM documents WHERE doc_id < 100
    ),
    px AS (
      SELECT doc_id,
             (7 * (((r.range // 6) * sh // 5) * sw + ((r.range % 6) * sw // 6))
              + doc_id) % 256 AS v
      FROM d CROSS JOIN range(0, 30) r
    )
    SELECT doc_id AS media_id,
           CAST(6 AS INT) AS width, CAST(5 AS INT) AS height,
           round(avg(CAST(v AS DOUBLE)), 6) AS mean_pixel
    FROM px GROUP BY doc_id
    ORDER BY media_id
    """,
)
def png_resize_roundtrip(spark, sf_dir):
    from ..operators.multimodal import decode_png, resize_png, synthetic_png_media

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    resized = resize_png(synthetic_png_media(docs), target_w=6, target_h=5)
    return (
        decode_png(resized)
        .select(
            "media_id",
            "width",
            "height",
            F.round("mean_pixel", 6).alias("mean_pixel"),
        )
        .orderBy("media_id")
    )


# Video-leg round-trip on a REAL standard container (APNG): encode animated
# PNGs, sample every 2nd frame by parsing the chunk stream, decode only the
# sampled frames. Oracle recomputes each sampled frame's mean analytically.


@query(
    "apng_frame_sample",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(8 + doc_id % 9 AS BIGINT) AS w,
             CAST(8 + doc_id % 7 AS BIGINT) AS h,
             3 + doc_id % 4 AS n_frames
      FROM documents WHERE doc_id < 100
    ),
    f AS (
      SELECT doc_id, w, h, fr.range AS frame_idx
      FROM d CROSS JOIN range(0, 7) fr
      WHERE fr.range < n_frames AND fr.range % 2 = 0
    )
    SELECT doc_id AS media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(avg(CAST((7 * px.range + doc_id + 31 * frame_idx) % 256
                          AS DOUBLE)), 6) AS mean_pixel
    FROM f CROSS JOIN range(0, 300) px
    WHERE px.range < w * h
    GROUP BY doc_id, frame_idx, w, h
    ORDER BY media_id, frame_idx
    """,
)
def apng_frame_sample(spark, sf_dir):
    from ..operators.multimodal import apng_frame_sample as sample_op
    from ..operators.multimodal import synthetic_apng_media

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        sample_op(synthetic_apng_media(docs), every_n=2)
        .select(
            "media_id",
            "frame_idx",
            "width",
            "height",
            F.round("mean_pixel", 6).alias("mean_pixel"),
        )
        .orderBy("media_id", "frame_idx")
    )
