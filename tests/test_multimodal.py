"""Multimodal plumbing tests: schema, batch shapes, fan-out counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skiliopay_datapipeline_customer_spark.io import table
from skiliopay_datapipeline_customer_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    frame_sample,
    synthetic_media,
)


def test_media_schema_and_payload(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    media = synthetic_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["meta"] == "map<string,string>"
    assert media.count() == docs.count()
    # payload byte length == octet length of the text
    bad = media.join(docs, media.media_id == docs.doc_id).filter(
        F.length("payload") != F.length(F.encode("text", "utf-8"))
    )
    assert bad.count() == 0
    # round-trips through parquet with the declared schema
    assert [f.name for f in media.schema.fields] == [
        f.name for f in MEDIA_SCHEMA.fields
    ]


def test_decode_media_features(spark, sf_dir):
    media = synthetic_media(table(spark, sf_dir, "documents")).repartition(4)
    feats = decode_media(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert r["byte_len"] > 0
        assert 0 <= r["mean_byte"] <= 255
        assert 0 <= r["byte_entropy"] <= 8
        assert r["width"] * r["height"] <= r["byte_len"] + r["width"]


def test_frame_sample_fanout(spark, sf_dir):
    media = synthetic_media(table(spark, sf_dir, "documents"))
    frames = frame_sample(media, frame_bytes=64, every_n=4)
    # expected fan-out: ceil(len/64) frames, every 4th kept
    expected = media.select(
        F.ceil(F.ceil(F.length("payload") / 64) / 4).alias("n")
    ).agg(F.sum("n")).first()[0]
    assert frames.count() == expected
    assert frames.filter(F.length("frame") > 64).count() == 0
    assert frames.filter(F.col("frame_idx") % 4 != 0).count() == 0


def test_png_roundtrip_is_a_real_codec(spark, sf_dir):
    """The PNG tier produces genuinely valid files: decodable by any
    third-party reader. Verify the signature/IHDR/IDAT structure by hand and
    cross-check one payload against the closed-form pixel generator."""
    import struct
    import zlib

    from skiliopay_datapipeline_customer_spark.io import table
    from skiliopay_datapipeline_customer_spark.operators.multimodal import (
        decode_png,
        synthetic_png_media,
    )
    import pyspark.sql.functions as F

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    media = synthetic_png_media(docs)
    row = media.filter(F.col("media_id") == 3).first()
    b = bytes(row["payload"])
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", b[16:24])
    assert (w, h) == (8 + 3 % 9, 8 + 3 % 7)
    # inflate the IDAT by hand and compare pixels to the closed form
    (length,) = struct.unpack(">I", b[33:37])
    assert b[37:41] == b"IDAT"
    raw = zlib.decompress(b[41 : 41 + length])
    pixels = b"".join(raw[y * (w + 1) + 1 : (y + 1) * (w + 1)] for y in range(h))
    assert list(pixels) == [(7 * i + 3) % 256 for i in range(w * h)]

    decoded = {r["media_id"]: r for r in decode_png(media).collect()}
    assert decoded[3]["width"] == w and decoded[3]["height"] == h
    assert abs(decoded[3]["mean_pixel"] - sum(pixels) / (w * h)) < 1e-9


def test_wav_roundtrip_is_a_real_codec(spark, sf_dir):
    """Generated WAVs are valid by an INDEPENDENT reader (stdlib wave
    module), and the engine decoder agrees with it."""
    import io
    import wave

    from skiliopay_datapipeline_customer_spark.io import table
    from skiliopay_datapipeline_customer_spark.operators.multimodal import (
        decode_wav,
        synthetic_wav_media,
    )
    import pyspark.sql.functions as F

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    media = synthetic_wav_media(docs)
    payload = bytes(media.filter(F.col("media_id") == 7).first()["payload"])
    wf = wave.open(io.BytesIO(payload))
    assert wf.getframerate() == 8000
    assert wf.getnframes() == 64 + 7 % 97
    assert wf.getsampwidth() == 2 and wf.getnchannels() == 1

    decoded = {r["media_id"]: r for r in decode_wav(media).collect()}
    assert decoded[7]["sample_rate"] == 8000
    assert decoded[7]["n_samples"] == wf.getnframes()


def test_apng_degrades_to_plain_png_frame_zero(spark, sf_dir):
    """APNG spec compliance: a plain-PNG decoder (ours, ignoring the
    animation chunks) must decode exactly frame 0 — the format's designed
    fallback behavior."""
    from skiliopay_datapipeline_customer_spark.io import table
    from skiliopay_datapipeline_customer_spark.operators.multimodal import (
        apng_frame_sample,
        decode_png,
        synthetic_apng_media,
    )
    import pyspark.sql.functions as F

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 8)
    media = synthetic_apng_media(docs)
    as_png = {r["media_id"]: r for r in decode_png(media).collect()}
    frames = {
        (r["media_id"], r["frame_idx"]): r
        for r in apng_frame_sample(media, every_n=1).collect()
    }
    for mid, png_row in as_png.items():
        f0 = frames[(mid, 0)]
        assert (png_row["width"], png_row["height"]) == (f0["width"], f0["height"])
        assert abs(png_row["mean_pixel"] - f0["mean_pixel"]) < 1e-9


def test_codec_decoders_reject_corrupt_payloads(spark):
    """Real decoders fail loudly on garbage rather than emitting wrong
    values: non-PNG bytes, non-WAV bytes, and a truncated-but-signed PNG."""
    from skiliopay_datapipeline_customer_spark.operators.multimodal import (
        decode_png,
        decode_wav,
    )

    bad = spark.createDataFrame(
        [(1, bytearray(b"definitely not an image"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="not a PNG payload"):
        decode_png(bad).collect()
    with pytest.raises(Exception, match="not a WAV payload"):
        decode_wav(bad).collect()

    truncated = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception):
        decode_png(truncated).collect()


def test_map_in_arrow_doc_stats_matches_native_twin(spark, sf_dir):
    """The Arrow-native tier (mapInArrow, pyarrow.compute string kernels)
    produces exactly the native expression results for token/char counts."""
    from pyspark.sql import functions as F

    from skiliopay_datapipeline_customer_spark.io import table
    from skiliopay_datapipeline_customer_spark.operators.arrow_ops import (
        arrow_doc_stats,
    )
    from skiliopay_datapipeline_customer_spark.operators.textops import (
        whitespace_token_count,
    )

    docs = table(spark, sf_dir, "documents")
    arrow = arrow_doc_stats(docs).orderBy("doc_id").collect()
    native = (
        docs.select(
            "doc_id",
            whitespace_token_count(F.col("text")).cast("long").alias("n_tokens"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert len(arrow) == len(native) > 0
    assert [tuple(r) for r in arrow] == [tuple(r) for r in native]


def test_apply_in_arrow_group_trend_matches_native_aggregate(spark, sf_dir):
    """applyInArrow grouped-map slope agrees with the native
    covar_pop/var_pop closed form to float tolerance."""
    from pyspark.sql import functions as F

    from skiliopay_datapipeline_customer_spark.io import table
    from skiliopay_datapipeline_customer_spark.operators.arrow_ops import (
        arrow_group_trend,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_totalprice").alias("y"),
        (F.unix_timestamp("o_orderdate") / 86400.0).alias("x"),
    )
    arrow = {
        r["o_custkey"]: r
        for r in arrow_group_trend(orders).collect()
        if r["n_orders"] >= 3
    }
    native = {
        r["o_custkey"]: r["price_trend"]
        for r in orders.groupBy("o_custkey")
        .agg(
            (F.covar_pop("y", "x") / F.var_pop("x")).alias("price_trend"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 3)
        .collect()
    }
    assert set(arrow) == set(native) and len(native) > 0
    for k, row in arrow.items():
        assert abs(row["trend_slope"] - native[k]) < 1e-6
