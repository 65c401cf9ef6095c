"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (north-star extension; no reference equivalent — the reference is
flat tabular only, SURVEY §1.1).

Design for 100 TB:
- payloads are ``BinaryType`` columns riding ordinary parquet row groups —
  scans prune them unless selected (column pruning keeps metadata-only
  queries cheap);
- every decode/transform is ``mapInPandas`` (Arrow-batched, one Python
  worker per partition) — never a row-at-a-time UDF;
- partition count governs decode parallelism: repartition by a key hash
  before heavy decode so batches are even.

Codec stubs: PIL/librosa/ffmpeg are NOT in this container. Each decode tries
the real library and falls back to a clearly-marked DETERMINISTIC FAKE that
derives pixel/sample values from the payload bytes — the Spark plumbing
(schemas, batch iteration, output shapes) is identical to the real path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table: payload =
    utf-8 bytes of the text (a stand-in blob), typed metadata map."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
            F.lit("lang"), F.col("lang"),
        ).alias("meta"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_media(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract each payload via Arrow-batched mapInPandas.

    Real path (if PIL importable): open image payloads, report true
    dimensions. Stub path: dimensions derived from byte length
    (NotImplementedError only if a real codec is strictly required —
    here the fake keeps the pipeline runnable end-to-end).
    """

    # NB: the closure must be self-contained (no module-global references):
    # executors unpickle it without this package on their PYTHONPATH when the
    # driver imports the engine by file path.
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def fake_dims(n: int) -> tuple[int, int]:
            w = max(int(n**0.5), 1)
            return w, max(n // w, 1)

        try:  # real codec, absent in this container
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False

        for pdf in batches:
            payloads = pdf["payload"]
            lens = payloads.map(lambda b: len(b) if b is not None else 0)
            means, entropies, widths, heights = [], [], [], []
            for b in payloads:
                if not b:
                    means.append(0.0)
                    entropies.append(0.0)
                    widths.append(0)
                    heights.append(0)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                means.append(float(arr.mean()))
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / arr.size
                entropies.append(float(-(p * np.log2(p)).sum()))
                if have_pil:
                    # real decode would go here; payloads are synthetic so
                    # fall through to the deterministic geometry either way
                    pass
                w, h = fake_dims(arr.size)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": lens.astype("int64"),
                    "mean_byte": means,
                    "byte_entropy": entropies,
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                }
            )

    return media.mapInPandas(decode, schema=_DECODE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(
    media: DataFrame, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """Video frame sampling plumbing: split each payload into fixed-size
    "frames", keep every Nth — one output row per sampled frame (the fan-out
    shape a real ffmpeg sampler produces). Real decoder: stubbed (payloads
    are synthetic); the batch iteration + row-explosion shape is real."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if not b:
                    continue
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(b[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(sample, schema=_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codec tier (stdlib-only): PNG. The container has no PIL/ffmpeg, but a
# grayscale PNG needs nothing beyond struct + zlib — so this tier round-trips
# genuine image bytes end-to-end: encode real PNGs, decode them back (chunk
# walk, IHDR parse, IDAT inflate, filter strip), all inside Arrow-batched
# mapInPandas. Dimensions and pixel values follow a closed form, which makes
# the whole encode→decode loop DuckDB-oracle-checkable.
# ---------------------------------------------------------------------------

_PNG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_PNG_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def synthetic_png_media(documents: DataFrame) -> DataFrame:
    """One REAL grayscale PNG per document: width = 8 + doc_id % 9,
    height = 8 + doc_id % 7, pixel[i] = (7·i + doc_id) % 256. Valid files —
    any external viewer or PIL decodes them identically."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        def png(media_id: int) -> bytes:
            w = 8 + media_id % 9
            h = 8 + media_id % 7
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
            raw = b"".join(
                b"\x00"  # filter type 0 per scanline
                + bytes((7 * (y * w + x) + media_id) % 256 for x in range(w))
                for y in range(h)
            )
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [png(int(i)) for i in pdf["doc_id"]],
                }
            )

    return documents.select("doc_id").mapInPandas(encode, schema=_PNG_SCHEMA)


def decode_png(media: DataFrame) -> DataFrame:
    """Real PNG decode (stdlib-only): walk chunks, parse IHDR dimensions,
    inflate the IDAT stream, strip per-scanline filter bytes (type 0 only —
    raises on filtered files rather than returning wrong pixels), report
    true dimensions and mean pixel value."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def parse(b: bytes) -> tuple[int, int, float]:
            if b[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG payload")
            w = h = None
            idat = b""
            pos = 8
            while pos < len(b):
                (length,) = struct.unpack(">I", b[pos : pos + 4])
                tag = b[pos + 4 : pos + 8]
                data = b[pos + 8 : pos + 8 + length]
                if tag == b"IHDR":
                    w, h = struct.unpack(">II", data[:8])
                elif tag == b"IDAT":
                    idat += data
                elif tag == b"IEND":
                    break
                pos += 12 + length
            raw = zlib.decompress(idat)
            total = 0
            for y in range(h):
                row = raw[y * (w + 1) : (y + 1) * (w + 1)]
                if row[0] != 0:
                    raise NotImplementedError("only filter type 0 supported")
                total += sum(row[1:])
            return w, h, total / (w * h)

        for pdf in batches:
            out = [parse(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series([o[0] for o in out], dtype="int32"),
                    "height": pd.Series([o[1] for o in out], dtype="int32"),
                    "mean_pixel": pd.Series([o[2] for o in out], dtype="float64"),
                }
            )

    return media.mapInPandas(decode, schema=_PNG_DECODE_SCHEMA)


# Audio twin of the PNG tier: RIFF/WAVE PCM needs only struct, so the audio
# leg also gets a REAL codec path — 16-bit mono PCM with a closed-form
# sample pattern, decoded back via header parse + sample unpack.

_WAV_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_WAV_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("mean_abs_sample", T.DoubleType()),
    ]
)


def synthetic_wav_media(documents: DataFrame) -> DataFrame:
    """One REAL 16-bit mono PCM WAV per document: sample_rate = 8000,
    n_samples = 64 + doc_id % 97, sample[i] = ((31·i + doc_id) % 2001) - 1000.
    Valid RIFF files — any audio library reads them identically."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def wav(media_id: int) -> bytes:
            rate = 8000
            n = 64 + media_id % 97
            samples = [((31 * i + media_id) % 2001) - 1000 for i in range(n)]
            data = struct.pack(f"<{n}h", *samples)
            fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
            body = (
                b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data
            )
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [wav(int(i)) for i in pdf["doc_id"]],
                }
            )

    return documents.select("doc_id").mapInPandas(encode, schema=_WAV_SCHEMA)


def decode_wav(media: DataFrame) -> DataFrame:
    """Real WAV decode (stdlib-only): RIFF chunk walk, fmt parse (PCM,
    16-bit only — raises otherwise), sample unpack, mean |amplitude|."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def parse(b: bytes) -> tuple[int, int, float]:
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError("not a WAV payload")
            pos, rate, bits, data = 12, None, None, None
            while pos + 8 <= len(b):
                tag = b[pos : pos + 4]
                (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                chunk = b[pos + 8 : pos + 8 + length]
                if tag == b"fmt ":
                    fmt_code, _ch, rate, _bps, _align, bits = struct.unpack(
                        "<HHIIHH", chunk[:16]
                    )
                    if fmt_code != 1 or bits != 16:
                        raise NotImplementedError("PCM 16-bit only")
                elif tag == b"data":
                    data = chunk
                pos += 8 + length + (length & 1)
            n = len(data) // 2
            samples = struct.unpack(f"<{n}h", data)
            return rate, n, sum(abs(s) for s in samples) / n

        for pdf in batches:
            out = [parse(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "sample_rate": pd.Series([o[0] for o in out], dtype="int32"),
                    "n_samples": pd.Series([o[1] for o in out], dtype="int32"),
                    "mean_abs_sample": pd.Series(
                        [o[2] for o in out], dtype="float64"
                    ),
                }
            )

    return media.mapInPandas(decode, schema=_WAV_DECODE_SCHEMA)


def resize_png(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """REAL image resize for the PNG tier (stdlib-only): decode each payload
    (chunk walk + inflate + filter strip), nearest-neighbor sample to
    (target_w, target_h) — src pixel (x·sw)//tw, (y·sh)//th — and re-encode
    a valid PNG. The shape a real thumbnailer has: decode → kernel →
    encode inside one Arrow-batched mapInPandas pass; swap the kernel for
    PIL's resampling when the deployment has it.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        def decode(b: bytes):
            if b[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG payload")
            w = h = None
            idat = b""
            pos = 8
            while pos < len(b):
                (length,) = struct.unpack(">I", b[pos : pos + 4])
                tag = b[pos + 4 : pos + 8]
                data = b[pos + 8 : pos + 8 + length]
                if tag == b"IHDR":
                    w, h = struct.unpack(">II", data[:8])
                elif tag == b"IDAT":
                    idat += data
                elif tag == b"IEND":
                    break
                pos += 12 + length
            raw = zlib.decompress(idat)
            rows = [raw[y * (w + 1) + 1 : (y + 1) * (w + 1)] for y in range(h)]
            return w, h, rows

        def encode(w: int, h: int, rows: list[bytes]) -> bytes:
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
            raw = b"".join(b"\x00" + r for r in rows)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                sw, sh, rows = decode(bytes(b))
                resized = [
                    bytes(
                        rows[(y * sh) // target_h][(x * sw) // target_w]
                        for x in range(target_w)
                    )
                    for y in range(target_h)
                ]
                out.append(encode(target_w, target_h, resized))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "payload": out}
            )

    return media.mapInPandas(work, schema=_PNG_SCHEMA)


# Video leg with a REAL standard container: APNG (animated PNG, the
# acTL/fcTL/fdAT chunk extension). Encoder emits spec-valid animations;
# the frame sampler genuinely parses the container — walks the chunk
# sequence, pairs fcTL frame-control with its IDAT/fdAT payload, inflates
# only the SAMPLED frames (every_n) — the decode-on-demand shape a real
# ffmpeg frame sampler has.

_APNG_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def synthetic_apng_media(documents: DataFrame) -> DataFrame:
    """One REAL APNG per document: n_frames = 3 + doc_id % 4 full-size
    frames, frame f pixel[i] = (7·i + doc_id + 31·f) % 256."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        def apng(media_id: int) -> bytes:
            w = 8 + media_id % 9
            h = 8 + media_id % 7
            n_frames = 3 + media_id % 4
            out = b"\x89PNG\r\n\x1a\n"
            out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            out += chunk(b"acTL", struct.pack(">II", n_frames, 0))
            seq = 0
            for f in range(n_frames):
                fctl = struct.pack(
                    ">IIIIIHHBB", seq, w, h, 0, 0, 1, 10, 0, 0
                )
                out += chunk(b"fcTL", fctl)
                seq += 1
                raw = b"".join(
                    b"\x00"
                    + bytes(
                        (7 * (y * w + x) + media_id + 31 * f) % 256
                        for x in range(w)
                    )
                    for y in range(h)
                )
                comp = zlib.compress(raw)
                if f == 0:
                    out += chunk(b"IDAT", comp)
                else:
                    out += chunk(b"fdAT", struct.pack(">I", seq) + comp)
                    seq += 1
            return out + chunk(b"IEND", b"")

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [apng(int(i)) for i in pdf["doc_id"]],
                }
            )

    return documents.select("doc_id").mapInPandas(encode, schema=_PNG_SCHEMA)


def apng_frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Real video frame sampling: parse the APNG chunk stream, keep every
    ``every_n``-th frame, inflate ONLY those frames, return per-frame
    dimensions and mean pixel. One output row per sampled frame."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def frames(b: bytes):
            if b[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG/APNG payload")
            pos = 8
            w = h = None
            pending = None  # fcTL of the frame whose data comes next
            idx = 0
            while pos < len(b):
                (length,) = struct.unpack(">I", b[pos : pos + 4])
                tag = b[pos + 4 : pos + 8]
                data = b[pos + 8 : pos + 8 + length]
                if tag == b"IHDR":
                    w, h = struct.unpack(">II", data[:8])
                elif tag == b"fcTL":
                    fw, fh = struct.unpack(">II", data[4:12])
                    pending = (idx, fw, fh)
                    idx += 1
                elif tag in (b"IDAT", b"fdAT") and pending is not None:
                    comp = data if tag == b"IDAT" else data[4:]
                    yield (*pending, comp)
                    pending = None
                elif tag == b"IEND":
                    break
                pos += 12 + length

        for pdf in batches:
            ids, idxs, ws, hs, means = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                for fi, fw, fh, comp in frames(bytes(b)):
                    if fi % every_n != 0:
                        continue  # skipped frames are never inflated
                    raw = zlib.decompress(comp)
                    total = sum(
                        sum(raw[y * (fw + 1) + 1 : (y + 1) * (fw + 1)])
                        for y in range(fh)
                    )
                    ids.append(int(mid))
                    idxs.append(fi)
                    ws.append(fw)
                    hs.append(fh)
                    means.append(total / (fw * fh))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_pixel": pd.Series(means, dtype="float64"),
                }
            )

    return media.mapInPandas(sample, schema=_APNG_FRAME_SCHEMA)
