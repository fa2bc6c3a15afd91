"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the decode kernels are STUBS
(deterministic fakes clearly marked below); everything Spark-side — the
schema contract, partition-friendly batching via mapInPandas, UDF
signatures, and Arrow batch shapes — is real and tested. Swapping a real
decoder (PIL/torchaudio/ffmpeg) in means replacing ONLY the `_decode_*`
functions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# schema contract for a multimodal asset column
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def _decode_image_stub(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder — deterministic fake. A real deployment replaces this
    with PIL/torchvision decode. Produces a (h, w) float32 'image' derived
    from the byte content so downstream feature code is exercised with
    stable values."""
    if content is None:
        raise ValueError("null content")
    h, w = max(1, min(height or 4, 16)), max(1, min(width or 4, 16))
    seed = np.frombuffer(content[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed) % (2**32))
    return rng.random((h, w), dtype=np.float32)


def _decode_audio_stub(content: bytes, duration_ms: int) -> np.ndarray:
    """STUB decoder — deterministic fake mono PCM at 1 kHz."""
    if content is None:
        raise ValueError("null content")
    n = max(1, min((duration_ms or 1000), 10_000))
    seed = np.frombuffer(content[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed) % (2**32))
    return (rng.random(n, dtype=np.float32) * 2 - 1)


# ---------------------------------------------------------------- header
# Real header-only decoders — pure stdlib struct parsing of the public
# container formats, no codec libraries. These make dimension/duration
# metadata REAL (parsed from bytes) while pixel/sample decode stays
# stubbed (container has no codecs).


def probe_media(content: bytes | None):
    """Parse (format, width, height, sample_rate, n_channels, duration_ms)
    from a media file's header bytes. Returns (None, ...) when the format
    is not recognized — never raises on arbitrary bytes."""
    none = (None, None, None, None, None, None)
    if not content or len(content) < 12:
        return none
    try:
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            # IHDR is always the first chunk: length(4) 'IHDR' w(4BE) h(4BE)
            if content[12:16] == b"IHDR":
                w, h = _unpack(">II", content, 16)
                return ("png", w, h, None, None, None)
            return none
        if content[:2] == b"\xff\xd8":
            return _probe_jpeg(content)
        if content[:6] in (b"GIF87a", b"GIF89a"):
            w, h = _unpack("<HH", content, 6)
            return ("gif", w, h, None, None, None)
        if content[:2] == b"BM" and len(content) >= 26:
            w, h = _unpack("<ii", content, 18)
            return ("bmp", w, abs(h), None, None, None)
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            return _probe_wav(content)
    except Exception:
        return none
    return none


def _unpack(fmt: str, buf: bytes, off: int):
    import struct

    return struct.unpack_from(fmt, buf, off)


def _probe_jpeg(content: bytes):
    """Walk JPEG segments to the first SOF marker (public JFIF layout:
    FF D8, then FF xx [len16 payload] segments; SOF0-15 carry
    precision(1) height(2BE) width(2BE))."""
    i, n = 2, len(content)
    sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
           0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    while i + 4 <= n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            break
        (seglen,) = _unpack(">H", content, i + 2)
        if marker in sof and i + 9 <= n:
            h, w = _unpack(">HH", content, i + 5)
            return ("jpeg", w, h, None, None, None)
        i += 2 + seglen
    return (None, None, None, None, None, None)


def _probe_wav(content: bytes):
    """Walk RIFF chunks: fmt_ carries channels/sample-rate/bits, data's
    size gives the exact duration."""
    i, n = 12, len(content)
    channels = rate = bits = None
    data_bytes = None
    while i + 8 <= n:
        cid = content[i : i + 4]
        (clen,) = _unpack("<I", content, i + 4)
        if cid == b"fmt " and i + 24 <= n:
            channels, rate = _unpack("<HI", content, i + 10)
            (bits,) = _unpack("<H", content, i + 22)
        elif cid == b"data":
            data_bytes = clen
        i += 8 + clen + (clen % 2)
    if rate is None:
        return (None, None, None, None, None, None)
    duration_ms = None
    if data_bytes is not None and channels and bits:
        frames = data_bytes // (channels * max(bits // 8, 1))
        duration_ms = int(frames * 1000 // rate)
    return ("wav", None, None, rate, channels, duration_ms)


_PROBE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("aspect_ratio", FloatType()),
    ]
)


def media_probe(df: DataFrame, id_col: str = "asset_id", content_col: str = "content") -> DataFrame:
    """Header-only metadata extraction over a binary asset column: real
    parsed dimensions/sample-rate/duration (probe_media), computed
    per-partition via mapInPandas so payload bytes stay in Arrow batches
    and never shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                fmt, w, h, rate, ch, dur = probe_media(
                    bytes(content) if content is not None else None
                )
                ar = float(w) / h if (w and h) else None
                out.append((aid, fmt, w, h, rate, ch, dur, ar))
            yield pd.DataFrame(out, columns=[f.name for f in _PROBE_SCHEMA.fields])

    return df.select(id_col, content_col).mapInPandas(gen, _PROBE_SCHEMA)


def image_features(df: DataFrame, batch_size: int = 256) -> DataFrame:
    """Decode image assets and emit basic features (mean/std intensity,
    aspect ratio) + a small embedding. mapInPandas keeps the binary column
    in Arrow batches; partitioning is whatever the upstream scan produced
    (binary payloads never shuffle unless the caller repartitions)."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("mean_intensity", FloatType()),
            StructField("std_intensity", FloatType()),
            StructField("aspect_ratio", FloatType()),
            StructField("feature_vec", ArrayType(FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_image_stub(r.content, r.width, r.height)
                vec = img.mean(axis=0)[:8].astype(np.float32)
                rows.append(
                    (
                        r.asset_id,
                        float(img.mean()),
                        float(img.std()),
                        float((r.width or 1) / max(r.height or 1, 1)),
                        vec.tolist(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.filter(F.col("media_type") == "image").mapInPandas(gen, out_schema)


def audio_features(df: DataFrame) -> DataFrame:
    """Decode audio assets and emit RMS energy + zero-crossing rate."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("rms", FloatType()),
            StructField("zero_crossing_rate", FloatType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm = _decode_audio_stub(r.content, r.duration_ms)
                zc = float(np.mean(np.abs(np.diff(np.sign(pcm))) > 0))
                rows.append((r.asset_id, float(np.sqrt((pcm**2).mean())), zc))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.filter(F.col("media_type") == "audio").mapInPandas(gen, out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed; timestamps are real)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("media_type") == "video")
        .select("asset_id", F.explode(frames).alias("frame_ts_ms"))
    )


# ------------------------------------------------- real-header fixtures
# Minimal VALID container files (headers real, payload minimal/zero) so
# probe_media can be tested against known ground truth without codecs.


def png_bytes(w: int, h: int) -> bytes:
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    )


def jpeg_bytes(w: int, h: int) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + b"\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def gif_bytes(w: int, h: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def bmp_bytes(w: int, h: int) -> bytes:
    import struct

    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 2835, 2835, 0, 0)
    return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + dib


def wav_bytes(sample_rate: int, n_channels: int, duration_ms: int) -> bytes:
    import struct

    frames = sample_rate * duration_ms // 1000
    data = b"\x00" * (frames * n_channels * 2)  # 16-bit PCM silence
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      sample_rate * n_channels * 2, n_channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def synthetic_real_assets(spark, n: int = 100) -> DataFrame:
    """Asset table whose binary payloads are REAL container files (valid
    PNG/JPEG/GIF/BMP headers, playable WAV PCM) with metadata derived
    deterministically from the id — ground truth for media_probe. Built
    driver-side: this is a tiny test fixture; a real corpus arrives as a
    parquet/Delta scan of object storage."""
    rows = []
    for i in range(n):
        w, h = i % 16 + 1, i % 9 + 1
        kind = i % 5
        if kind == 0:
            rows.append((i, "image", bytearray(png_bytes(w, h))))
        elif kind == 1:
            rows.append((i, "image", bytearray(jpeg_bytes(w, h))))
        elif kind == 2:
            rows.append((i, "image", bytearray(gif_bytes(w, h))))
        elif kind == 3:
            rows.append((i, "image", bytearray(bmp_bytes(w, h))))
        else:
            rows.append(
                (i, "audio", bytearray(wav_bytes(8000 * (i % 3 + 1), i % 2 + 1, (i % 10 + 1) * 100)))
            )
    return spark.createDataFrame(
        rows, "asset_id long, media_type string, content binary"
    )


def synthetic_assets(spark, n: int = 100) -> DataFrame:
    """Deterministic fake asset table for tests (media cycling through
    image/audio/video; content bytes derived from the id)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("asset_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            F.encode(F.concat(F.lit("asset-"), F.col("id")), "UTF-8").alias("content"),
            (F.col("id") % 16 + 1).cast("int").alias("width"),
            (F.col("id") % 9 + 1).cast("int").alias("height"),
            ((F.col("id") % 10 + 1) * 1000).alias("duration_ms"),
        )
    )
