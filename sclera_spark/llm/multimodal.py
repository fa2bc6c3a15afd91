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
