"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, batching, partition sizing, UDF
signatures) is real and tested; the actual media decoding is STUBBED —
image/audio libraries are not available in this container. Each decode
kernel either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the bytes (test mode), so pipelines
can be validated end-to-end without the codecs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),      # image | audio | video
    StructField("mime", StringType()),
    StructField("width", IntegerType()),    # pixels / channels
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
    StructField("payload", BinaryType()),   # opaque encoded bytes
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("feature", ArrayType(FloatType())),
    StructField("payload_sha", StringType()),
])


def synthetic_media_table(spark, n_rows: int, seed: int = 7) -> DataFrame:
    """Deterministic fake media rows (payload = seeded pseudo-bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = np.array(["image", "audio", "video"])
        mimes = {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            k = kinds[ids % 3]
            rows = {
                "media_id": ids,
                "kind": k,
                "mime": [mimes[x] for x in k],
                "width": (ids % 640 + 16).astype(np.int32),
                "height": (ids % 480 + 16).astype(np.int32),
                "duration_ms": np.where(k == "image", 0,
                                        (ids % 60000)).astype(np.int64),
                "payload": [hashlib.sha256(f"{seed}:{i}".encode())
                            .digest() * 4 for i in ids],
            }
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str, strict: bool) -> np.ndarray:
    """STUB decode: real implementation requires PIL/librosa/ffmpeg
    (absent here). Deterministic fake = 16 floats derived from the
    payload digest — stable across runs and partitionings."""
    if strict:
        raise NotImplementedError(
            f"{kind} decoding requires media codecs not present in this "
            "environment; run with strict=False for deterministic fakes")
    d = hashlib.sha256(payload).digest()
    return (np.frombuffer(d[:16 * 2], dtype=np.uint16)
            .astype(np.float32) / 65535.0)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode → feature-extract as a mapInPandas kernel. The Arrow
    batch shape, schema, and hashing are production-real; only the
    decode is stubbed."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, shas = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                payload = bytes(payload)
                feats.append(_decode_stub(payload, kind, strict).tolist())
                shas.append(hashlib.sha256(payload).hexdigest()[:16])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "payload_sha": shas})

    return media.select("media_id", "kind", "payload") \
        .mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling plan (pure JVM arithmetic): which frame
    timestamps to decode per video — the scheduling half of frame
    extraction, decoupled from the stubbed decoder."""
    vids = media.where(F.col("kind") == "video")
    n_frames = F.greatest(
        F.lit(1), F.floor(F.col("duration_ms") / F.lit(1000.0) * fps)
        .cast("int"))
    return (vids.withColumn("n_frames", n_frames)
            .withColumn("frame_idx",
                        F.explode(F.sequence(F.lit(0),
                                             F.col("n_frames") - 1)))
            .withColumn("timestamp_ms",
                        (F.col("frame_idx") * F.lit(1000.0) / fps)
                        .cast("long"))
            .select("media_id", "frame_idx", "timestamp_ms"))
