"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested; the actual codec step is stubbed
behind ``DecodeUnavailable`` / a deterministic fake because no
image/audio libraries exist in this container (clearly marked below).

At 100 TB the pattern is: store payloads in their own parquet column chunk
(never project them unless needed — column pruning keeps metadata-only
queries fast), partition by (modality, shard), and run decode/feature UDFs
via ``mapInPandas`` so each Arrow batch amortizes Python overhead.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised where a real codec would run. STUB: image/audio decode
    libraries are not installed in this container; the Spark plumbing
    around this point (schemas, batching, partitioning) is real."""


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes are
    seeded PRNG output, sized like small thumbnails."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        size = int(rng.integers(256, 2048))
        payload = rng.bytes(size)
        rows.append(
            (
                i,
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[
                    modality
                ],
                payload,
                int(rng.integers(16, 256)) if modality != "audio" else None,
                int(rng.integers(16, 256)) if modality != "audio" else None,
                int(rng.integers(1000, 60000)) if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def payload_stats(media: DataFrame) -> DataFrame:
    """Metadata-only pass: byte size + sha256 of payload, per modality.
    Pure column expressions — payload column is projected but nothing
    decodes."""
    return media.select(
        "media_id",
        "modality",
        F.length("payload").alias("payload_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )


def extract_features(
    media: DataFrame, feature_dim: int = 8, batch_hint: int = 1024
) -> DataFrame:
    """Decode → feature-extract over Arrow batches via mapInPandas.

    The decode step is a deterministic fake (byte-histogram features from
    the raw payload — STUB for a real codec + model forward pass); the
    batching, schema, and partition behavior are exactly what a real
    extractor uses. Output: (media_id, modality, features: array<double>).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append([0.0] * feature_dim)
                    continue
                # STUB decode: byte histogram folded to feature_dim bins.
                # A real implementation decodes the payload
                # (PIL/torchaudio/pyav) and runs a feature model here.
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % feature_dim, minlength=feature_dim)
                feats.append((hist / max(len(arr), 1)).astype(float).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "modality": pdf["modality"].values,
                    "features": feats,
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        extract,
        schema="media_id long, modality string, features array<double>",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode
    (media_id, frame_idx, ts_ms). Pure built-in expressions (sequence +
    explode); the decode itself would consume this plan via mapInPandas.
    """
    vids = media.filter(F.col("modality") == "video")
    ts = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return vids.select(
        "media_id", F.posexplode(ts).alias("frame_idx", "ts_ms")
    )


def decode_image(payload: bytes):
    """STUB: real image decode is unavailable in this container."""
    raise DecodeUnavailable(
        "image decode requires PIL/opencv — not installed; "
        "use extract_features (deterministic fake) for plumbing tests"
    )
