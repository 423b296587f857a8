"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested. PNG decode is REAL (stdlib zlib
inflate + filter reversal, see ``decode_image``); JPEG/audio/video codecs
remain stubbed behind ``DecodeUnavailable`` because no codec libraries
exist in this container (clearly marked below).

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


# --- real PNG codec (stdlib-only: struct + zlib) -------------------------
#
# PNG is the one raster format decodable without external libraries: a
# zlib-inflated byte stream with 5 per-row predictive filters (PNG spec
# §6, RFC 2083). This de-stubs ``decode_image`` for image/png payloads;
# JPEG and audio still raise DecodeUnavailable (container has no codecs).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_row(
    ft: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reverse one PNG row filter. ``cur``/``prev`` are uint8 arrays of
    length w·bpp; returns the reconstructed uint8 row.

    Vectorized where the data dependence allows (r4 verdict #7): None/Up
    are whole-row uint8 ops (wrapping add IS the mod-256 the spec wants);
    Sub is a per-lane modular prefix sum (cumsum in uint8 wraps, so one
    cumsum per channel lane reverses the whole row). Measured on 256×256
    RGB: 33× / 353× / 47× vs the per-byte loops (BENCH/BASELINE.md §PNG).
    Average/Paeth carry a true sequential dependency on the left-neighbor
    OUTPUT byte, and numpy ops on bpp-length arrays are slower than
    scalar ints (measured 0.2×), so they stay scalar loops — SCOPE: this
    stdlib codec exists for the decode-gate fixtures and small-asset
    decoding; bulk Paeth-heavy raster decode wants a real codec library
    (PIL/opencv), not this path. Throughput is per-row; mapInPandas
    parallelism across images is unaffected."""
    if ft == 0:
        return cur.copy()
    if ft == 2:  # Up: wrapping uint8 add = (cur + prev) mod 256
        return cur + prev
    if ft == 1:  # Sub: out[x] = cur[x] + out[x-bpp] -> per-lane cumsum
        return np.cumsum(
            cur.reshape(-1, bpp), axis=0, dtype=np.uint8
        ).reshape(-1)
    n = len(cur)
    c = cur.tolist()
    pv = prev.tolist()
    out = [0] * n
    if ft == 3:  # Average
        for x in range(n):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (c[x] + ((left + pv[x]) >> 1)) & 0xFF
    elif ft == 4:  # Paeth
        for x in range(n):
            a = out[x - bpp] if x >= bpp else 0
            cc = pv[x - bpp] if x >= bpp else 0
            b = pv[x]
            p = a + b - cc
            pa = p - a if p >= a else a - p
            pb = p - b if p >= b else b - p
            pc = p - cc if p >= cc else cc - p
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b
            else:
                pred = cc
            out[x] = (c[x] + pred) & 0xFF
    else:
        raise DecodeUnavailable(f"PNG: unknown filter type {ft}")
    return np.asarray(out, dtype=np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, C) uint8 array.

    REAL for PNG (stdlib zlib inflate + filter reversal; 8-bit depth,
    color types 0/2/3/4/6, non-interlaced; palette expands to RGB).
    Anything else — JPEG, 16-bit or interlaced PNG — raises
    ``DecodeUnavailable`` (no codec libraries in this container)."""
    import struct
    import zlib

    if not isinstance(payload, (bytes, bytearray)) or not bytes(payload).startswith(
        _PNG_SIG
    ):
        raise DecodeUnavailable(
            "decode_image supports PNG only (stdlib path); other formats "
            "require PIL/opencv — not installed"
        )
    buf = bytes(payload)
    pos = len(_PNG_SIG)
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos: pos + 4])
        ctype = buf[pos + 4: pos + 8]
        data = buf[pos + 8: pos + 8 + length]
        (crc,) = struct.unpack(">I", buf[pos + 8 + length: pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise DecodeUnavailable(f"PNG: bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise DecodeUnavailable("PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise DecodeUnavailable(
            f"PNG: unsupported header (depth={depth}, interlace={interlace})"
        )
    if color not in _PNG_CHANNELS:
        raise DecodeUnavailable(f"PNG: unsupported color type {color}")
    bpp = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise DecodeUnavailable("PNG: IDAT size does not match dimensions")
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    px = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_row(int(data[y, 0]), data[y, 1:], prev, bpp)
        px[y] = prev
    px = px.reshape(h, w, bpp)
    if color == 3:
        if palette is None:
            raise DecodeUnavailable("PNG: palette image without PLTE")
        px = palette[px[:, :, 0]]
    return px


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder — the deterministic fixture generator for the
    decode gate (8-bit gray/gray+alpha/RGB/RGBA; one IDAT; every row
    filtered with ``filter_type`` so tests can exercise each of the five
    reversal paths)."""
    import struct
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bpp = ch
    raw = bytearray()
    prev = [0] * (w * ch)
    for y in range(h):
        row = [int(v) for v in arr[y].reshape(-1)]
        if filter_type == 0:
            filtered = row
        elif filter_type == 1:
            filtered = [
                (row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(len(row))
            ]
        elif filter_type == 2:
            filtered = [(row[x] - prev[x]) & 0xFF for x in range(len(row))]
        elif filter_type == 3:
            filtered = [
                (row[x] - (((row[x - bpp] if x >= bpp else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(len(row))
            ]
        elif filter_type == 4:
            filtered = [
                (
                    row[x]
                    - _paeth(
                        row[x - bpp] if x >= bpp else 0,
                        prev[x],
                        prev[x - bpp] if x >= bpp else 0,
                    )
                )
                & 0xFF
                for x in range(len(row))
            ]
        else:
            raise ValueError(f"filter_type must be 0-4, got {filter_type}")
        raw.append(filter_type)
        raw += bytes(filtered)
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def synthetic_png_media(spark: SparkSession, n: int = 12, seed: int = 7) -> DataFrame:
    """Deterministic planted-PNG media table: seeded pixel patterns encoded
    with rotating channel counts and filter types — the input to the
    ``png_decode_stats`` roundtrip gate."""
    rows = []
    for i in range(n):
        px = _synthetic_pixels(i, seed)
        rows.append(
            (
                i,
                "image",
                "image/png",
                encode_png(px, filter_type=i % 5),
                int(px.shape[1]),
                int(px.shape[0]),
                None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _synthetic_pixels(i: int, seed: int = 7) -> np.ndarray:
    """Seeded deterministic pixel array for fixture ``i`` (shared by the
    Spark fixture and the oracle's expected-stats computation)."""
    rng = np.random.default_rng(seed * 1000 + i)
    h = int(rng.integers(8, 40))
    w = int(rng.integers(8, 40))
    ch = [1, 2, 3, 4][i % 4]
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).reshape(h, w, ch)


def png_decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode gate: inflate + unfilter every image/png payload inside
    mapInPandas Arrow batches and emit (media_id, width, height, channels,
    pixel_sha256) — the sha over the RECONSTRUCTED pixel bytes, so any
    filter-reversal bug changes the hash."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, ws, hs, cs, shas = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                mids.append(int(mid))
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                cs.append(px.shape[2])
                shas.append(hashlib.sha256(px.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "channels": pd.Series(cs, dtype="int64"),
                    "pixel_sha256": shas,
                }
            )

    return media.filter(F.col("mime") == "image/png").select(
        "media_id", "payload"
    ).mapInPandas(
        stats,
        schema="media_id long, width long, height long, channels long, "
        "pixel_sha256 string",
    )
