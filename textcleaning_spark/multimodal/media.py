"""Multimodal columns: image/audio/video as opaque binary + typed meta.

Design for 100 TB training-data pipelines: media payloads are opaque
``binary`` columns with a typed metadata struct; decode / feature
extraction / resize / frame sampling run as Arrow-batched
``mapInPandas`` kernels so the JVM never materializes decoded frames
and Python sees whole batches.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode step is STUBBED: ``mode="real"`` raises
NotImplementedError with the integration point documented; ``mode=
"fake"`` produces deterministic hash-derived features so ALL the
Spark-side plumbing — schema, batching, partitioning, row expansion —
is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("mime", StringType(), True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)

_KINDS = ("image", "audio", "video")
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def generate_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded hash bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = _KINDS[i % 3]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "width": 64 + (i % 8) * 32 if kind == "image" else None,
                        "height": 64 + (i % 5) * 32 if kind == "image" else None,
                        "sample_rate": 16_000 if kind == "audio" else None,
                        "duration_ms": 1000 + (i % 10) * 500
                        if kind in ("audio", "video")
                        else None,
                        "mime": _MIMES[kind],
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, 4).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_features(payload: bytes) -> list[float]:
    h = hashlib.md5(payload or b"").digest()
    return [round(b / 255.0, 6) for b in h[:FEATURE_DIM]]


def extract_features(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (one Arrow batch per
    call; the decoded representation never leaves the Python worker).

    mode="real" is the integration point for PIL/torchaudio/ffmpeg —
    not available in this container."""
    if mode == "real":
        raise NotImplementedError(
            "real decoders (PIL/torchaudio/ffmpeg) are not installed in "
            "this environment; plug them in here — the Spark plumbing "
            "(schema, batching, partitioning) is identical for mode='fake'"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return df.mapInPandas(kernel, FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, mode: str = "fake") -> DataFrame:
    """Frame sampling (video rows expand to one row per sampled frame)
    — a mapInPandas row-expanding kernel (UDTF shape)."""
    if mode == "real":
        raise NotImplementedError("ffmpeg frame extraction not available here")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video" or r.duration_ms is None:
                    continue
                n_frames = max(1, int(r.duration_ms) // every_ms)
                for fi in range(n_frames):
                    frame = hashlib.sha256(
                        (r.payload or b"") + fi.to_bytes(4, "big")
                    ).digest()
                    out.append(
                        {"media_id": r.media_id, "frame_idx": fi, "frame": frame}
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(kernel, FRAMES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, mode: str = "fake") -> DataFrame:
    """Image resize stub: fake mode rewrites metadata + payload hash
    (real mode = PIL thumbnail in the same kernel shape)."""
    if mode == "real":
        raise NotImplementedError("PIL not available here")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["kind"] == "image"
            pdf = pdf.copy()
            pdf.loc[mask, "width"] = width
            pdf.loc[mask, "height"] = height
            pdf.loc[mask, "payload"] = pdf.loc[mask, "payload"].map(
                lambda p: hashlib.sha256((p or b"") + b"resized").digest()
            )
            yield pdf

    return df.mapInPandas(kernel, MEDIA_SCHEMA)
