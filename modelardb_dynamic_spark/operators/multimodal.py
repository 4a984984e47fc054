"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes gated behind `real_codecs=False` (clearly marked); the
Spark-side plumbing — schemas, Arrow batch shapes, partition-friendly
mapInPandas operators — is real and tested. Swapping in PIL/torchaudio
means replacing only `_fake_decode_*`.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_frames int"


def synth_media(spark, n: int = 64, parallelism: int = 4) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    return (
        spark.range(0, n, 1, parallelism)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
            ).alias("kind"),
            F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
            (F.pmod(F.col("id") * 37, F.lit(512)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("id") * 53, F.lit(512)) + 16).cast("int").alias("height"),
            (F.pmod(F.col("id") * 97, F.lit(60_000)) + 1000).cast("int").alias("duration_ms"),
        )
    )


def _fake_decode_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """FAKE decode: derives a deterministic feature vector from payload
    bytes (little-endian uint32 groups mod 1000, exact in float32 — the
    DuckDB oracle recomputes the same integers). Replace with a real codec
    (PIL / ffmpeg / torchaudio) off-sandbox."""
    arr = np.frombuffer(payload[: dim * 4].ljust(dim * 4, b"\0"), dtype="<u4")
    return (arr % 1000).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 8, real_codecs: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow binary batches).
    Frame sampling for video kinds: n_frames = duration_ms // 1000."""
    if real_codecs:
        raise NotImplementedError(
            "real image/audio codecs are not available in this container; "
            "install PIL/torchaudio and implement the decode kernel here"
        )

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p, dim).tolist() for p in pdf["payload"]
            ]
            n_frames = np.where(
                pdf["kind"].to_numpy() == "video",
                pdf["duration_ms"].to_numpy() // 1000,
                1,
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_frames": n_frames.astype(np.int32),
                }
            )

    return media.mapInPandas(map_fn, schema=FEATURE_SCHEMA)
