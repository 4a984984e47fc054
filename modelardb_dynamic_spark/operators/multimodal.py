"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

AUDIO is decoded for real: synth_wav_media writes genuine RIFF/WAVE
16-bit PCM payloads and wav_features parses them back with the stdlib
`wave` module (no native codecs needed), computing duration/RMS/zero
-crossings/peak — value-gated against a DuckDB closed-form oracle
(queries.py `wav_features`), so the whole encode->decode->feature chain
is verified end-to-end.

IMAGE/VIDEO decode remains a deterministic fake gated behind
`real_codecs=False` (the container ships no image/video codecs); the
Spark-side plumbing — schemas, Arrow batch shapes, partition-friendly
mapInPandas operators — is real and tested. Swapping in PIL/ffmpeg means
replacing only `_fake_decode_features`.
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


# --- real audio codec (stdlib wave, no native libs needed) --------------------

WAV_RATE = 8000  # 16-bit mono PCM @ 8 kHz


def _wav_samples(media_id: int, n: int) -> np.ndarray:
    """Closed-form deterministic waveform: s_k = ((id*31 + k*17) % 2001)
    - 1000, int16. The DuckDB oracle recomputes the identical integers,
    so any error in the WAV encode OR decode shows up as a feature
    mismatch — the decode is verified end-to-end, not assumed."""
    k = np.arange(n, dtype=np.int64)
    return (((media_id * 31 + k * 17) % 2001) - 1000).astype(np.int16)


def synth_wav_media(spark, n: int = 128, parallelism: int = 4) -> DataFrame:
    """Deterministic table of REAL RIFF/WAVE payloads (16-bit mono PCM at
    WAV_RATE), built executor-side with the stdlib wave module. Duration
    is (id*97 % 2000 + 100) ms, so 800..16792 samples per file."""
    base = spark.range(0, n, 1, parallelism).select(
        F.col("id").alias("media_id"),
        (F.pmod(F.col("id") * 97, F.lit(2000)) + 100)
        .cast("int")
        .alias("duration_ms"),
    )

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            payloads = []
            for mid, dur in zip(pdf["media_id"], pdf["duration_ms"]):
                ns = int(dur) * WAV_RATE // 1000
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_RATE)
                    w.writeframes(_wav_samples(int(mid), ns).tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": "audio",
                    "payload": payloads,
                    "duration_ms": pdf["duration_ms"].to_numpy(),
                }
            )

    return base.mapInPandas(
        map_fn,
        schema="media_id long, kind string, payload binary, duration_ms int",
    )


WAV_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms int, rms double, zero_crossings long, peak double"
)


def wav_features(media: DataFrame) -> DataFrame:
    """REAL audio decode (VERDICT r3 'Next' #4): the stdlib wave module
    parses the RIFF container back out of the binary column; numpy
    computes duration, RMS (sqrt of the exact int64 sum of squares over
    n — bit-deterministic), sign-change zero crossings, and peak. All
    features have closed forms over the synth waveform, so the driver's
    DuckDB oracle value-gates the whole encode->decode->feature chain.
    mapInPandas keeps payload bytes inside each Arrow batch: at 100 TB
    the decode is embarrassingly parallel and shuffles only the tiny
    feature rows."""

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    rate = w.getframerate()
                    nch = w.getnchannels()
                    raw = w.readframes(w.getnframes())
                s = np.frombuffer(raw, dtype="<i2")
                ns = len(s)
                sq = int((s.astype(np.int64) ** 2).sum())
                rms = float(np.sqrt(sq / ns)) if ns else 0.0
                zc = (
                    int(((s[:-1] < 0) != (s[1:] < 0)).sum()) if ns > 1 else 0
                )
                rows.append(
                    (
                        int(mid), int(rate), int(nch), ns,
                        int(ns * 1000 // rate), rms, zc,
                        float(s.max()) if ns else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_samples",
                    "duration_ms", "rms", "zero_crossings", "peak",
                ],
            )

    return media.mapInPandas(map_fn, schema=WAV_FEATURE_SCHEMA)
