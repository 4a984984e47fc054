"""Delta-of-delta timestamp codec for IRREGULAR series (raw tier).

The segment store handles regular grids (start_ts + k*si); the raw tier's
arrival timestamps — turn times in a conversation, event times per user —
are irregular, and the north-star model family names delta-of-delta as
the codec for exactly this case (the Gorilla paper's timestamp half;
the reference engine never stores irregular timestamps at all, it
pre-buckets to the sampling interval, so this codec is an addition, not
a port: no counterpart under /root/reference).

Transform (classic): dod[i] = (t[i] - t[i-1]) - (t[i-1] - t[i-2]).
Near-constant cadence makes most dods zero or tiny regardless of the
cadence itself, so the entropy lives in the jitter, not the rate.

Layout (original, chosen for VECTORIZED decode — the Gorilla bitstream
decodes one varint at a time, which in Python would be a per-row loop):
planar/byte-aligned rather than a bitstream.

    header : magic 'D2' | w1 uint8 | w2 uint8 | n int64 | t0 int64 | d0 int64
    planes : 2-bit class codes for the m = max(n-2, 0) dods, 4 per byte
    payload: section 1 — all class-1 dods as int{w1}, stream order
             section 2 — all class-2 dods as int{w2}, stream order
             section 3 — all class-3 dods as int64,  stream order

Class 0 (dod == 0) stores nothing: cost 0.25 B/point on a steady cadence
(32x vs raw int64). (w1, w2) are chosen PER BLOB from {(8,16), (8,32),
(16,32)} by exact size accounting over the dod width histogram, so
second-jitter corpora get int16 payloads and minute-jitter corpora get
int32 without a global tuning knob. Both encode and decode are pure
numpy: classification masks, packbits-style 2-bit planes, boolean-mask
scatter/gather, two cumsums — no per-element Python anywhere, which is
what lets the Spark operators (operators/rawtier.py) run this inside
Arrow-batched applyInPandas/mapInPandas.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"D2"
_HDR = struct.Struct("<2sBBqqq")  # magic, w1, w2, n, t0, d0
_WIDTH_COMBOS = ((8, 16), (8, 32), (16, 32))


def _fits(x: np.ndarray, bits: int) -> np.ndarray:
    lo = -(1 << (bits - 1))
    return (x >= lo) & (x < -lo)


def encode_ts(t: np.ndarray) -> bytes:
    """Encode a sorted int64 timestamp array. Empty input -> b''."""
    t = np.ascontiguousarray(t, dtype=np.int64)
    n = len(t)
    if n == 0:
        return b""
    t0 = int(t[0])
    d0 = int(t[1] - t[0]) if n >= 2 else 0
    if n <= 2:
        return _HDR.pack(_MAGIC, 8, 16, n, t0, d0)

    d = np.diff(t)
    dod = np.diff(d)  # m = n - 2 entries
    zero = dod == 0
    f8, f16, f32 = _fits(dod, 8), _fits(dod, 16), _fits(dod, 32)
    nz = ~zero
    # exact byte cost of each width pair over this blob's dods
    counts = {
        8: int(np.count_nonzero(f8 & nz)),
        16: int(np.count_nonzero(f16 & nz)),
        32: int(np.count_nonzero(f32 & nz)),
    }
    m_nz = int(np.count_nonzero(nz))
    best, best_cost = None, None
    for w1, w2 in _WIDTH_COMBOS:
        c1 = counts[w1]
        c2 = counts[w2] - c1
        c3 = m_nz - counts[w2]
        cost = c1 * (w1 // 8) + c2 * (w2 // 8) + c3 * 8
        if best_cost is None or cost < best_cost:
            best, best_cost = (w1, w2), cost
    w1, w2 = best
    fit1 = _fits(dod, w1) & nz
    fit2 = _fits(dod, w2) & nz & ~fit1
    fit3 = nz & ~fit1 & ~fit2

    codes = np.zeros(len(dod), dtype=np.uint8)
    codes[fit1] = 1
    codes[fit2] = 2
    codes[fit3] = 3
    pad = (-len(codes)) % 4
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    plane = (
        codes.reshape(-1, 4)
        * np.array([1, 4, 16, 64], dtype=np.uint8)
    ).sum(axis=1, dtype=np.uint8)

    parts = [
        _HDR.pack(_MAGIC, w1, w2, n, t0, d0),
        plane.tobytes(),
        dod[fit1].astype(f"<i{w1 // 8}").tobytes(),
        dod[fit2].astype(f"<i{w2 // 8}").tobytes(),
        dod[fit3].astype("<i8").tobytes(),
    ]
    return b"".join(parts)


def decode_ts(blob: bytes) -> np.ndarray:
    """Inverse of encode_ts: blob -> int64 timestamp array."""
    if len(blob) == 0:
        return np.empty(0, dtype=np.int64)
    magic, w1, w2, n, t0, d0 = _HDR.unpack_from(blob, 0)
    if magic != _MAGIC:
        raise ValueError("not a D2 delta-of-delta blob")
    if n == 1:
        return np.array([t0], dtype=np.int64)
    if n == 2:
        return np.array([t0, t0 + d0], dtype=np.int64)

    m = n - 2
    off = _HDR.size
    n_plane = (m + 3) // 4
    plane = np.frombuffer(blob, dtype=np.uint8, count=n_plane, offset=off)
    off += n_plane
    # 2-bit codes back out: little-endian within the byte, same as encode
    codes = (
        plane[:, None] >> np.array([0, 2, 4, 6], dtype=np.uint8)
    ).reshape(-1)[:m] & 3

    dod = np.zeros(m, dtype=np.int64)
    for cls, width in ((1, w1), (2, w2), (3, 64)):
        mask = codes == cls
        cnt = int(np.count_nonzero(mask))
        if cnt:
            vals = np.frombuffer(
                blob, dtype=f"<i{width // 8}", count=cnt, offset=off
            )
            dod[mask] = vals
            off += cnt * (width // 8)

    d = np.empty(n - 1, dtype=np.int64)
    d[0] = d0
    d[1:] = d0 + np.cumsum(dod)
    t = np.empty(n, dtype=np.int64)
    t[0] = t0
    t[1:] = t0 + np.cumsum(d)
    return t
