"""ALP-style lossless float codec for raw-tier VALUES (the value half of
the irregular raw tier; models/dod.py is the timestamp half).

Real-world double columns — token rates, prices, sensor readings — are
overwhelmingly decimals: d == round(d * 10^e) / 10^e for some small e.
ALP (Afroozeh & Boncz, "ALP: Adaptive Lossless floating-Point
compression", SIGMOD 2024 — public paper) exploits this by storing the
scaled INTEGERS, which then compress with frame-of-reference +
bit-packing; values that don't round-trip are stored raw as exceptions.
Gorilla XOR (models/gorilla.py) is bit-serial by construction; ALP's
whole point is vectorizability, which is exactly what the repo's Arrow-
batched operators need — so, like the DoD codec, the layout here is
planar and byte-aligned: encode AND decode are pure numpy (no per-
element Python, no bitstream cursor).

Layout (original; same design language as models/dod.py):

    header : magic 'A1' | mode u8 (0=ALP, 1=RAW) | e u8 | w u8
             | n i64 | n_exc i64 | base i64
    ALP    : plane — n unsigned ints of w bytes, (c - base), stream
             order, 0 at exception slots
             exceptions — n_exc positions i64, then n_exc raw f8 bits
    RAW    : n raw f8 (fallback when scaling loses to plain storage —
             e.g. white-noise doubles; chosen by exact size accounting)

Per blob, the exponent e in 0..14 and width w in {1,2,4,8} are chosen by
EXACT cost accounting (n*w + 16*n_exc vs 8*n), so decimal corpora get
1-2 B/value (4-8x vs raw) and incompressible corpora pay only the
header. Bit-exact round trip for every IEEE double: NaN (payload
preserved), +-inf, -0.0 and values too large to scale all travel as
exceptions or RAW; the round-trip check compares raw u64 BITS, never ==
(which would conflate -0.0 with 0.0 and drop NaNs).

No counterpart in /root/reference — the reference's value models
(PMC-Mean/Swing/Gorilla, core/models/*.java) target gridded series; this
codec is an addition for the raw tier, like DoD.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"A1"
_HDR = struct.Struct("<2sBBBqqq")  # magic, mode, e, w, n, n_exc, base
_MODE_ALP = 0
_MODE_RAW = 1
_MAX_E = 14
_SAFE = float(1 << 53)  # |c| <= 2^53: int64 <-> float64 casts are exact


_SAMPLE = 2048


def _trial(v: np.ndarray, bits: np.ndarray, e: int):
    """One exponent pass: (n_exc, base, width, good_mask, ci). Whole-
    vector ops only (rint, where, one division, one bit compare) — no
    boolean fancy indexing in the hot path; NaN/inf need no special
    case because they fail the |c| <= 2^53 comparison (NaN compares
    false) and travel as exceptions."""
    scale = 10.0**e
    with np.errstate(invalid="ignore", over="ignore"):
        c = np.rint(v * scale)
        ok = np.abs(c) <= _SAFE
        ci = np.where(ok, c, 0.0).astype("<i8")
        rt = ci.astype("<f8") if e == 0 else ci.astype("<f8") / scale
    good = ok & (rt.view("<u8") == bits)
    n_exc = len(v) - int(np.count_nonzero(good))
    if n_exc < len(v):
        gi = ci[good] if n_exc else ci
        base = int(gi.min())
        rng = int(gi.max()) - base
        w = 1 if rng < (1 << 8) else 2 if rng < (1 << 16) else 4 if rng < (1 << 32) else 8
    else:
        base, w = 0, 1
    return n_exc, base, w, good, ci


def encode_values(v: np.ndarray) -> bytes:
    """Encode a float64 array. Empty input -> b''.

    Exponent selection is ALP's two-level scheme: the 15 candidate
    exponents are costed on a DETERMINISTIC stride sample (<= 2048
    values), then ONE full pass runs the winner — 15n work becomes
    15*2048 + n, and the blob is byte-identical across reruns and
    partitionings (no randomness). The full pass re-derives exceptions
    and widths exactly, so a sample mispick can only cost bytes, never
    correctness; the RAW-fallback decision uses the exact full-pass
    cost. Early exit: the first exponent with zero sample exceptions
    wins outright (larger e only scales c by 10, widening the range)."""
    v = np.ascontiguousarray(v, dtype="<f8")
    n = len(v)
    if n == 0:
        return b""
    bits = v.view("<u8")

    if n > _SAMPLE:
        stride = n // _SAMPLE
        sv = np.ascontiguousarray(v[:: stride][:_SAMPLE])
        sbits = sv.view("<u8")
    else:
        sv, sbits = v, bits
    sn = len(sv)
    best_e, best_cost = 0, None
    for e in range(_MAX_E + 1):
        n_exc, _, w, _, _ = _trial(sv, sbits, e)
        cost = sn * w + 16 * n_exc
        if best_cost is None or cost < best_cost:
            best_e, best_cost = e, cost
        if n_exc == 0:
            break  # larger e never beats an already-exact exponent

    e = best_e
    n_exc, base, w, good, ci = _trial(v, bits, e)
    cost = n * w + 16 * n_exc
    if cost >= 8 * n:
        return _HDR.pack(_MAGIC, _MODE_RAW, 0, 8, n, 0, 0) + v.tobytes()

    plane = np.where(good, ci - base, 0).astype(f"<u{w}")
    exc_pos = np.flatnonzero(~good).astype("<i8")
    parts = [
        _HDR.pack(_MAGIC, _MODE_ALP, e, w, n, len(exc_pos), base),
        plane.tobytes(),
        exc_pos.tobytes(),
        v[~good].tobytes(),
    ]
    return b"".join(parts)


def decode_values(blob: bytes) -> np.ndarray:
    """Inverse of encode_values: blob -> float64 array, bit-exact."""
    if len(blob) == 0:
        return np.empty(0, dtype="<f8")
    magic, mode, e, w, n, n_exc, base = _HDR.unpack_from(blob, 0)
    if magic != _MAGIC:
        raise ValueError("not an A1 ALP blob")
    off = _HDR.size
    if mode == _MODE_RAW:
        return np.frombuffer(blob, dtype="<f8", count=n, offset=off).copy()
    plane = np.frombuffer(blob, dtype=f"<u{w}", count=n, offset=off)
    off += n * w
    c = plane.astype("<i8") + base
    if e == 0:
        out = c.astype("<f8")
    else:
        out = c.astype("<f8") / (10.0**e)
    if n_exc:
        pos = np.frombuffer(blob, dtype="<i8", count=n_exc, offset=off)
        off += 8 * n_exc
        vals = np.frombuffer(blob, dtype="<f8", count=n_exc, offset=off)
        out[pos] = vals
    return out
