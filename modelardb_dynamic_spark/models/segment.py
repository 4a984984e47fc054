"""Decompress-side segment semantics: grid (reconstruction), START/END
restriction arithmetic, and closed-form per-bucket aggregates for rollups.

Behavioral contract:
- grid(): point i has ts = start + i*SI, value per model type
  (core/models/Segment.java:110-121); one series per group so offsets
  degenerate and indices address the decoded value vector directly.
- START(newStart) rounds UP to the timestamp grid; END(newEnd) rounds DOWN
  (core/models/Segment.java:56-78). length = (end-start)/SI + 1 (:95-98).
- closed forms: PMC min=max=value, sum=length*value
  (PMC_MeanModelType.java:137-150); Swing endpoint min/max by slope sign,
  sum=(f(start)+f(end))/2*length with double endpoints
  (SwingFilterModelType.java:220-248); Gorilla/Uncompressed iterate decoded
  floats (FacebookGorillaModelType.java:163-197).
"""

from __future__ import annotations

import numpy as np

from modelardb_dynamic_spark.config import (
    MTID_GORILLA,
    MTID_PMC_MEAN,
    MTID_SWING,
    MTID_UNCOMPRESSED,
)
from modelardb_dynamic_spark.models.gorilla import gorilla_decode
from modelardb_dynamic_spark.models.kernels import swing_decode


def seg_length(start_ts: int, end_ts: int, si_ms: int) -> int:
    return int((end_ts - start_ts) // si_ms) + 1


def restrict_start(start_ts: int, end_ts: int, si_ms: int, new_start: int) -> int:
    """START(#, newStart) per the reference formula (Segment.java:56-67).

    NOTE: despite the Java comment saying "rounded up", the formula
    `newStart + (SI - diff) - SI` simplifies to `newStart - diff`, i.e. an
    off-grid newStart rounds DOWN to the previous grid point. We pin the
    formula, not the comment."""
    if new_start <= start_ts or end_ts < new_start:
        return start_ts
    diff = (new_start - start_ts) % si_ms
    return new_start + (si_ms - diff) - si_ms


def restrict_end(start_ts: int, end_ts: int, si_ms: int, new_end: int) -> int:
    """END(#, newEnd) per the reference formula (Segment.java:69-78).

    Symmetric quirk to START: an off-grid newEnd rounds UP to the next grid
    point (`newEnd + (SI - diff2)` where diff2 = (end-newEnd) % SI)."""
    if new_end < start_ts or end_ts <= new_end:
        return end_ts
    diff = (end_ts - new_end) % si_ms
    return new_end - (si_ms - diff) + si_ms


def decode_values(
    mtid: int, model: bytes, start_ts: int, end_ts: int, si_ms: int
) -> np.ndarray:
    """Full float32 value vector of a segment (one value per grid point)."""
    n = seg_length(start_ts, end_ts, si_ms)
    if mtid == MTID_PMC_MEAN:
        value = np.frombuffer(model, dtype=">f4")[0]
        return np.full(n, value, dtype=np.float32)
    if mtid == MTID_SWING:
        a, b = swing_decode(model)
        ts = start_ts + si_ms * np.arange(n, dtype=np.int64)
        return (a * ts.astype(np.float64) + b).astype(np.float32)
    if mtid == MTID_GORILLA:
        return gorilla_decode(model, n)
    if mtid == MTID_UNCOMPRESSED:
        return np.frombuffer(model, dtype=">f4").astype(np.float32)[:n]
    raise ValueError(f"unknown mtid {mtid}")


def grid(
    mtid: int, model: bytes, start_ts: int, end_ts: int, si_ms: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reconstruct (timestamps int64 ms, values float32) for a segment."""
    n = seg_length(start_ts, end_ts, si_ms)
    ts = start_ts + si_ms * np.arange(n, dtype=np.int64)
    return ts, decode_values(mtid, model, start_ts, end_ts, si_ms)


def subrange_aggregate(
    mtid: int,
    model: bytes,
    start_ts: int,
    end_ts: int,
    si_ms: int,
    lo_ts: int,
    hi_ts: int,
) -> tuple[int, float, float, float]:
    """Closed-form (cnt, vmin, vmax, vsum) over the grid points of
    [lo_ts, hi_ts] ∩ [start_ts, end_ts].

    Containment semantics (the two-phase prune-then-exact shape of
    ViewDataPoint.scala:47-73): first grid point >= lo_ts, last <= hi_ts —
    NOT the START/END UDF rounding quirk. PMC and Swing aggregate
    analytically (no decode), Gorilla/Uncompressed decode once and slice.
    Returns cnt == 0 with NaN aggregates when the ranges are disjoint.
    """
    lo = max(lo_ts, start_ts)
    hi = min(hi_ts, end_ts)
    if hi < lo:
        return 0, float("nan"), float("nan"), float("nan")
    lo = start_ts + -((start_ts - lo) // si_ms) * si_ms  # ceil to grid
    hi = start_ts + ((hi - start_ts) // si_ms) * si_ms  # floor to grid
    if hi < lo:
        return 0, float("nan"), float("nan"), float("nan")
    cnt = seg_length(lo, hi, si_ms)
    if mtid == MTID_PMC_MEAN:
        value = float(np.frombuffer(model, dtype=">f4")[0])
        vmin = vmax = float(np.float32(value))
        vsum = float(np.float32(cnt) * np.float32(value))
        return cnt, vmin, vmax, vsum
    if mtid == MTID_SWING:
        a, b = swing_decode(model)
        first = a * lo + b
        last = a * hi + b
        vsum = (first + last) / 2.0 * cnt
        f_lo = float(np.float32(first))
        f_hi = float(np.float32(last))
        if a == 0:
            vmin = vmax = float(np.float32(b))
        elif a > 0:
            vmin, vmax = f_lo, f_hi
        else:
            vmin, vmax = f_hi, f_lo
        return cnt, vmin, vmax, vsum
    values = decode_values(mtid, model, start_ts, end_ts, si_ms)
    i0 = (lo - start_ts) // si_ms
    w = values[i0 : i0 + cnt]
    vsum = float(np.cumsum(w.astype(np.float64))[-1]) if len(w) else 0.0
    return cnt, float(w.min()), float(w.max()), vsum
