"""Model-kernel unit tests.

Mirrors the reference's test pyramid (SURVEY.md §5): percentage-error edge
cases (PercentageErrorTest.scala:20-66), model-type vectors
(AbstractModelTypeTest.scala, PMC_MeanModelTypeTest2.scala), Gorilla
bit-exactness, round-trip invariants (IngestionTest.scala:35-49), and golden
segment streams (tests/golden/*.csv) produced by COMPILING AND RUNNING the
reference's own Java classes (SegmentGenerator, PMC_Mean/SwingFilter/
FacebookGorilla/Uncompressed model types) via tools/goldengen/
GoldenHarness.java — expected rows are (start, end, mtid, length,
model-bytes) exactly as the JVM emitted them, so a pass here is a true
differential bit-match against the reference implementation.
"""

from __future__ import annotations

import math
import struct
from pathlib import Path

import numpy as np
import pytest

from modelardb_dynamic_spark.config import (
    EngineConfig,
    MTID_GORILLA,
    MTID_PMC_MEAN,
    MTID_SWING,
)
from modelardb_dynamic_spark.models.error import percentage_error
from modelardb_dynamic_spark.models.gorilla import (
    gorilla_decode,
    gorilla_encode,
    gorilla_size_bytes,
)
from modelardb_dynamic_spark.models.kernels import (
    compress_series,
    pmc_prefix,
    swing_prefix,
    split_runs,
)
from modelardb_dynamic_spark.models.segment import (
    grid,
    restrict_end,
    restrict_start,
    seg_length,
    subrange_aggregate,
)

GOLDEN = Path(__file__).parent / "golden"


# --- percentage error edge cases (PercentageErrorTest.scala:20-66) ---------


@pytest.mark.parametrize(
    "approx,real,expected",
    [
        (0.0, 0.0, 0.0),
        (7.5, 7.5, 0.0),
        (-7.5, -7.5, 0.0),
        (1.0, 0.0, math.inf),
        (-1.0, 0.0, math.inf),
        (0.0, 1.0, 100.0),
        (0.0, -1.0, 100.0),
        (2.0, 4.0, 50.0),
        (-102.0, -100.0, 2.0),
    ],
)
def test_percentage_error(approx, real, expected):
    assert percentage_error(approx, real) == expected


# --- model vectors ----------------------------------------------------------


def test_constant_five_pmc():
    """v=25 at ts=100..500 step 100: PMC accepts 5, model == float32(25)
    (AbstractModelTypeTest.scala:38-63)."""
    v = np.full(5, 25.0, dtype=np.float32)
    t = np.arange(100, 600, 100, dtype=np.int64)
    p, mean = pmc_prefix(v, 10.0)
    assert p == 5 and mean == 25.0
    cfg = EngineConfig(error_bound=10.0, sampling_interval_ms=100)
    (seg,) = compress_series(t, v, cfg)
    assert seg.mtid == MTID_PMC_MEAN
    assert seg.model == struct.pack(">f", 25.0)
    assert (seg.cnt, seg.vmin, seg.vmax, seg.vsum) == (5, 25.0, 25.0, 125.0)


def test_pmc_single_bucket_of_three():
    """PMC initialized with 13, 12, 14 at errorBound 10 accepts all three
    (PMC_MeanModelTypeTest2.scala:26-35 tests one 3-point slice; with one
    series per group the same values arrive as three points)."""
    v = np.array([13.0, 12.0, 14.0], dtype=np.float32)
    p, mean = pmc_prefix(v, 10.0)
    assert p == 3
    assert mean == np.float32((13.0 + 12.0 + 14.0) / 3)


def test_swing_exact_ramp():
    v = (np.arange(100, dtype=np.float32) * 2) + 5
    t = np.arange(100, dtype=np.int64) * 100
    s, bounds = swing_prefix(t, v, 0.0)
    assert s == 100
    cfg = EngineConfig(error_bound=0.0, sampling_interval_ms=100)
    (seg,) = compress_series(t, v, cfg)
    assert seg.mtid == MTID_SWING
    _, rec = grid(seg.mtid, seg.model, seg.start_ts, seg.end_ts, 100)
    assert np.array_equal(rec, v)


def test_gorilla_simple_vector_bit_layout():
    """Values from the reference's testdata_java_simple.csv; stream bytes
    pinned by the Java reference encoder (FacebookGorillaModelType.java:
    105-140 + BitBuffer MSB-first packing)."""
    vals = np.array([115, 765, 462, 105, 362], dtype=np.float32)
    model, size = gorilla_encode(vals)
    assert model.hex() == "42e60000ca6ed96fb0c4d48b38"
    assert size == 13
    assert gorilla_size_bytes(vals) == 13
    assert np.array_equal(gorilla_decode(model, 5), vals)


def test_gorilla_repeat_is_one_bit():
    """Exact repeats cost one '0' bit (FacebookGorillaModelType.java:109-110)."""
    vals = np.full(33, 1.5, dtype=np.float32)
    model, size = gorilla_encode(vals)
    # 32 bits raw + 32 zero bits = 8 bytes
    assert size == 8
    assert np.array_equal(gorilla_decode(model, 33), vals)


def test_gorilla_random_roundtrip():
    rng = np.random.default_rng(7)
    vals = rng.standard_normal(50).astype(np.float32)
    model, _ = gorilla_encode(vals)
    assert np.array_equal(gorilla_decode(model, 50), vals)


# --- golden differential vs the reference Java engine ----------------------


def _load_golden(name: str, eb: int):
    t, v = [], []
    for line in (GOLDEN / f"{name}.input.csv").read_text().splitlines():
        ts, val = line.split(",")
        t.append(int(ts))
        v.append(float(val))
    exp = []
    seg_file = GOLDEN / f"{name}.eb{eb}.segments.csv"
    for line in seg_file.read_text().splitlines():
        st, et, mtid, ln, hx = line.split(",")
        exp.append((int(st), int(et), int(mtid), int(ln), hx))
    return (
        np.array(t, dtype=np.int64),
        np.array(v, dtype=np.float32),
        exp,
    )


GOLDEN_CASES = sorted(p.stem.split(".")[0] for p in GOLDEN.glob("*.input.csv"))


@pytest.mark.parametrize("eb", [0, 10])
@pytest.mark.parametrize("name", GOLDEN_CASES)
def test_golden_segments_bit_match(name, eb):
    t, v, expected = _load_golden(name, eb)
    cfg = EngineConfig(error_bound=float(eb), length_bound=50, sampling_interval_ms=100)
    got = [
        (s.start_ts, s.end_ts, s.mtid, s.cnt, s.model.hex())
        for s in compress_series(t, v, cfg)
    ]
    assert got == expected


# --- round-trip invariants (IngestionTest.scala:35-49) ----------------------


def _roundtrip(t, v, eb):
    cfg = EngineConfig(error_bound=eb, sampling_interval_ms=100)
    segs = compress_series(t, v, cfg)
    ts = np.concatenate(
        [grid(s.mtid, s.model, s.start_ts, s.end_ts, 100)[0] for s in segs]
    )
    rec = np.concatenate(
        [grid(s.mtid, s.model, s.start_ts, s.end_ts, 100)[1] for s in segs]
    )
    return ts, rec, segs


@pytest.mark.parametrize("name", GOLDEN_CASES)
def test_roundtrip_error_zero_exact(name):
    t, v, _ = _load_golden(name, 0)
    ts, rec, _ = _roundtrip(t, v, 0.0)
    assert np.array_equal(ts, t)
    assert np.array_equal(rec, v)


@pytest.mark.parametrize("name", GOLDEN_CASES)
def test_roundtrip_error_ten_bounded(name):
    t, v, _ = _load_golden(name, 0)
    ts, rec, _ = _roundtrip(t, v, 10.0)
    assert np.array_equal(ts, t)
    errs = [percentage_error(a, r) for a, r in zip(rec.tolist(), v.tolist())]
    assert max(errs) <= 10.0


# --- segment restriction & closed-form aggregates ---------------------------


def test_restrict_start_java_formula():
    # grid 1000, 1100, ..., 2000 (SI=100); the Java formula rounds an
    # off-grid newStart DOWN (Segment.java:62-66 simplifies to newStart-diff)
    assert restrict_start(1000, 2000, 100, 1150) == 1100
    assert restrict_start(1000, 2000, 100, 1200) == 1200
    assert restrict_start(1000, 2000, 100, 900) == 1000
    assert restrict_start(1000, 2000, 100, 2100) == 1000  # past end: unchanged


def test_restrict_end_java_formula():
    # symmetric quirk: off-grid newEnd rounds UP (Segment.java:75-77)
    assert restrict_end(1000, 2000, 100, 1850) == 1900
    assert restrict_end(1000, 2000, 100, 1800) == 1800
    assert restrict_end(1000, 2000, 100, 2100) == 2000
    assert restrict_end(1000, 2000, 100, 900) == 2000  # before start: unchanged


def test_seg_length():
    assert seg_length(1000, 2000, 100) == 11


@pytest.mark.parametrize(
    "series",
    ["noise", "smooth"],
)
def test_subrange_aggregate_matches_grid(series):
    rng = np.random.default_rng(3)
    if series == "noise":
        v = rng.normal(10, 3, 120).astype(np.float32)
    else:  # long PMC/Swing segments to exercise the closed forms
        v = np.concatenate(
            [np.full(60, 5.0), np.arange(60) * 1.5 + 5]
        ).astype(np.float32)
    t = np.arange(120, dtype=np.int64) * 100
    cfg = EngineConfig(error_bound=10.0, sampling_interval_ms=100)
    for seg in compress_series(t, v, cfg):
        ts, vals = grid(seg.mtid, seg.model, seg.start_ts, seg.end_ts, 100)
        lo, hi = seg.start_ts + 250, seg.end_ts - 250
        cnt, vmin, vmax, vsum = subrange_aggregate(
            seg.mtid, seg.model, seg.start_ts, seg.end_ts, 100, lo, hi
        )
        mask = (ts >= lo) & (ts <= hi)
        if cnt == 0:
            assert mask.sum() == 0
            continue
        assert cnt == int(mask.sum())
        w = vals[mask]
        assert vmin == pytest.approx(float(w.min()), rel=1e-6)
        assert vmax == pytest.approx(float(w.max()), rel=1e-6)
        assert vsum == pytest.approx(float(w.astype(np.float64).sum()), rel=1e-6)


def test_split_runs_gap_semantics():
    t = np.array([0, 100, 200, 500, 600, 800], dtype=np.int64)
    assert split_runs(t, 100) == [(0, 3), (3, 5), (5, 6)]
