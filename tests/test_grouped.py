"""Differential tests for grouped compression with dynamic split/join.

tests/golden_grouped/*.segments.csv are produced by RUNNING the reference
Java engine (tools/goldengen/GroupHarness.java) over multi-series groups,
including scenarios that force dynamic splits, rejoins, and per-member
gaps — so a pass here bit-matches the fork's namesake machinery
(SegmentGenerator.java:296-575)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.models.grouped import compress_group

GOLDEN = Path(__file__).parent / "golden_grouped"
SI = 100
CFG = EngineConfig(error_bound=10.0, length_bound=50, sampling_interval_ms=SI)


def _load_case(name: str):
    series = {}
    for f in sorted(GOLDEN.glob(f"{name}.ts*.csv")):
        tid = int(f.stem.split(".ts")[1])
        t, v = [], []
        for line in f.read_text().splitlines():
            a, b = line.split(",")
            t.append(int(a))
            v.append(np.float32(b))
        series[tid] = (np.array(t, dtype=np.int64), np.array(v, dtype=np.float32))
    tids = sorted(series)
    all_ts = np.unique(np.concatenate([series[tid][0] for tid in tids]))
    V = np.full((len(all_ts), len(tids)), np.nan, dtype=np.float32)
    for j, tid in enumerate(tids):
        t, v = series[tid]
        V[np.searchsorted(all_ts, t), j] = v
    expected = []
    for line in (GOLDEN / f"{name}.segments.csv").read_text().splitlines():
        st, et, mtid, cnt, hx, gaps = line.split(",")
        gtuple = tuple(int(g) for g in gaps.split(";")) if gaps else ()
        expected.append((int(st), int(et), int(mtid), int(cnt), hx, gtuple))
    return all_ts, V, expected


CASES = sorted(p.stem.split(".")[0] for p in GOLDEN.glob("*.segments.csv"))


@pytest.mark.parametrize("name", CASES)
def test_grouped_segments_bit_match_java(name):
    ts, V, expected = _load_case(name)
    segs = compress_group(ts, V, CFG, split_fraction=10.0)
    got = [
        (s.start_ts, s.end_ts, s.mtid, s.cnt, s.model.hex(), s.gaps)
        for s in segs
    ]
    assert got == expected
