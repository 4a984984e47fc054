"""C cascade kernel vs the numpy reference implementation: byte-identical
segment streams on adversarial corpora (the numpy path itself is pinned to
the Java engine core/SegmentGenerator.java by tests/golden/*, which run
against whatever backend is loaded — see test_models.py).

Comparison is bitwise: model bytes plus struct-packed summary doubles, so
NaN summaries (possible with NaN inputs) compare by bit pattern, not by
IEEE equality.
"""

from __future__ import annotations

import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.models import ckernel
from modelardb_dynamic_spark.models.kernels import (
    _compress_core_py,
    compress_run,
    compress_run_stable,
    compress_series,
    split_runs,
)

from kernel_bench import gen_mixed, gen_noise, gen_ramp, gen_smooth

SI = 60_000

pytestmark = pytest.mark.skipif(
    ckernel.load() is None, reason="no C compiler in this environment"
)


def _key(s):
    return (
        s.start_ts, s.end_ts, s.mtid, s.model, s.cnt,
        struct.pack(">ddd", s.vmin, s.vmax, s.vsum),
    )


def _py_series(t, v, cfg):
    out = []
    for a, b in split_runs(t, cfg.sampling_interval_ms):
        out.extend(_compress_core_py(t[a:b], v[a:b], cfg, True)[0])
    return out


@pytest.mark.parametrize("gen", [gen_mixed, gen_noise, gen_smooth, gen_ramp])
@pytest.mark.parametrize("eb", [0.0, 1.0, 10.0])
def test_c_series_matches_python_with_gaps(gen, eb):
    rng = np.random.default_rng(11)
    v = gen(20_000)
    t = np.arange(len(v), dtype=np.int64) * SI
    keep = rng.random(len(v)) > 0.001  # sprinkle gaps
    t, v = t[keep], v[keep]
    for lb in (50, 256):
        cfg = EngineConfig(
            error_bound=eb, sampling_interval_ms=SI, length_bound=lb
        )
        cs = compress_series(t, v, cfg)
        ps = _py_series(t, v, cfg)
        assert [_key(s) for s in cs] == [_key(s) for s in ps]


@pytest.mark.parametrize("eb", [0.0, 10.0])
def test_c_run_and_stable_match_python_with_nans(eb):
    rng = np.random.default_rng(3)
    for trial in range(12):
        n = int(rng.integers(1, 4000))
        v = gen_mixed(n, seed=trial)
        if trial % 3 == 0:
            v[rng.integers(0, n, size=max(1, n // 100))] = np.nan
        t = np.arange(n, dtype=np.int64) * SI
        cfg = EngineConfig(error_bound=eb, sampling_interval_ms=SI)
        c = compress_run(t, v, cfg)
        p = _compress_core_py(t, v, cfg, True)[0]
        assert [_key(s) for s in c] == [_key(s) for s in p], trial
        cseg, ccon = compress_run_stable(t, v, cfg)
        pseg, pcon = _compress_core_py(t, v, cfg, False)
        assert ccon == pcon, trial
        assert [_key(s) for s in cseg] == [_key(s) for s in pseg], trial


def test_c_kernel_handles_tiny_inputs():
    cfg = EngineConfig(error_bound=10.0, sampling_interval_ms=SI)
    assert compress_series(
        np.array([], dtype=np.int64), np.array([], dtype=np.float32), cfg
    ) == []
    one = compress_run(
        np.array([0], dtype=np.int64), np.array([5.0], dtype=np.float32), cfg
    )
    py = _compress_core_py(
        np.array([0], dtype=np.int64), np.array([5.0], dtype=np.float32),
        cfg, True,
    )[0]
    assert [_key(s) for s in one] == [_key(s) for s in py]
