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


def test_c_gorilla_decode_matches_python():
    """C decoder vs the Python specification, bit-for-bit, on streams with
    zero-XOR runs, window reuse, window resets, sig==32 wrap, NaN/inf."""
    from modelardb_dynamic_spark.models.gorilla import (
        _gorilla_decode_py,
        gorilla_decode,
        gorilla_decode_batch,
        gorilla_encode,
    )

    rng = np.random.default_rng(42)
    corpora = [
        np.array([1.5], dtype=np.float32),
        np.array([1.5, 1.5, 1.5, 1.5], dtype=np.float32),
        np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-38], dtype=np.float32),
        rng.normal(0, 10, 500).astype(np.float32),
        np.repeat(rng.normal(0, 1, 50), 10).astype(np.float32),
        (rng.integers(0, 5, 300) * 0.25).astype(np.float32),
    ]
    blobs, counts = [], []
    for v in corpora:
        blob, _ = gorilla_encode(v)
        got_c = gorilla_decode(blob, len(v))
        got_py = _gorilla_decode_py(blob, len(v))
        np.testing.assert_array_equal(
            got_c.view(np.uint32), got_py.view(np.uint32)
        )
        np.testing.assert_array_equal(got_c.view(np.uint32), v.view(np.uint32))
        blobs.append(blob)
        counts.append(len(v))
    counts = np.array(counts, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    out = np.empty(int(counts.sum()), dtype=np.float32)
    gorilla_decode_batch(blobs, counts, out, offs)
    expect = np.concatenate(corpora)
    np.testing.assert_array_equal(out.view(np.uint32), expect.view(np.uint32))
