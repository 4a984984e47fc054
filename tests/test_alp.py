"""ALP-style float value codec: bit-exact roundtrip (incl. NaN payloads,
-0.0, infinities), exponent/width selection, RAW fallback accounting, and
the Spark raw-tier points archive (DoD timestamps + ALP values)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from modelardb_dynamic_spark.models.alp import (
    _HDR,
    decode_values,
    encode_values,
)


def _rt(v):
    v = np.ascontiguousarray(v, dtype="<f8")
    out = decode_values(encode_values(v))
    # BIT equality: float == would pass -0.0 vs 0.0 and fail NaN vs NaN
    assert out.view("<u8").tobytes() == v.view("<u8").tobytes()
    return out


def test_edge_sizes():
    for v in ([], [3.14], [1.0, 2.0], [np.nan], [-0.0, 0.0]):
        _rt(np.array(v, dtype="<f8"))
    assert encode_values(np.array([], dtype="<f8")) == b""


def test_specials_roundtrip_bitexact():
    v = np.array(
        [np.nan, np.inf, -np.inf, -0.0, 0.0, 1e308, -1e308, 5e-324,
         np.float64.fromhex("0x1.fffffffffffffp+1023"), 0.0],
        dtype="<f8",
    )
    # a NaN with a non-default payload must survive byte-for-byte
    v[-1] = np.uint64(0x7FF8DEADBEEF0001).view(np.float64)
    _rt(v)


def test_decimal_data_compresses_and_int_data_more():
    rng = np.random.default_rng(3)
    dec2 = np.round(rng.uniform(-100, 100, 40_000), 2)  # range 20k -> u2
    blob = encode_values(dec2)
    _rt(dec2)
    # a handful of rounded values aren't exactly k/100 in IEEE —
    # they ride as exceptions (16 B each), the rest pack at 2 B
    assert len(blob) <= 2 * len(dec2) + _HDR.size + 16 * 64
    ints = rng.integers(0, 200, 40_000).astype("<f8")  # range 200 -> u1
    blob_i = encode_values(ints)
    _rt(ints)
    assert len(blob_i) <= 1 * len(ints) + _HDR.size + 16 * 64


def test_noise_falls_back_to_raw_storage():
    rng = np.random.default_rng(5)
    v = rng.standard_normal(10_000)
    blob = encode_values(v)
    _rt(v)
    # never pays more than raw + header
    assert len(blob) == 8 * len(v) + _HDR.size


def test_mixed_exceptions_stay_cheap():
    rng = np.random.default_rng(9)
    v = np.round(rng.uniform(0, 50, 20_000), 1)
    idx = rng.choice(len(v), 500, replace=False)
    v[idx] = rng.standard_normal(500)  # 2.5% unscalable exceptions
    blob = encode_values(v)
    _rt(v)
    # u1 plane + 16 B per exception, well under raw
    assert len(blob) < 0.5 * 8 * len(v)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            st.decimals(
                min_value=-10**9, max_value=10**9, places=3
            ).map(float),
            st.integers(min_value=-(10**12), max_value=10**12).map(float),
        ),
        min_size=0,
        max_size=300,
    )
)
def test_fuzz_roundtrip_bitexact(xs):
    _rt(np.array(xs, dtype="<f8"))


@pytest.fixture(scope="module")
def spark():
    from modelardb_dynamic_spark.session import build_session

    return build_session("test-alp", master="local[4]")


def test_points_archive_roundtrip_multiset(spark):
    """compress_points -> restore_points returns the exact (key, ts,
    value) multiset, including duplicate timestamps and NaN values."""
    from modelardb_dynamic_spark.operators.rawtier import (
        compress_points,
        restore_points,
    )

    rows = [
        ("a", 1000, 1.25),
        ("a", 1000, -0.5),   # duplicate ts, distinct values
        ("a", 2500, float("nan")),
        ("a", 4000, 3.0),
        ("b", 10, 0.1),
        ("b", 20, 0.2),
        ("b", 30, 1e308),
    ]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    blobs = compress_points(df, "k", "ts", "value")
    got = blobs.collect()
    assert {r["k"]: r["n_pts"] for r in got} == {"a": 4, "b": 3}
    out = restore_points(blobs, "k", "ts", "value").collect()

    def norm(t):
        import math

        return (t[0], t[1], "NaN" if math.isnan(t[2]) else t[2])

    got_set = sorted(norm((r["k"], r["ts"], r["value"])) for r in out)
    want_set = sorted(norm(t) for t in rows)
    assert got_set == want_set


def test_points_archive_smaller_than_raw(spark):
    """On a decimal-valued, near-regular series the blob pair is far
    smaller than 16 B/point."""
    from modelardb_dynamic_spark.operators.rawtier import compress_points

    rng = np.random.default_rng(7)
    n = 20_000
    ts = (np.cumsum(rng.integers(900, 1100, n)) * 1000).astype(np.int64)
    vals = np.round(rng.uniform(0, 100, n), 1)
    rows = [("k", int(t), float(v)) for t, v in zip(ts, vals)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    r = compress_points(df, "k", "ts", "value").collect()[0]
    bytes_per_point = (len(r["ts_blob"]) + len(r["val_blob"])) / n
    assert bytes_per_point < 7.0  # u2 values + i32 dods vs 16 B/point raw
