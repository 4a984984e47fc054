"""Series analytics operators (operators/analytics.py): exact pairwise
Pearson correlation and linear-interpolation resampling."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from modelardb_dynamic_spark.operators.analytics import (
    correlated_pairs,
    interpolate_grid,
)


def _points(spark, rows):
    return spark.createDataFrame(rows, "sid string, ts_ms long, v long")


def test_correlated_pairs_matches_numpy(spark):
    rng = np.random.default_rng(7)
    grid = [i * 60_000 for i in range(64)]
    a = rng.integers(1, 40, size=64)
    b = (a * 2 + rng.integers(0, 3, size=64)).astype(np.int64)  # ~r=1
    c = rng.integers(1, 40, size=64)
    rows = (
        [("a", t, int(v)) for t, v in zip(grid, a)]
        + [("b", t, int(v)) for t, v in zip(grid, b)]
        + [("c", t, int(v)) for t, v in zip(grid, c)]
    )
    out = {
        (r.sid1, r.sid2): (r.n, r.r)
        for r in correlated_pairs(
            _points(spark, rows), top_n=3, min_support=10
        ).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (s1, s2), (n, r) in out.items():
        x = {"a": a, "b": b, "c": c}[s1]
        y = {"a": a, "b": b, "c": c}[s2]
        assert n == 64
        assert r == pytest.approx(float(np.corrcoef(x, y)[0, 1]), abs=1e-12)
    assert out[("a", "b")][1] > 0.99


def test_correlated_pairs_top_n_and_support(spark):
    grid = [i * 60_000 for i in range(40)]
    rows = []
    for sid, base in (("hot1", 100), ("hot2", 90), ("cold", 1)):
        rows += [(sid, t, base + (i % 3)) for i, t in enumerate(grid)]
    # short series: above min_support only vs nothing (only 5 buckets)
    rows += [("brief", t, 50) for t in grid[:5]]
    out = correlated_pairs(
        _points(spark, rows), top_n=2, min_support=10
    ).collect()
    # top-2 by activity = hot1, hot2; brief/cold excluded by top_n
    assert [(r.sid1, r.sid2) for r in out] == [("hot1", "hot2")]


def test_correlated_pairs_constant_series_null_r(spark):
    grid = [i * 60_000 for i in range(30)]
    rows = [("k", t, 5) for t in grid] + [
        ("m", t, 1 + (i % 4)) for i, t in enumerate(grid)
    ]
    out = correlated_pairs(
        _points(spark, rows), top_n=2, min_support=30
    ).collect()
    assert len(out) == 1 and out[0].r is None


def test_interpolate_grid_linear_and_exact(spark):
    # observations at 0ms, 60s, 180s with v = 10, 40, 100
    rows = [("s", 0, 10), ("s", 60_000, 40), ("s", 180_000, 100)]
    out = {
        r.ts_ms: r.value
        for r in interpolate_grid(
            _points(spark, rows), grid_ms=30_000
        ).collect()
    }
    # grid: 0, 30k, 60k, 90k, 120k, 150k, 180k
    assert out[0] == 10.0 and out[60_000] == 40.0 and out[180_000] == 100.0
    assert out[30_000] == pytest.approx(25.0)
    assert out[90_000] == pytest.approx(40 + 60 * (30_000 / 120_000))
    assert out[150_000] == pytest.approx(40 + 60 * (90_000 / 120_000))
    assert len(out) == 7


def test_interpolate_grid_span_without_grid_point_is_empty(spark):
    # span [70s, 110s] contains no 120s-aligned point -> no output rows
    rows = [("s", 70_000, 1), ("s", 110_000, 2)]
    assert interpolate_grid(_points(spark, rows), grid_ms=120_000).count() == 0


def test_correlated_pairs_plan_broadcast_no_cartesian(spark):
    """The top-N activity set arrives broadcast; the pair join is a hash
    join on the grid bucket, never a cartesian product."""
    rows = [("a", i * 60_000, i % 5) for i in range(40)] + [
        ("b", i * 60_000, (i + 1) % 5) for i in range(40)
    ]
    df = correlated_pairs(_points(spark, rows), top_n=2, min_support=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_interpolate_grid_multi_sid_independent(spark):
    rows = [("a", 0, 0), ("a", 120_000, 120), ("b", 60_000, 7)]
    out = interpolate_grid(_points(spark, rows), grid_ms=60_000)
    got = {(r.sid, r.ts_ms): r.value for r in out.collect()}
    assert got[("a", 60_000)] == pytest.approx(60.0)
    assert got[("b", 60_000)] == 7.0
    assert math.isfinite(got[("a", 0)]) and got[("a", 0)] == 0.0


# ---------------------------------------------------------------------------
# rolling z-score / counter rate


def test_rolling_zscore_flags_injected_spike(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import rolling_zscore

    rng = np.random.default_rng(21)
    v = rng.integers(95, 106, 200).astype("int64")
    v[150] = 500  # the spike
    pdf = pd.DataFrame(
        {"sid": "s", "ts_ms": np.arange(200, dtype="int64") * 60_000, "v": v}
    )
    out = rolling_zscore(spark.createDataFrame(pdf)).collect()
    flagged = {r["ts_ms"] // 60_000 for r in out if r["is_anomaly"]}
    assert 150 in flagged
    assert len(flagged) <= 3  # noise stays under |z|=3 almost everywhere
    # flag must agree with the z column wherever z is defined
    for r in out:
        if r["z"] is not None:
            assert r["is_anomaly"] == (abs(r["z"]) > 3.0), r


def test_rolling_zscore_matches_pandas(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import rolling_zscore

    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        {
            "sid": "s",
            "ts_ms": np.arange(60, dtype="int64"),
            "v": rng.integers(0, 50, 60).astype("int64"),
        }
    )
    out = {r["ts_ms"]: r["z"] for r in rolling_zscore(
        spark.createDataFrame(pdf), window_buckets=10, min_periods=5
    ).collect()}
    s = pdf.v
    for i in range(60):
        w = s.iloc[max(0, i - 10): i]
        if len(w) < 5 or w.std(ddof=0) == 0:
            assert out[i] is None
        else:
            want = (s.iloc[i] - w.mean()) / w.std(ddof=0)
            assert abs(out[i] - want) < 1e-9


def test_counter_rate_handles_resets(spark):
    from modelardb_dynamic_spark.operators.analytics import counter_rate

    rows = [
        ("s", 0, 10), ("s", 60_000, 25), ("s", 120_000, 5),  # reset at 3rd
        ("s", 180_000, 8), ("s", 3_600_000, 20), ("s", 3_660_000, 30),
    ]
    pdf = pd.DataFrame(rows, columns=["sid", "ts_ms", "v"])
    out = {
        r["bucket_ts"]: (r["increase"], r["rate"])
        for r in counter_rate(
            spark.createDataFrame(pdf), range_ms=3_600_000
        ).collect()
    }
    # bucket 0: (25-10) + 5 (reset) + (8-5) = 23; bucket 1h: (20-8) + 10
    assert out[0] == (23, 23 / 3600.0)
    assert out[3_600_000] == (22, 22 / 3600.0)


def test_ewma_levels_matches_python(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import ewma_levels

    rng = np.random.default_rng(9)
    n = 300
    pdf = pd.DataFrame(
        {
            "sid": "s",
            "ts_ms": np.arange(n, dtype="int64") * 60_000,
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )
    out = {
        r["bucket_ts"]: (r["level"], r["forecast"], r["abs_err"])
        for r in ewma_levels(
            spark.createDataFrame(pdf), bucket_ms=3_600_000, alpha=0.3
        ).collect()
    }
    # python reference: same fold per hour bucket
    prev_level = None
    for b, grp in pdf.groupby(pdf.ts_ms // 3_600_000 * 3_600_000):
        vs = grp.sort_values("ts_ms").v.tolist()
        s = float(vs[0])
        for x in vs[1:]:
            s = 0.3 * float(x) + 0.7 * s
        level, forecast, abs_err = out[b]
        assert level == s  # bit-exact fold
        if prev_level is None:
            assert forecast is None and abs_err is None
        else:
            assert forecast == prev_level
            assert abs(abs_err - abs(sum(vs) / len(vs) - prev_level)) < 1e-12
        prev_level = s


def test_m4_downsample_keeps_exactly_the_extremes(spark):
    from modelardb_dynamic_spark.operators.analytics import m4_downsample

    rng = np.random.default_rng(11)
    n = 240
    pdf = pd.DataFrame(
        {
            "sid": ["a"] * n + ["b"] * n,
            "ts_ms": list(np.arange(n, dtype="int64") * 60_000) * 2,
            "v": rng.integers(0, 1000, 2 * n).astype("int64"),
        }
    )
    bucket = 3_600_000  # 60 points per bucket
    got = m4_downsample(spark.createDataFrame(pdf), bucket_ms=bucket)
    rows = {(r.sid, r.ts_ms) for r in got.collect()}
    # pandas reference: per (sid, bucket) rows achieving the 4 extremes
    want = set()
    pdf["b"] = pdf.ts_ms // bucket * bucket
    for (sid, _), g in pdf.groupby(["sid", "b"]):
        keep = g[
            (g.ts_ms == g.ts_ms.min())
            | (g.ts_ms == g.ts_ms.max())
            | (g.v == g.v.min())
            | (g.v == g.v.max())
        ]
        want |= {(sid, int(t)) for t in keep.ts_ms}
    assert rows == want
    # each bucket is reduced to <= 4 points (ties can only add rows when
    # duplicate extreme VALUES occur, which this check covers via `want`)
    per_bucket = (
        got.groupBy("sid", "bucket_ts").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_bucket <= 8  # 4 extremes, ties bounded by the data


def test_m4_downsample_value_ties_keep_all_rows(spark):
    from modelardb_dynamic_spark.operators.analytics import m4_downsample

    rows = [
        ("s", 0, 5), ("s", 60_000, 1), ("s", 120_000, 9),
        ("s", 180_000, 9), ("s", 240_000, 3),
    ]
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    got = sorted(
        (r.ts_ms, r.v) for r in m4_downsample(df, bucket_ms=600_000).collect()
    )
    # first(0), last(240k), min(60k), and BOTH max ties (120k, 180k)
    assert got == [
        (0, 5), (60_000, 1), (120_000, 9), (180_000, 9), (240_000, 3)
    ]


def test_gap_audit_hand_computed(spark):
    from modelardb_dynamic_spark.operators.analytics import gap_audit

    SI = 60_000
    # sid a: [0..2], gap of 2 buckets, [5..6] -> 5 observed of 7 expected
    # sid b: single contiguous run, no gaps
    segs = spark.createDataFrame(
        [
            ("a", 0 * SI, 2 * SI, SI, 3),
            ("a", 5 * SI, 6 * SI, SI, 2),
            ("b", 10 * SI, 13 * SI, SI, 4),
        ],
        "sid string, start_ts long, end_ts long, si long, cnt long",
    )
    got = {r["sid"]: r.asDict() for r in gap_audit(segs).collect()}
    assert got["a"] == dict(
        sid="a", observed_pts=5, first_ts=0, last_ts=6 * SI,
        expected_pts=7, missing_pts=2, n_gaps=1,
        gap_ms_sum=2 * SI, longest_gap_ms=2 * SI,
    )
    assert got["b"] == dict(
        sid="b", observed_pts=4, first_ts=10 * SI, last_ts=13 * SI,
        expected_pts=4, missing_pts=0, n_gaps=0,
        gap_ms_sum=0, longest_gap_ms=0,
    )
    # adjacent segments (salt boundary shape) are NOT gaps
    adj = spark.createDataFrame(
        [("c", 0, 2 * SI, SI, 3), ("c", 3 * SI, 4 * SI, SI, 2)],
        "sid string, start_ts long, end_ts long, si long, cnt long",
    )
    r = gap_audit(adj).collect()[0]
    assert r["n_gaps"] == 0 and r["missing_pts"] == 0


def test_xcorr_leadlag_finds_injected_shift(spark):
    from modelardb_dynamic_spark.operators.analytics import xcorr_leadlag

    rng = np.random.default_rng(11)
    si = 60_000
    n = 80
    a = rng.integers(1, 50, size=n)
    rows = [("a", i * si, int(v)) for i, v in enumerate(a)]
    # b is a shifted COPY of a: b[t + 2*si] = a[t]  ->  best lag +2, r=1
    rows += [("b", (i + 2) * si, int(v)) for i, v in enumerate(a)]
    # d is anti-correlated with a at lag 0 (r=-1): |r| ranking must pick it
    rows += [("d", i * si, int(100 - v)) for i, v in enumerate(a)]
    out = {
        (r.sid1, r.sid2): r
        for r in xcorr_leadlag(
            _points(spark, rows), si_ms=si, top_n=3, max_lag=3
        ).collect()
    }
    ab = out[("a", "b")]
    assert ab.lag == 2 and ab.n == n and ab.r == pytest.approx(1.0)
    ad = out[("a", "d")]
    assert ad.lag == 0 and ad.r == pytest.approx(-1.0)
    # b vs d: b is a(t-2), d is -a(t) -> best lag -2 (d at t-2 aligns)
    bd = out[("b", "d")]
    assert bd.lag == -2 and bd.r == pytest.approx(-1.0)


def test_xcorr_leadlag_tie_and_support_rules(spark):
    from modelardb_dynamic_spark.operators.analytics import xcorr_leadlag

    si = 60_000
    # constant series: zero variance at every lag -> r NULL -> pair absent
    rows = [("a", i * si, i % 7) for i in range(40)]
    rows += [("k", i * si, 5) for i in range(40)]
    out = xcorr_leadlag(
        _points(spark, rows), si_ms=si, top_n=2, max_lag=2
    ).collect()
    assert out == []
    # a periodic series vs itself shifted: multiple lags tie at |r|=1;
    # the deterministic winner is the SMALLEST lag (lag ASC tiebreak)
    p = [10, 20, 10, 20] * 12
    rows = [("x", i * si, v) for i, v in enumerate(p)]
    rows += [("y", i * si, v) for i, v in enumerate(p)]
    got = xcorr_leadlag(
        _points(spark, rows), si_ms=si, top_n=2, max_lag=2
    ).collect()
    assert len(got) == 1 and got[0].lag == -2


def test_seasonal_envelope_hand_computed(spark):
    from modelardb_dynamic_spark.operators.analytics import (
        seasonal_envelope,
    )

    H, P = 3_600_000, 4
    rows = []
    # phase 1 of a 4-bucket cycle sees values 1..10 across 10 cycles
    for cyc in range(10):
        rows.append(("s", (cyc * P + 1) * H, cyc + 1))
    # phase 3 sees a constant 7, three times
    for cyc in range(3):
        rows.append(("s", (cyc * P + 3) * H, 7))
    out = {
        r.phase: r
        for r in seasonal_envelope(
            _points(spark, rows), H, P
        ).collect()
    }
    p1 = out[1]
    # ceil-rank over 1..10: p10 -> rank 1 -> 1; p50 -> rank 5 -> 5;
    # p90 -> rank 9 -> 9
    assert (p1.n, p1.vmin, p1.p10, p1.p50, p1.p90, p1.vmax) == (
        10, 1, 1, 5, 9, 10,
    )
    assert p1.vsum == 55 and p1.vavg == 5.5
    p3 = out[3]
    assert (p3.p10, p3.p50, p3.p90) == (7, 7, 7)
    assert set(out) == {1, 3}  # unobserved phases are absent, not zero


def test_mad_outliers_hand_computed(spark):
    from modelardb_dynamic_spark.operators.analytics import mad_outliers

    si = 3_600_000
    # vs sorted [9,10,11,12,100]: med=11, devs sorted [0,1,1,2,89] ->
    # MAD=1; only the 100 flags at k=3
    rows = [("a", i * si, v) for i, v in enumerate([10, 9, 11, 12, 100])]
    # constant series: MAD 0 -> never flagged
    rows += [("k", i * si, 7) for i in range(5)]
    # even count: vs=[1,2,8,9] -> med=(2+8)/2=5, devs=[4,3,3,4] -> MAD=3.5
    rows += [("e", i * si, v) for i, v in enumerate([1, 2, 8, 9])]
    out = {
        (r.sid, r.ts_ms): r
        for r in mad_outliers(_points(spark, rows), k=3.0).collect()
    }
    assert len(out) == 14  # every bucket reported
    a_spike = out[("a", 4 * si)]
    assert a_spike.med == 11.0 and a_spike.mad == 1.0
    assert a_spike.dev == 89.0 and a_spike.is_outlier
    assert sum(r.is_outlier for r in out.values()) == 1
    assert all(not out[("k", i * si)].is_outlier for i in range(5))
    e = out[("e", 0)]
    assert e.med == 5.0 and e.mad == 3.5 and not e.is_outlier


def test_theil_sen_matches_python_and_resists_outlier(spark):
    from modelardb_dynamic_spark.operators.analytics import theil_sen

    si = 86_400_000
    # clean line y = 3x + 5 with ONE wild outlier at x=6
    ys = [5, 8, 11, 14, 17, 20, 1000, 26]
    rows = [("a", i * si, y) for i, y in enumerate(ys)]
    # even pair count series: y = [0, 2, 10, 12] -> slopes sorted
    rows += [("e", i * si, y) for i, y in enumerate([0, 2, 10, 12])]
    out = {r.sid: r for r in theil_sen(_points(spark, rows), si).collect()}

    def py_ts(vals):
        sl = sorted(
            (vals[j] - vals[i]) / (j - i)
            for i in range(len(vals))
            for j in range(i + 1, len(vals))
        )
        m = len(sl)
        return (sl[(m + 1) // 2 - 1] + sl[(m + 2) // 2 - 1]) / 2

    a = out["a"]
    assert a.n == 8 and a.m_pairs == 28
    assert a.slope == py_ts(ys)
    assert abs(a.slope - 3.0) < 0.6  # the outlier barely moves the median
    e = out["e"]
    assert e.m_pairs == 6 and e.slope == py_ts([0, 2, 10, 12])


def test_theil_sen_excludes_short_series(spark):
    from modelardb_dynamic_spark.operators.analytics import theil_sen

    si = 86_400_000
    rows = [("s", 0, 1), ("s", si, 5)]  # n=2 -> excluded
    assert theil_sen(_points(spark, rows), si).collect() == []


def test_interval_overlap_join_semantics(spark):
    from modelardb_dynamic_spark.operators.analytics import (
        interval_overlap_join,
    )

    C = 100  # chunk_ms
    left = spark.createDataFrame(
        [
            ("a", 50, 260),   # spans cells 0,1,2
            ("b", 120, 130),  # inside cell 1
            ("c", 300, 301),  # 1ms interval, cell 3
        ],
        "id string, lo long, hi long",
    )
    right = spark.createDataFrame(
        [
            ("x", 0, 1000),   # spans all cells: overlaps everything
            ("y", 240, 320),  # overlaps a (tail) and c
            ("z", 260, 280),  # touches a at hi==lo: NOT an overlap
        ],
        "rid string, lo long, hi long",
    )
    out = {
        (r.id, r.rid): r.overlap_ms
        for r in interval_overlap_join(left, right, chunk_ms=C).collect()
    }
    # multi-cell co-coverage (a x x share cells 0,1,2) emits exactly ONCE
    assert out == {
        ("a", "x"): 210,
        ("a", "y"): 20,
        ("b", "x"): 10,
        ("c", "x"): 1,
        ("c", "y"): 1,
    }


def test_interval_overlap_join_matches_naive(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import (
        interval_overlap_join,
    )

    rng = np.random.default_rng(17)
    mk = lambda n: [
        (int(i), int(lo), int(lo + ln))
        for i, (lo, ln) in enumerate(
            zip(
                rng.integers(0, 5000, size=n),
                rng.integers(1, 700, size=n),
            )
        )
    ]
    L, R = mk(60), mk(60)
    left = spark.createDataFrame(L, "id long, lo long, hi long")
    right = spark.createDataFrame(R, "rid long, lo long, hi long")
    got = {
        (r.id, r.rid): r.overlap_ms
        for r in interval_overlap_join(left, right, chunk_ms=256).collect()
    }
    want = {
        (i, j): min(h1, h2) - max(l1, l2)
        for i, l1, h1 in L
        for j, l2, h2 in R
        if l1 < h2 and l2 < h1
    }
    assert got == want


def test_acf_lags_matches_numpy(spark):
    """acf_lags on a dense grid equals the classic numpy sparse-ACF
    (full-series mean, pairs at observed offsets)."""
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import acf_lags

    SI = 60_000
    rng = np.random.default_rng(7)
    v = rng.integers(0, 20, size=40)
    rows = [("s", i * SI, int(v[i])) for i in range(40)]
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in acf_lags(pts, max_lag=3, si_ms=SI, materialize=False)
        .collect()
    }
    mu = v.mean()
    den = ((v - mu) ** 2).sum()
    for k in (1, 2, 3):
        n_pairs, acf = got[k]
        assert n_pairs == 40 - k
        expect = ((v[:-k] - mu) * (v[k:] - mu)).sum() / den
        assert abs(acf - expect) < 1e-12


def test_acf_lags_gap_and_constant_semantics(spark):
    """Gaps contribute no pairs (sparse convention); constant series are
    excluded by the exact integer predicate rather than dividing by 0."""
    from modelardb_dynamic_spark.operators.analytics import acf_lags

    SI = 60_000
    rows = (
        # sid g: buckets 0,1,3 -> lag1 pairs: (0,1) only; lag2: (1,3)
        [("g", 0, 5), ("g", SI, 7), ("g", 3 * SI, 9)]
        # sid c: constant -> zero variance -> no output rows
        + [("c", i * SI, 4) for i in range(10)]
    )
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = acf_lags(pts, max_lag=2, si_ms=SI, materialize=False).collect()
    got = {(r["sid"], r["lag"]): r["n_pairs"] for r in out}
    assert got == {("g", 1): 1, ("g", 2): 1}


def test_sax_words_hand_computed(spark):
    from modelardb_dynamic_spark.operators.analytics import sax_words

    SI = 60_000
    # one point per "hour" with hourly sums 0..7 over an 8-slot window:
    # lo=0, hi=7, sym = v*8 DIV 8 = v -> word "abcdefgh"
    rows = [("s", i * 8 * SI, i) for i in range(8)]
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = sax_words(
        pts, paa_ms=8 * SI, word_positions=8, alphabet=8
    ).collect()
    assert len(out) == 1
    assert out[0]["word"] == "abcdefgh"
    assert out[0]["word_ts"] == 0

    # constant series: hi==lo -> every symbol 'a'; missing PAA buckets
    # shorten the word rather than injecting fake zeros
    rows2 = [("t", 0, 3), ("t", 8 * SI, 3), ("t", 3 * 8 * SI, 3)]
    pts2 = spark.createDataFrame(rows2, "sid string, ts_ms long, v long")
    out2 = sax_words(
        pts2, paa_ms=8 * SI, word_positions=8, alphabet=8
    ).collect()
    assert out2[0]["word"] == "aaa"


def test_burst_episodes_hand_computed(spark):
    from modelardb_dynamic_spark.operators.analytics import burst_episodes

    SI = 60_000
    rows = [
        # sid a: hot run [0,1,2] (v>=2), cold bucket 3, hot [5,6] but
        # non-adjacent to the first run; single hot bucket at 9
        ("a", 0 * SI, 3), ("a", 1 * SI, 2), ("a", 2 * SI, 5),
        ("a", 3 * SI, 1),
        ("a", 5 * SI, 2), ("a", 6 * SI, 4),
        ("a", 9 * SI, 7),
        # sid b: all cold
        ("b", 0 * SI, 1), ("b", 1 * SI, 1),
    ]
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    got = sorted(
        (r["sid"], r["start_ts"], r["end_ts"], r["n_buckets"],
         r["peak_v"], r["total_v"])
        for r in burst_episodes(
            pts, threshold=2, si_ms=SI, min_len=2
        ).collect()
    )
    assert got == [
        ("a", 0, 2 * SI, 3, 5, 10),
        ("a", 5 * SI, 6 * SI, 2, 4, 6),
    ]
    # min_len=1 also surfaces the singleton at bucket 9
    got1 = burst_episodes(pts, threshold=2, si_ms=SI, min_len=1)
    assert got1.count() == 3


def test_interarrival_stats_hand_computed(spark):
    import math

    from modelardb_dynamic_spark.operators.analytics import (
        interarrival_stats,
    )

    SI = 60_000
    # sid a at grid steps 0,1,3,6 -> gaps (units of SI): 1,2,3
    rows = [("a", 0, 9), ("a", SI, 9), ("a", 3 * SI, 9), ("a", 6 * SI, 9)]
    # sid c: constant gaps -> zero variance -> excluded
    rows += [("c", i * 2 * SI, 1) for i in range(5)]
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = {r["sid"]: r.asDict() for r in
           interarrival_stats(pts, unit_ms=SI).collect()}
    assert "c" not in out
    a = out["a"]
    assert (a["n"], a["gap_sum"], a["gap_sq_sum"]) == (3, 6, 14)
    assert a["mean_units"] == 2.0
    # population sigma = sqrt((14 - 36/3)/3) = sqrt(2/3)
    sigma = math.sqrt(2.0 / 3.0)
    assert abs(a["cv"] - sigma / 2.0) < 1e-12
    assert abs(a["burstiness"] - (sigma - 2) / (sigma + 2)) < 1e-12


def test_time_weighted_avg_hand_computed(spark):
    from modelardb_dynamic_spark.operators.analytics import (
        time_weighted_avg,
    )

    # value 10 held for 100ms (10->10), then ramp 10->20 over 100ms:
    # integral = 10*100 + 15*100 = 2500; elapsed 200 -> twa 12.5
    rows = [("a", 0, 10), ("a", 100, 10), ("a", 200, 20),
            ("b", 0, 5)]  # single point -> excluded
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = {r["sid"]: r.asDict() for r in time_weighted_avg(pts).collect()}
    assert "b" not in out
    a = out["a"]
    assert (a["n_pts"], a["first_ts"], a["last_ts"]) == (3, 0, 200)
    assert a["twice_integral"] == 2 * 2500
    assert a["twa"] == 12.5
    # window restriction drops the ramp pair
    w = time_weighted_avg(pts, lo_ms=0, hi_ms=100).collect()
    got = [r for r in w if r["sid"] == "a"][0]
    assert got["twa"] == 10.0


def test_time_weighted_avg_vs_plain_avg_overweighting(spark):
    """The motivating case: a chatty burst at value 100 for a short span
    then silence at value 0 observed sparsely — plain AVG of samples is
    dominated by the burst's many samples; TWA weights by time."""
    from modelardb_dynamic_spark.operators.analytics import (
        time_weighted_avg,
    )

    rows = [("s", t, 100) for t in range(0, 101, 10)]  # 11 samples, 100ms
    rows += [("s", 10_100, 0)]  # one sample 10s later
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    r = time_weighted_avg(pts).collect()[0]
    plain = (11 * 100 + 0) / 12.0
    # integral: 100*100 (burst) + 50*10000 (ramp to 0) = 510000 over 10100
    assert r["twa"] == 510_000 / 10_100
    assert r["twa"] < plain / 1.5


def test_sliding_agg_gap_semantics(spark):
    """The RANGE frame is TIME-defined: a gap neither contributes nor
    stretches the window (a ROWS frame would silently widen)."""
    from modelardb_dynamic_spark.operators.analytics import sliding_agg

    H = 3_600_000
    # hourly tier rows at hours 0,1,5 (gap of 3); window = 3 buckets
    rows = [
        ("s", 0 * H, 2, 10, 1, 9),
        ("s", 1 * H, 3, 20, 2, 8),
        ("s", 5 * H, 1, 5, 5, 5),
    ]
    tier = spark.createDataFrame(
        rows,
        "sid string, bucket_ts long, cnt long, vsum long, vmin long, "
        "vmax long",
    )
    got = {
        r["bucket_ts"]: (r["w_cnt"], r["w_sum"], r["w_min"], r["w_max"])
        for r in sliding_agg(tier, H, 3).collect()
    }
    assert got[0] == (2, 10, 1, 9)
    assert got[1 * H] == (5, 30, 1, 9)       # hours 0+1 in range
    assert got[5 * H] == (1, 5, 5, 5)        # hours 3-5: only hour 5 exists


def test_cusum_identity_matches_sequential_recursion(spark):
    """The closed relational form (cumsum minus running extremum) equals
    the textbook max(0, s + d) recursion on a seeded random series, and a
    constructed level shift is detected upward."""
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import (
        cusum_changepoints,
    )

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 6, size=80).tolist()
    vals += (rng.integers(0, 6, size=40) + 12).tolist()  # level shift up
    rows = [(1, i * 1000, int(v)) for i, v in enumerate(vals)]
    pts = spark.createDataFrame(rows, "sid long, ts_ms long, v long")
    got = cusum_changepoints(pts, h_mult=2).collect()[0].asDict()

    n, s = len(vals), sum(vals)
    up = dn = max_up = max_dn = 0
    up_a_prev = dn_a_prev = False
    n_up = n_dn = 0
    first_up = first_dn = None
    for i, v in enumerate(vals):
        d = n * v - s
        up = max(0, up + d)
        dn = max(0, dn - d)
        max_up, max_dn = max(max_up, up), max(max_dn, dn)
        up_a, dn_a = up > 2 * s, dn > 2 * s
        if up_a and not up_a_prev:
            n_up += 1
        if dn_a and not dn_a_prev:
            n_dn += 1
        if up_a and first_up is None:
            first_up = i * 1000
        if dn_a and first_dn is None:
            first_dn = i * 1000
        up_a_prev, dn_a_prev = up_a, dn_a
    assert got["max_up"] == max_up and got["max_dn"] == max_dn
    assert got["n_up_shifts"] == n_up and got["n_dn_shifts"] == n_dn
    assert got["first_up_ts"] == first_up and got["first_dn_ts"] == first_dn
    assert got["n_up_shifts"] >= 1  # the injected shift is found
    assert got["vsum"] == s and got["n_buckets"] == n


def test_cusum_constant_series_never_alarms(spark):
    from modelardb_dynamic_spark.operators.analytics import (
        cusum_changepoints,
    )

    rows = [(1, i * 1000, 5) for i in range(50)]
    pts = spark.createDataFrame(rows, "sid long, ts_ms long, v long")
    got = cusum_changepoints(pts, h_mult=2).collect()[0].asDict()
    assert got["max_up"] == 0 and got["max_dn"] == 0
    assert got["n_up_shifts"] == 0 and got["first_up_ts"] is None


def test_trend_ols_matches_numpy(spark):
    from modelardb_dynamic_spark.operators.analytics import trend_ols

    SI = 60_000
    rng = np.random.default_rng(11)
    # sid a: clean upward trend + noise over an irregular (gappy) grid
    xs = sorted(int(x) for x in rng.choice(200, size=50, replace=False))
    ys = [int(3 * x + 7 + rng.integers(-5, 6)) for x in xs]
    rows = [("a", 1_000_000 + x * SI, y) for x, y in zip(xs, ys)]
    # sid const: excluded by the exact integer predicate
    rows += [("const", i * SI, 4) for i in range(10)]
    # sid two: n < 3 -> excluded
    rows += [("two", 0, 1), ("two", SI, 9)]
    out = {
        r["sid"]: r.asDict()
        for r in trend_ols(_points(spark, rows), unit_ms=SI).collect()
    }
    assert set(out) == {"a"}
    a = out["a"]
    x0 = np.array(xs, dtype=float) - xs[0]
    slope, icept = np.polyfit(x0, np.array(ys, dtype=float), 1)
    r = np.corrcoef(x0, ys)[0, 1]
    assert a["n"] == 50
    assert a["first_ts"] == 1_000_000 + xs[0] * SI
    assert a["last_ts"] == 1_000_000 + xs[-1] * SI
    assert abs(a["slope"] - slope) < 1e-9
    assert abs(a["intercept"] - icept) < 1e-9
    assert abs(a["r2"] - r * r) < 1e-12


def test_trend_ols_exact_two_point_line_through_three(spark):
    from modelardb_dynamic_spark.operators.analytics import trend_ols

    # perfectly linear integer series: slope/intercept exact, r2 == 1.0
    rows = [("a", i * 10, 5 * i + 2) for i in range(8)]
    a = trend_ols(_points(spark, rows), unit_ms=10).collect()[0]
    assert (a["slope"], a["intercept"], a["r2"]) == (5.0, 2.0, 1.0)


def test_seasonal_anomaly_leave_one_out(spark):
    from modelardb_dynamic_spark.operators.analytics import (
        seasonal_anomaly,
    )

    H = 3_600_000
    # phase 0 over 7 cycles: six quiet observations and one spike.
    # phase 1: perfectly constant -> zero LOO variance -> never flagged.
    vals0 = [10, 11, 9, 10, 300, 10, 11]
    rows = [("a", d * 24 * H, v) for d, v in enumerate(vals0)]
    rows += [("a", d * 24 * H + H, 5) for d in range(7)]
    out = seasonal_anomaly(
        _points(spark, rows), bucket_ms=H, period_buckets=24
    ).collect()
    # only the spike: its own value is excluded from its baseline, so the
    # quiet buckets score against a profile NOT inflated by the spike
    assert len(out) == 1
    r = out[0].asDict()
    assert (r["sid"], r["ts_ms"], r["phase"], r["v"]) == (
        "a", 4 * 24 * H, 0, 300,
    )
    n_p, s_p = 6, sum(vals0) - 300
    q_p = sum(v * v for v in vals0) - 300 * 300
    assert (r["n_p"], r["s_p"], r["q_p"]) == (n_p, s_p, q_p)
    import math

    assert abs(
        r["z"]
        - (n_p * 300 - s_p) / math.sqrt(n_p * q_p - s_p * s_p)
    ) < 1e-12
    assert r["z"] > 3


def test_seasonal_anomaly_min_periods_excludes_thin_phases(spark):
    from modelardb_dynamic_spark.operators.analytics import (
        seasonal_anomaly,
    )

    H = 3_600_000
    # 4 observations -> LOO n_p = 3 < min_periods=4 -> nothing flagged
    rows = [("a", d * 24 * H, v) for d, v in enumerate([1, 1, 1, 500])]
    out = seasonal_anomaly(
        _points(spark, rows), bucket_ms=H, period_buckets=24
    ).collect()
    assert out == []


def test_holt_levels_matches_python(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import holt_levels

    rng = np.random.default_rng(13)
    n = 300
    pdf = pd.DataFrame(
        {
            "sid": "s",
            "ts_ms": np.arange(n, dtype="int64") * 60_000,
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )
    out = {
        r["bucket_ts"]: (r["level"], r["trend"], r["forecast"], r["abs_err"])
        for r in holt_levels(
            spark.createDataFrame(pdf),
            bucket_ms=3_600_000,
            alpha=0.3,
            beta=0.1,
        ).collect()
    }
    prev = None
    for b, grp in pdf.groupby(pdf.ts_ms // 3_600_000 * 3_600_000):
        vs = grp.sort_values("ts_ms").v.tolist()
        level, trend = float(vs[0]), 0.0
        for x in vs[1:]:
            nl = 0.3 * float(x) + 0.7 * (level + trend)
            trend = 0.1 * (nl - level) + 0.9 * trend
            level = nl
        lv, tr, fc, err = out[b]
        assert lv == level and tr == trend  # bit-exact fold
        if prev is None:
            assert fc is None and err is None
        else:
            assert fc == prev
            assert abs(err - abs(sum(vs) / len(vs) - fc)) < 1e-12
        prev = level + trend


def test_holt_winters_matches_python_and_beats_holt_on_rhythm(spark):
    """(1) The seasonal fold is bit-exact vs a pure-python replay of
    offsets + the adjusted Holt recursion. (2) On a strong daily-rhythm
    series (flat except one fixed busy hour), the seasonal forecast's
    total abs_err is far below plain Holt's — the property that
    motivates the operator."""
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import (
        holt_levels,
        holt_winters_levels,
    )

    H, P = 3_600_000, 24
    rng = np.random.default_rng(29)
    rows = []
    for hour in range(24 * 6):  # 6 days, one point per minute
        base = 100 if hour % P == 9 else 10  # busy hour 9
        for minute in range(60):
            rows.append(
                (
                    "s",
                    hour * H + minute * 60_000,
                    int(base + rng.integers(0, 3)),
                )
            )
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    hw = holt_winters_levels(pts, H, P, alpha=0.3, beta=0.1)
    got = {r["bucket_ts"]: r for r in hw.collect()}

    # pure-python replay
    vs_by_bucket = {}
    for _, t, v in rows:
        vs_by_bucket.setdefault(t // H * H, []).append((t, v))
    s_ph, n_ph = {}, {}
    s_all = n_all = 0
    for _, t, v in rows:
        p = (t // H) % P
        s_ph[p] = s_ph.get(p, 0) + v
        n_ph[p] = n_ph.get(p, 0) + 1
        s_all += v
        n_all += 1
    off = {p: s_ph[p] / n_ph[p] - s_all / n_all for p in s_ph}
    prev = None
    hw_err = holt_err = 0.0
    for b in sorted(vs_by_bucket):
        vs = [v for _, v in sorted(vs_by_bucket[b])]
        o = off[(b // H) % P]
        level, trend = float(vs[0]) - o, 0.0
        for x in vs[1:]:
            nl = 0.3 * (float(x) - o) + 0.7 * (level + trend)
            trend = 0.1 * (nl - level) + 0.9 * trend
            level = nl
        r = got[b]
        assert r["level"] == level and r["trend"] == trend
        if prev is None:
            assert r["forecast"] is None
        else:
            assert r["forecast"] == prev + o
            assert r["abs_err"] == abs(sum(vs) / len(vs) - (prev + o))
            hw_err += r["abs_err"]
        prev = level + trend
    for r in holt_levels(pts, H, alpha=0.3, beta=0.1).collect():
        holt_err += r["abs_err"] or 0.0
    assert hw_err < 0.35 * holt_err, (hw_err, holt_err)


def test_holt_learns_in_bucket_trend_ewma_cannot(spark):
    """On a linear ramp sampled every minute, the within-bucket fold's
    trend state converges to the per-point slope (EWMA has no such
    state) and the level+trend forecast strictly beats the EWMA
    forecast on every mature bucket."""
    from modelardb_dynamic_spark.operators.analytics import (
        ewma_levels,
        holt_levels,
    )

    H, M = 3_600_000, 60_000
    rows = [("s", i * M, i) for i in range(48 * 60)]  # slope 1 per minute
    pts = _points(spark, rows)
    hrows = {r["bucket_ts"]: r for r in
             holt_levels(pts, bucket_ms=H).collect()}
    e = {r["bucket_ts"]: r["abs_err"] for r in
         ewma_levels(pts, bucket_ms=H).collect()}
    late = [k for k in sorted(hrows) if k >= 8 * H]
    for k in late:
        assert 0.9 < hrows[k]["trend"] < 1.1  # learned the slope
        assert hrows[k]["abs_err"] < e[k]  # trend-aware forecast wins


def test_seasonal_anomaly_matches_pandas_fuzz(spark):
    """Seeded random series (gaps, spikes) vs an independent pandas twin
    of the leave-one-out phase z-score — flags AND z values agree."""
    from modelardb_dynamic_spark.operators.analytics import (
        seasonal_anomaly,
    )

    H, PERIOD, K, MINP = 3_600_000, 24, 3, 4
    rng = np.random.default_rng(42)
    rows = []
    for sid in ("a", "b", "c"):
        buckets = sorted(
            int(x) for x in rng.choice(24 * 40, size=500, replace=False)
        )
        for g in buckets:
            v = int(rng.integers(5, 30))
            if rng.random() < 0.01:
                v *= 20  # injected spikes
            rows.append((sid, g * H, v))
    got = {
        (r["sid"], r["ts_ms"]): r["z"]
        for r in seasonal_anomaly(
            _points(spark, rows), bucket_ms=H, period_buckets=PERIOD,
            min_periods=MINP, k=K,
        ).collect()
    }

    want = {}
    df = pd.DataFrame(rows, columns=["sid", "ts_ms", "v"])
    df["phase"] = (df.ts_ms // H) % PERIOD
    for (_, _), g in df.groupby(["sid", "phase"]):
        n, s, q = len(g), g.v.sum(), (g.v * g.v).sum()
        for _, r in g.iterrows():
            np_, sp, qp = n - 1, s - r.v, q - r.v * r.v
            var_num = np_ * qp - sp * sp
            if np_ >= MINP and var_num > 0 and (
                (np_ * r.v - sp) ** 2 > K * K * var_num
            ):
                want[(r.sid, r.ts_ms)] = (np_ * r.v - sp) / math.sqrt(
                    var_num
                )
    assert set(got) == set(want)
    assert len(got) >= 3  # the injected spikes are actually caught
    for key in got:
        assert abs(got[key] - want[key]) < 1e-9


def test_sax_similar_pairs_exact(spark):
    """Hand-built word sets: Jaccard and the integer threshold replay the
    set algebra exactly; the df-cap removes stop-shapes before pairing;
    orientation is always sid1 < sid2."""
    from modelardb_dynamic_spark.operators.analytics import (
        sax_similar_pairs,
    )

    rows = [
        # s1 and s2 share 2 of 3 words each (union 4) -> J = 0.5
        ("s1", 0, "aab"), ("s1", 1, "abc"), ("s1", 2, "zzz"),
        ("s2", 0, "aab"), ("s2", 1, "abc"), ("s2", 2, "yyy"),
        # s3 shares only the stop-shape with everyone
        ("s3", 0, "stop"), ("s1", 3, "stop"), ("s2", 3, "stop"),
        # duplicate (sid, word) rows must not inflate set sizes
        ("s1", 4, "aab"),
    ]
    words = spark.createDataFrame(
        rows, "sid string, word_ts long, word string"
    )
    out = sax_similar_pairs(
        words, theta_num=1, theta_den=4, max_df=2
    ).collect()
    pairs = {(r["sid1"], r["sid2"]): r for r in out}
    # with max_df=2 the 'stop' word (df=3) is dropped, so s3 pairs with
    # nobody and s1/s2 intersect on exactly {aab, abc}
    assert set(pairs) == {("s1", "s2")}
    r = pairs[("s1", "s2")]
    assert r["n_inter"] == 2 and r["n_union"] == 4
    assert r["jaccard"] == 2.0 / 4.0
    # threshold is exact integer algebra: with theta 3/4 the pair drops
    none = sax_similar_pairs(
        words, theta_num=3, theta_den=4, max_df=2
    ).collect()
    assert none == []
    # without the df-cap the stop-shape creates all three pairs
    allp = sax_similar_pairs(words, theta_num=1, theta_den=100).collect()
    assert {(r["sid1"], r["sid2"]) for r in allp} == {
        ("s1", "s2"), ("s1", "s3"), ("s2", "s3")
    }


def test_km_survival_hand_curve(spark):
    # Classic textbook set: lifetimes 1,2+,3,3,4+ (+' = censored).
    # t=1: n=5 d=1 -> S=4/5; t=2: censor only -> S=4/5;
    # t=3: n=3 d=2 -> S=4/5*1/3; t=4: censor only -> unchanged.
    from modelardb_dynamic_spark.operators.analytics import km_survival

    life = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0)], "t long, observed int"
    )
    rows = {r.t: r for r in km_survival(life).collect()}
    assert [rows[t].n_at_risk for t in (1, 2, 3, 4)] == [5, 4, 3, 1]
    assert [rows[t].d_events for t in (1, 2, 3, 4)] == [1, 0, 2, 0]
    assert [rows[t].c_censored for t in (1, 2, 3, 4)] == [0, 1, 0, 1]
    assert rows[1].surv == pytest.approx(0.8)
    assert rows[2].surv == pytest.approx(0.8)
    assert rows[3].surv == pytest.approx(0.8 / 3)
    assert rows[4].surv == pytest.approx(0.8 / 3)


def test_km_survival_no_censoring_is_empirical_survival(spark):
    # With observed=1 everywhere, S(t) telescopes to #(T > t)/N.
    from modelardb_dynamic_spark.operators.analytics import km_survival

    ts = [1, 1, 2, 5, 5, 5, 9]
    life = spark.createDataFrame([(t, 1) for t in ts], "t long, observed int")
    for r in km_survival(life).collect():
        expect = sum(1 for t in ts if t > r.t) / len(ts)
        assert r.surv == pytest.approx(expect)


def test_km_survival_grouped_partitions_independent(spark):
    from modelardb_dynamic_spark.operators.analytics import km_survival

    life = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("b", 2, 0), ("b", 3, 1)],
        "g string, t long, observed int",
    )
    out = {(r.g, r.t): r.surv for r in km_survival(life, ["g"]).collect()}
    assert out[("a", 1)] == pytest.approx(0.5)
    assert out[("a", 2)] == pytest.approx(0.0)
    assert out[("b", 2)] == pytest.approx(1.0)  # censor-only time
    assert out[("b", 3)] == pytest.approx(0.0)


def test_wilson_lower_bound_ranks_small_n_safely(spark):
    # 2/2 hits must NOT outrank 95/100 by the lower bound, although the
    # raw proportion says otherwise; bounds bracket p_hat and more
    # trials at the same rate tighten the interval.
    from modelardb_dynamic_spark.operators.analytics import wilson_intervals

    rows = [("tiny", 1, 1)] * 2 + [("big", 1, 1)] * 95 + [("big", 1, 0)] * 5
    df = spark.createDataFrame(rows, "k string, n_trials long, k_hits long")
    out = {r.k: r for r in wilson_intervals(df, ["k"]).collect()}
    assert out["tiny"].p_hat == 1.0 and out["big"].p_hat == 0.95
    assert out["big"].wilson_lb > out["tiny"].wilson_lb
    for r in out.values():
        assert r.wilson_lb < r.p_hat <= r.wilson_ub or r.p_hat == 1.0
    wide = out["tiny"].wilson_ub - out["tiny"].wilson_lb
    narrow = out["big"].wilson_ub - out["big"].wilson_lb
    assert narrow < wide


def test_wilson_matches_textbook_value(spark):
    # n=10, k=7, z=1.96: Wilson interval ~ (0.3968, 0.8922) (Agresti-
    # Coull / Brown-Cai-DasGupta tables).
    from modelardb_dynamic_spark.operators.analytics import wilson_intervals

    df = spark.createDataFrame([("a", 10, 7)], "k string, n_trials long, k_hits long")
    r = wilson_intervals(df, ["k"]).collect()[0]
    assert r.wilson_lb == pytest.approx(0.3968, abs=2e-4)
    assert r.wilson_ub == pytest.approx(0.8922, abs=2e-4)


def _lttb_reference(ts, vs, B):
    # Straight float implementation from Steinarsson's thesis, with the
    # same floor bucketing — independent of the operator's integer form.
    n = len(ts)
    x = [t - ts[0] for t in ts]
    M, K = n - 2, B - 2
    bounds = [[] for _ in range(K + 2)]
    for j in range(M):
        bounds[1 + (j * K) // M].append(j + 1)
    bounds[K + 1] = [n - 1]
    sel = [0]
    xa, ya = x[0], vs[0]
    for kk in range(1, K + 1):
        nxt = bounds[kk + 1]
        cx = sum(x[i] for i in nxt) / len(nxt)
        cy = sum(vs[i] for i in nxt) / len(nxt)
        best, best_a = None, -1.0
        for i in bounds[kk]:
            a = abs((xa - cx) * (vs[i] - ya) - (xa - x[i]) * (cy - ya))
            if a > best_a:
                best, best_a = i, a
        sel.append(best)
        xa, ya = x[best], vs[best]
    sel.append(n - 1)
    return sel


def test_lttb_matches_float_reference(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import lttb_downsample

    rng = np.random.default_rng(11)
    n, B = 200, 17
    ts = np.cumsum(rng.integers(1, 5, size=n)) * 60_000
    vs = rng.integers(0, 1000, size=n)
    rows = [("s", int(t), int(v)) for t, v in zip(ts, vs)]
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    got = sorted(
        (r.ts_ms, r.v) for r in lttb_downsample(df, B).collect()
    )
    ref_idx = _lttb_reference([int(t) for t in ts], [int(v) for v in vs], B)
    want = sorted((int(ts[i]), int(vs[i])) for i in ref_idx)
    assert got == want
    assert len(got) == B


def test_lttb_small_series_pass_through_and_endpoints(spark):
    from modelardb_dynamic_spark.operators.analytics import lttb_downsample

    rows = [("tiny", i * 1000, i) for i in range(5)] + [
        ("big", i * 1000, (i * 7) % 23) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = lttb_downsample(df, 10).collect()
    tiny = sorted(r.ts_ms for r in out if r.sid == "tiny")
    big = sorted(r.ts_ms for r in out if r.sid == "big")
    assert tiny == [0, 1000, 2000, 3000, 4000]  # n <= B: keep all
    assert len(big) == 10
    assert big[0] == 0 and big[-1] == 99_000  # endpoints pinned


@pytest.mark.parametrize("seed,n,B", [(1, 50, 5), (2, 333, 29), (3, 64, 33),
                                      (4, 1000, 24), (5, 97, 12)])
def test_lttb_fuzz_matches_float_reference(spark, seed, n, B):
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import lttb_downsample

    rng = np.random.default_rng(seed)
    ts = np.cumsum(rng.integers(1, 900_000, size=n))
    vs = rng.integers(0, 1_000_000, size=n)
    df = spark.createDataFrame(
        [("s", int(t), int(v)) for t, v in zip(ts, vs)],
        "sid string, ts_ms long, v long",
    )
    got = sorted((r.ts_ms, r.v) for r in lttb_downsample(df, B).collect())
    ref = _lttb_reference([int(t) for t in ts], [int(v) for v in vs], B)
    want = sorted((int(ts[i]), int(vs[i])) for i in ref)
    assert got == want


@pytest.mark.parametrize("seed", [7, 8, 9, 10])
def test_km_survival_fuzz_matches_reference(spark, seed):
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import km_survival

    rng = np.random.default_rng(seed)
    n = 200
    t = rng.integers(1, 25, size=n)
    obs = rng.integers(0, 2, size=n)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(t, obs)], "t long, observed int"
    )
    got = {r.t: r for r in km_survival(df).collect()}
    # independent product-limit reference
    surv = 1.0
    for u in sorted(set(int(x) for x in t)):
        at_risk = int((t >= u).sum())
        d = int(((t == u) & (obs == 1)).sum())
        c = int(((t == u) & (obs == 0)).sum())
        surv *= (at_risk - d) / at_risk
        r = got[u]
        assert (r.n_at_risk, r.d_events, r.c_censored) == (at_risk, d, c)
        assert r.surv == pytest.approx(surv, rel=1e-12)


def test_kalman_level_matches_python_filter(spark):
    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import kalman_level

    rng = np.random.default_rng(17)
    vs = rng.integers(0, 50, size=40)
    df = spark.createDataFrame(
        [("s", i * 60_000, int(v)) for i, v in enumerate(vs)],
        "sid string, ts_ms long, v long",
    )
    r = kalman_level(df, q_var=1.0, r_var=4.0, p0=1.0).collect()[0]
    # independent scalar filter
    l, p, sse = float(vs[0]), 1.0, 0.0
    for y in vs[1:]:
        pp = p + 1.0
        k = pp / (pp + 4.0)
        innov = float(y) - l
        l = l + k * innov
        p = (1.0 - k) * pp
        sse = sse + innov * innov
    assert r.n_pts == 40
    assert r.level == pytest.approx(l, rel=1e-12)
    assert r.p_var == pytest.approx(p, rel=1e-12)
    assert r.rmse == pytest.approx((sse / 39) ** 0.5, rel=1e-12)
    # gain adapts: with Q=1, R=4 the steady-state variance solves
    # P = (1-K)(P+Q) -> P ~ 1.56; final p_var must be near it
    assert 1.3 < r.p_var < 1.8


def test_kalman_level_single_point(spark):
    from modelardb_dynamic_spark.operators.analytics import kalman_level

    df = spark.createDataFrame(
        [("s", 0, 7)], "sid string, ts_ms long, v long"
    )
    r = kalman_level(df).collect()[0]
    assert (r.n_pts, r.level, r.p_var, r.sse, r.rmse) == (1, 7.0, 1.0, 0.0, None)


def test_sax_discords_picks_rarest_window(spark):
    from modelardb_dynamic_spark.operators.analytics import (
        sax_discords,
        sax_words,
    )

    H = 3_600_000
    rows = []
    for sid in ("a", "b"):
        for h in range(32):  # flat series: identical common words
            rows.append((sid, h * H, 10))
    # plant one spike window in series a (hours 16..23 -> one 8h word)
    rows = [
        (s, t, 99 if (s == "a" and 16 * H <= t < 24 * H) else v)
        for (s, t, v) in rows
    ]
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    words = sax_words(pts, paa_ms=H, word_positions=8)
    top = {r.sid: r for r in sax_discords(words, top_k=1).collect()}
    assert top["a"].word_ts == 16 * H  # the planted anomaly window
    assert top["a"].word_freq == 1  # unique corpus-wide
    assert top["b"].word_freq > 1  # flat series: only common words


def test_croston_matches_scalar_reference(spark):
    from modelardb_dynamic_spark.operators.analytics import croston

    SI = 60_000
    # grid positions are 1-based FROM THE FIRST OBSERVED minute (the
    # series starts when it is first seen), so demands of size 6,3,9 at
    # minutes +0,+4,+5 sit at positions 1,5,6 with gaps 1,4,1; zero
    # periods are simply absent rows.
    base = 1_000_000 * SI
    rows = [("s", base + 0 * SI, 6), ("s", base + 4 * SI, 3),
            ("s", base + 5 * SI, 9)]
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    r = croston(df, si_ms=SI, alpha=0.1).collect()[0]
    zh, ph = 6.0, 1.0  # init: first size, first (1-based) position
    for g, z in [(4.0, 3.0), (1.0, 9.0)]:
        zh = 0.1 * z + 0.9 * zh
        ph = 0.1 * g + 0.9 * ph
    assert r.n_demands == 3 and r.n_periods == 6
    assert r.zhat == pytest.approx(zh, rel=1e-12)
    assert r.phat == pytest.approx(ph, rel=1e-12)
    assert r.croston_fcst == pytest.approx(zh / ph, rel=1e-12)
    assert r.sba_fcst == pytest.approx(0.95 * (zh / ph), rel=1e-12)


def test_dispersion_index_poisson_vs_bursty(spark):
    from modelardb_dynamic_spark.operators.analytics import dispersion_index

    H = 3_600_000
    rows = []
    # regular: exactly 5 per hour -> variance 0 -> D = 0
    for h in range(24):
        rows.append(("regular", h * H, 5))
    # bursty: same total, all in two hours
    rows += [("bursty", 0 * H, 60), ("bursty", 1 * H, 60)] + [
        ("bursty", h * H, 0) for h in range(2, 24)
    ]
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = {r.sid: r for r in dispersion_index(df, H).collect()}
    assert out["regular"].dispersion == pytest.approx(0.0)
    assert out["bursty"].dispersion > 10  # heavily clumped
    assert out["regular"].total == out["bursty"].total == 120
    # hand value for bursty: n=24, sx=120, sxx=7200
    want = (24 * 7200 - 120 * 120) / (23 * 120)
    assert out["bursty"].dispersion == pytest.approx(want)


def test_peak_concurrency_sweep(spark):
    from modelardb_dynamic_spark.operators.analytics import peak_concurrency

    D = 86_400_000
    # day 0: three sessions, max overlap 2 first reached at t=100
    # day 1: one session alone -> peak 1 at its start
    rows = [
        (100, 500),
        (300, 900),   # overlaps first from 300, but [100,500]+[300,900] -> 2 at 300
        (600, 700),   # overlaps second -> 2 again at 600
        (D + 50, D + 60),
    ]
    df = spark.createDataFrame(rows, "start_ms long, end_ms long")
    out = {r.bucket_ts: r for r in peak_concurrency(df, D).collect()}
    assert out[0].peak == 2 and out[0].peak_at_ms == 300
    assert out[D].peak == 1 and out[D].peak_at_ms == D + 50
    # ends release: at 501 concurrency drops to 1 (not asserted directly,
    # but a third overlapping session would make the peak 3)
    df3 = spark.createDataFrame(rows + [(250, 650)], "start_ms long, end_ms long")
    out3 = {r.bucket_ts: r for r in peak_concurrency(df3, D).collect()}
    assert out3[0].peak == 3 and out3[0].peak_at_ms == 300


def test_flatline_runs_gaps_and_ties(spark):
    from modelardb_dynamic_spark.operators.analytics import flatline_runs

    M = 60_000
    pts = []
    # sid a: 7,7,7 then gap then 7,7 -> longest run 3 starting at 0
    for i in [0, 1, 2, 5, 6]:
        pts.append(("a", i * M, 7))
    # sid b: two runs of 2 (values 1 then 2) -> earliest wins
    for i, v in [(0, 1), (1, 1), (2, 2), (3, 2)]:
        pts.append(("b", i * M, v))
    df = spark.createDataFrame(pts, "sid string, ts_ms long, v long")
    out = {r.sid: r for r in flatline_runs(df, M).collect()}
    assert out["a"].run_len == 3 and out["a"].run_start_ms == 0
    assert out["a"].run_value == 7
    assert out["b"].run_len == 2 and out["b"].run_value == 1
    assert out["b"].run_start_ms == 0


def test_benford_audit_hand_values(spark):
    import math

    from modelardb_dynamic_spark.operators.analytics import benford_audit

    # 60 values with first digit 1, 40 with first digit 2 (cents)
    rows = [("t", 1.23)] * 60 + [("t", 25.0)] * 40
    df = spark.createDataFrame(rows, "event_type string, value double")
    r = benford_audit(df).collect()[0]
    assert r.n == 100
    assert r.digit1_share == pytest.approx(0.6)
    p = [math.log10(1 + 1 / d) for d in range(1, 10)]
    obs = [60, 40] + [0] * 7
    chi2 = sum((o - 100 * pi) ** 2 / (100 * pi) for o, pi in zip(obs, p))
    assert r.chi2 == pytest.approx(chi2, rel=1e-12)


def test_decayed_counts_weight_ladder(spark):
    from modelardb_dynamic_spark.operators.analytics import decayed_counts
    import datetime as dt

    base = dt.datetime(2024, 3, 1)  # anchor day
    rows = []
    # u1: 2 events on anchor day (w=1), 3 events 7 days back (w=1/2),
    #     1 event 40 days back (outside horizon, dropped)
    rows += [(1, base)] * 2
    rows += [(1, base - dt.timedelta(days=7))] * 3
    rows += [(1, base - dt.timedelta(days=40))]
    # u2: 4 events 20 days back -> step 20//7=2 -> w=1/4
    rows += [(2, base - dt.timedelta(days=20))] * 4
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.user_id: r for r in decayed_counts(df).collect()}
    assert out[1].decayed_score == pytest.approx(2 + 3 / 2)
    assert out[1].n_window == 5
    assert out[2].decayed_score == pytest.approx(1.0)
    assert out[2].n_window == 4


def test_mann_kendall_monotone_and_ties(spark):
    import math

    from modelardb_dynamic_spark.operators.analytics import mann_kendall

    D = 86_400_000
    rows = []
    # up: strictly increasing 10 days -> S = 45, no ties
    for i in range(10):
        rows.append(("up", i * D, 1 + i))
    # flat: all equal -> S = 0, full tie -> var 0 -> z NULL
    for i in range(10):
        rows.append(("flat", i * D, 5))
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = {r.sid: r for r in mann_kendall(df, D).collect()}
    assert out["up"].s == 45
    n = 10
    var = n * (n - 1) * (2 * n + 5) / 18
    assert out["up"].z == pytest.approx((45 - 1) / math.sqrt(var), rel=1e-12)
    assert out["flat"].s == 0 and out["flat"].z is None


def test_slo_burn_pages_on_double_window(spark):
    import datetime as dt

    from modelardb_dynamic_spark.operators.analytics import slo_burn

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 6 quiet hours: 100 events, 0 errors; then an hour with 30% errors
    for h in range(6):
        for i in range(100):
            rows.append((base + dt.timedelta(hours=h, seconds=i), "ok"))
    for i in range(70):
        rows.append((base + dt.timedelta(hours=6, seconds=i), "ok"))
    for i in range(30):
        rows.append((base + dt.timedelta(hours=6, seconds=100 + i), "error"))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = sorted(slo_burn(df).collect(), key=lambda r: r.bucket_ts)
    quiet, hot = out[0], out[-1]
    assert quiet.page is False and quiet.burn_short == 0.0
    # hot hour: short burn = 0.30/0.01 = 30 > 14.4;
    # long = 30/600/0.01 = 5 -> NOT > 6 -> no page (slow window vetoes)
    assert hot.burn_short == pytest.approx(30.0)
    assert hot.burn_long == pytest.approx(5.0)
    assert hot.page is False
    # with a second hot hour the long window crosses too
    rows2 = rows + [
        (base + dt.timedelta(hours=7, seconds=i), "error") for i in range(30)
    ] + [(base + dt.timedelta(hours=7, seconds=100 + i), "ok") for i in range(70)]
    df2 = spark.createDataFrame(rows2, "ts timestamp, event_type string")
    hot2 = sorted(slo_burn(df2).collect(), key=lambda r: r.bucket_ts)[-1]
    assert hot2.burn_short == pytest.approx(30.0)
    # long window = 6 trailing buckets (hours 2..7): 600 events, 60 errors
    assert hot2.burn_long == pytest.approx(60 / 600 / 0.01)
    assert hot2.page is True


def test_pacf3_matches_scalar_durbin_levinson(spark):
    from modelardb_dynamic_spark.operators.analytics import pacf3

    H = 3_600_000
    # deterministic wavy integer series, 48 hourly points
    vals = [10 + ((3 * i * i + 7 * i) % 11) - 5 for i in range(48)]
    df = spark.createDataFrame(
        [("s", i * H, v) for i, v in enumerate(vals)],
        "sid string, ts_ms long, v long",
    )
    r = pacf3(df, H).collect()[0]

    # scalar reference with the SAME sparse-acf convention
    n = len(vals)
    s = sum(vals)
    q = sum(v * v for v in vals)
    mu = s / n
    den = q - 2 * mu * s + n * mu * mu

    def acf(k):
        pairs = [(vals[i], vals[i + k]) for i in range(n - k)]
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        sab = sum(a * b for a, b in pairs)
        return (sab - mu * sb - mu * sa + len(pairs) * mu * mu) / den

    r1, r2, r3 = acf(1), acf(2), acf(3)
    assert r.phi1 == pytest.approx(r1, rel=1e-9)
    p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert r.phi2 == pytest.approx(p2, rel=1e-9)
    a21 = r1 - p2 * r1
    p3 = (r3 - a21 * r2 - p2 * r1) / (1 - a21 * r1 - p2 * r2)
    assert r.phi3 == pytest.approx(p3, rel=1e-9)
    assert r.n_pairs_1 == 47


def test_temporal_entropy_uniform_vs_point_mass(spark):
    import math

    from modelardb_dynamic_spark.operators.analytics import temporal_entropy

    H = 3_600_000
    rows = []
    # uniform over all 24 phases, 2 per phase -> H = log2 24
    for d in range(2):
        for h in range(24):
            rows.append(("uni", (d * 24 + h) * H, 1))
    # point mass: everything at phase 3 -> H = 0
    for d in range(5):
        rows.append(("point", (d * 24 + 3) * H, 7))
    # 50/50 two phases -> H = 1 bit
    for d in range(4):
        rows.append(("half", (d * 24) * H, 1))
        rows.append(("half", (d * 24 + 12) * H, 1))
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = {r.sid: r for r in temporal_entropy(df).collect()}
    assert out["uni"].h_bits == pytest.approx(math.log2(24), abs=1e-9)
    assert out["uni"].n_phases_used == 24 and out["uni"].n == 48
    assert out["point"].h_bits == pytest.approx(0.0, abs=1e-9)
    assert out["half"].h_bits == pytest.approx(1.0, abs=1e-9)


def test_mann_kendall_fuzz_vs_scalar(spark):
    import math
    import random

    from modelardb_dynamic_spark.operators.analytics import mann_kendall

    D = 86_400_000
    rows, want = [], {}
    for seed in range(4):
        rng = random.Random(1000 + seed)
        n = rng.randint(5, 25)
        vals = [rng.randint(0, 6) for _ in range(n)]  # heavy ties
        sid = f"s{seed}"
        rows += [(sid, i * D, v) for i, v in enumerate(vals)]
        s = sum(
            (0 if vals[j] == vals[i] else (1 if vals[j] > vals[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie_counts = {}
        for v in vals:
            tie_counts[v] = tie_counts.get(v, 0) + 1
        tt = sum(t * (t - 1) * (2 * t + 5) for t in tie_counts.values())
        var = (n * (n - 1) * (2 * n + 5) - tt) / 18
        if var > 0:
            z = (s - 1) / math.sqrt(var) if s > 0 else (
                (s + 1) / math.sqrt(var) if s < 0 else 0.0)
        else:
            z = None
        want[sid] = (n, s, z)
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = {r.sid: r for r in mann_kendall(df, D).collect()}
    for sid, (n, s, z) in want.items():
        assert out[sid].n_buckets == n and out[sid].s == s
        if z is None:
            assert out[sid].z is None
        else:
            assert out[sid].z == pytest.approx(z, rel=1e-12, abs=1e-12)


def test_new_analytics_fuzz_vs_scalar(spark):
    """Seeded scalar differentials for the round's counting operators —
    the discipline that caught the Mann-Kendall n bug (a mirrored
    oracle can't catch a shared mistake; an independent reference
    can)."""
    import math
    import random

    from modelardb_dynamic_spark.operators.analytics import (
        dispersion_index,
        flatline_runs,
        peak_concurrency,
        temporal_entropy,
    )

    H = 3_600_000
    rng = random.Random(7)

    # --- dispersion + temporal entropy on one random table -------------
    rows = []
    series = {}
    for s in range(4):
        sid = f"d{s}"
        vals = {}
        for _ in range(rng.randint(5, 40)):
            h = rng.randint(0, 200)
            vals[h] = vals.get(h, 0) + rng.randint(1, 9)
        series[sid] = vals
        rows += [(sid, h * H, v) for h, v in vals.items()]
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")

    disp = {r.sid: r for r in dispersion_index(df, H).collect()}
    for sid, vals in series.items():
        xs = list(vals.values())
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        want = (
            (n * sxx - sx * sx) / ((n - 1) * sx) if n >= 2 and sx > 0 else None
        )
        got = disp[sid].dispersion
        if want is None:
            assert got is None
        else:
            assert got == pytest.approx(want, rel=1e-12)

    ent = {r.sid: r for r in temporal_entropy(df).collect()}
    for sid, vals in series.items():
        ph = {}
        for h, v in vals.items():
            ph[h % 24] = ph.get(h % 24, 0) + v
        n = sum(ph.values())
        want = math.log2(n) - sum(c * math.log2(c) for c in ph.values()) / n
        assert ent[sid].h_bits == pytest.approx(want, rel=1e-9, abs=1e-9)
        assert ent[sid].n_phases_used == len(ph)

    # --- peak concurrency vs brute-force boundary scan -----------------
    sess = [
        (rng.randint(0, 5000), rng.randint(1, 800)) for _ in range(60)
    ]
    sdf = spark.createDataFrame(
        [(a, a + d) for a, d in sess], "start_ms long, end_ms long"
    )
    B = 1000
    got = {r.bucket_ts: (r.peak, r.peak_at_ms)
           for r in peak_concurrency(sdf, B).collect()}
    bounds = sorted(
        {a for a, d in sess} | {a + d + 1 for a, d in sess}
    )
    want_by_bucket = {}
    for t in bounds:
        c = sum(1 for a, d in sess if a <= t <= a + d)
        b = (t // B) * B
        cur = want_by_bucket.get(b)
        if cur is None or c > cur[0]:
            want_by_bucket[b] = (c, t)
    assert got == want_by_bucket

    # --- flatline runs vs brute force ----------------------------------
    M = 60_000
    frows, fwant = [], {}
    for s in range(3):
        sid = f"f{s}"
        idxs = sorted(rng.sample(range(60), rng.randint(10, 40)))
        vs = [rng.randint(0, 2) for _ in idxs]
        frows += [(sid, i * M, v) for i, v in zip(idxs, vs)]
        best = None
        run_len, run_start = 0, None
        for k, (i, v) in enumerate(zip(idxs, vs)):
            if k > 0 and i == idxs[k - 1] + 1 and v == vs[k - 1]:
                run_len += 1
            else:
                run_len, run_start = 1, i
            key = (run_len, run_start * M, v)
            if best is None or (
                key[0] > best[0]
                or (key[0] == best[0] and key[1] < best[1])
                or (key[0] == best[0] and key[1] == best[1] and key[2] < best[2])
            ):
                best = key
        fwant[sid] = best
    fdf = spark.createDataFrame(frows, "sid string, ts_ms long, v long")
    fgot = {
        r.sid: (r.run_len, r.run_start_ms, r.run_value)
        for r in flatline_runs(fdf, M).collect()
    }
    assert fgot == fwant


def test_concurrency_occupancy_hand_values(spark):
    from modelardb_dynamic_spark.operators.analytics import (
        concurrency_occupancy,
    )

    # [0,99] and [50,149]: levels 1 (0-49), 2 (50-99), 1 (100-149), 0 gap
    # then [200,299]: level 1. Boundaries: 0,50,100,150,200,300.
    df = spark.createDataFrame(
        [(0, 99), (50, 149), (200, 299)], "start_ms long, end_ms long"
    )
    out = {r.level: r for r in concurrency_occupancy(df).collect()}
    assert out[2].ms == 50            # [50, 100)
    assert out[1].ms == 50 + 50 + 100  # [0,50) + [100,150) + [200,300)
    assert out[0].ms == 50            # the [150, 200) gap
    total = 300
    assert out[1].share == pytest.approx(200 / total)
    assert out[2].share == pytest.approx(50 / total)


def test_triangle_census_known_graph(spark):
    from modelardb_dynamic_spark.operators.graph import triangle_census

    # K4 on {a,b,c,d} plus pendant e attached to a:
    # every K4 node: deg 3 within K4, 3 triangles... each node of K4 is
    # in C(3,2)=3 triangles; a additionally has edge to e (deg 4).
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("a", "e"),
    ]
    df = spark.createDataFrame(edges, "a string, b string")
    out = {r.node: r for r in triangle_census(df).collect()}
    assert out["a"].degree == 4 and out["a"].n_triangles == 3
    assert out["a"].clustering == pytest.approx(2 * 3 / (4 * 3))
    for n in "bcd":
        assert out[n].degree == 3 and out[n].n_triangles == 3
        assert out[n].clustering == pytest.approx(1.0)
    assert out["e"].degree == 1 and out["e"].n_triangles == 0
    assert out["e"].clustering is None


def test_seasonal_strength_pure_vs_none(spark):
    from modelardb_dynamic_spark.operators.analytics import seasonal_strength

    H = 3_600_000
    rows = []
    # pure: value is a deterministic function of the phase -> eta2 = 1
    for d in range(3):
        for h in range(24):
            rows.append(("pure", (d * 24 + h) * H, 10 + h))
    # flat: constant -> SS_total = 0 -> NULL
    for d in range(3):
        for h in range(24):
            rows.append(("flat", (d * 24 + h) * H, 5))
    # mixed: phase explains half... hand value via scalar ANOVA below
    vals = {}
    for d in range(2):
        for h in range(24):
            v = (3 if h < 12 else 9) + (d % 2)
            vals[(d, h)] = v
            rows.append(("mix", (d * 24 + h) * H, v))
    df = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    out = {r.sid: r for r in seasonal_strength(df).collect()}
    assert out["pure"].eta2 == pytest.approx(1.0, abs=1e-12)
    assert out["flat"].eta2 is None
    # scalar reference for mix
    xs = list(vals.values())
    n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
    by_p = {}
    for (d, h), v in vals.items():
        by_p.setdefault(h, []).append(v)
    between = sum(sum(g) ** 2 / len(g) for g in by_p.values()) - s * s / n
    total = q - s * s / n
    assert out["mix"].eta2 == pytest.approx(between / total, rel=1e-12)


def test_independence_chi2_hand_table(spark):
    import math

    from modelardb_dynamic_spark.operators.analytics import independence_chi2

    # 2x2: rows A/B, cols 0/1 with O = [[10, 20], [30, 40]]
    rows = (
        [("A", 0)] * 10 + [("A", 1)] * 20 + [("B", 0)] * 30 + [("B", 1)] * 40
    )
    df = spark.createDataFrame(rows, "r string, c long")
    out = independence_chi2(df, "r", "c").collect()[0]
    n = 100
    obs = {("A", 0): 10, ("A", 1): 20, ("B", 0): 30, ("B", 1): 40}
    rt = {"A": 30, "B": 70}
    ct = {0: 40, 1: 60}
    chi2 = sum(
        (o - rt[r] * ct[c] / n) ** 2 / (rt[r] * ct[c] / n)
        for (r, c), o in obs.items()
    )
    assert out.n == 100 and out.dof == 1
    assert out.chi2 == pytest.approx(chi2, rel=1e-12)
    assert out.cramers_v == pytest.approx(math.sqrt(chi2 / 100), rel=1e-12)

    # independent table -> chi2 ~ 0
    rows2 = [("A", 0)] * 10 + [("A", 1)] * 10 + [("B", 0)] * 30 + [("B", 1)] * 30
    df2 = spark.createDataFrame(rows2, "r string, c long")
    out2 = independence_chi2(df2, "r", "c").collect()[0]
    assert out2.chi2 == pytest.approx(0.0, abs=1e-12)


def test_rate_shift_z_hand_values(spark):
    import math

    from modelardb_dynamic_spark.operators.analytics import rate_shift_z

    rows = []
    # before: 100 events, 10 flagged; after: 100 events, 30 flagged
    rows += [("t", 150.0 if i < 10 else 50.0, i) for i in range(100)]
    rows += [("t", 150.0 if i < 30 else 50.0, 1000 + i) for i in range(100)]
    df = spark.createDataFrame(rows, "event_type string, value double, ts_ms long")
    r = rate_shift_z(df, split_ms=1000, flag_expr="value > 100").collect()[0]
    assert (r.n1, r.x1, r.n2, r.x2) == (100, 10, 100, 30)
    p = 40 / 200
    var = p * (1 - p) * (1 / 100 + 1 / 100)
    assert r.z == pytest.approx((0.30 - 0.10) / math.sqrt(var), rel=1e-12)


def test_fk_audit_hand_table(spark):
    from modelardb_dynamic_spark.operators.curation import fk_audit

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    r = fk_audit(child, parent, "k", "p").collect()[0]
    assert r.n_child == 5
    assert r.n_orphan == 2          # the 9 and the NULL
    assert r.n_parent_keys == 3
    assert r.n_childless_keys == 1  # the 3
    assert r.orphan_share == pytest.approx(2 / 5)
    assert r.childless_share == pytest.approx(1 / 3)


def test_hill_tail_pareto_recovers_alpha(spark):
    import math

    from modelardb_dynamic_spark.operators.analytics import hill_tail

    # exact Pareto(alpha=2) quantile grid: x_q = (1-q)^(-1/2), q uniform
    # -> Hill on the top-k should recover alpha ~ 2
    n, k = 2000, 100
    rows = []
    for i in range(1, n + 1):
        q = i / (n + 1)
        x = int(round(1e6 * (1 - q) ** (-0.5)))
        rows.append(("p", x, i))
    df = spark.createDataFrame(rows, "event_type string, cents long, event_id long")
    r = hill_tail(df, "event_type", "cents", "event_id", k=k).collect()[0]
    assert r.n_ranked == k + 1
    # scalar reference with the same top-k definition
    vals = sorted((x for _, x, _ in rows), reverse=True)
    h = sum(math.log(v) for v in vals[:k]) / k - math.log(vals[k])
    assert r.hill_h == pytest.approx(h, rel=1e-9)
    assert r.alpha == pytest.approx(1 / h, rel=1e-9)
    assert 1.6 < r.alpha < 2.4  # recovers the planted exponent
    # short key -> NULL
    df2 = spark.createDataFrame(
        [("s", 10 + i, i) for i in range(50)],
        "event_type string, cents long, event_id long",
    )
    r2 = hill_tail(df2, "event_type", "cents", "event_id", k=100).collect()[0]
    assert r2.hill_h is None and r2.alpha is None


def test_ljung_box_rejects_trend_not_noise(spark):
    # strongly autocorrelated series (slow ramp) vs white-ish noise
    rng = np.random.default_rng(11)
    grid = [i * 3_600_000 for i in range(200)]
    ramp = [int(10 + i // 4) for i in range(200)]
    noise = [int(x) for x in rng.integers(0, 1_000_000, size=200)]
    rows = [("ramp", t, v) for t, v in zip(grid, ramp)] + [
        ("noise", t, v) for t, v in zip(grid, noise)
    ]
    from modelardb_dynamic_spark.operators.analytics import ljung_box

    out = {
        r.sid: r
        for r in ljung_box(_points(spark, rows), max_lag=4).collect()
    }
    assert out["ramp"].reject_white
    assert out["ramp"].q_lb > out["noise"].q_lb
    assert out["ramp"].n == 200
    # scalar reference: Q = n(n+2) sum r_k^2/(n-k) with sparse-ACF r_k
    x = np.array(ramp, dtype=np.float64)
    n = len(x)
    mu = x.mean()
    energy = ((x - mu) ** 2).sum()
    q_ref = 0.0
    for k in range(1, 5):
        r_k = ((x[:-k] - mu) * (x[k:] - mu)).sum() / energy
        q_ref += r_k * r_k / (n - k)
    q_ref *= n * (n + 2)
    assert abs(out["ramp"].q_lb - q_ref) < 1e-6 * abs(q_ref)


def test_ljung_box_excludes_short_series(spark):
    rows = [("short", i * 3_600_000, i + 1) for i in range(3)]
    from modelardb_dynamic_spark.operators.analytics import ljung_box

    # 3 buckets cannot produce a lag-4 pair -> excluded, not NULL-filled
    assert ljung_box(_points(spark, rows), max_lag=4).count() == 0


def test_spectral_daily_recovers_planted_cycle(spark):
    import math

    # sid "cyc": clean 24h cosine peaking at phase 6; "flat": constant
    rows = []
    for d in range(4):
        for p in range(24):
            t = (d * 24 + p) * 3_600_000
            rows.append(
                ("cyc", t, int(100 + 50 * math.cos(2 * math.pi * (p - 6) / 24)))
            )
            rows.append(("flat", t, 7))
    from modelardb_dynamic_spark.operators.analytics import spectral_daily

    out = {r.sid: r for r in spectral_daily(_points(spark, rows)).collect()}
    cyc, flat = out["cyc"], out["flat"]
    assert cyc.peak_phase == 6 and cyc.n == 96 and cyc.n_phases_used == 24
    # numpy DFT reference over the phase sums
    sp = np.zeros(24)
    for d in range(4):
        for p in range(24):
            sp[p] += int(100 + 50 * math.cos(2 * math.pi * (p - 6) / 24))
    X = np.fft.fft(sp)[1]
    assert abs(cyc.a1 - X.real) < 1e-6 * abs(X.real)
    assert abs(cyc.b1 - X.imag) < 1e-6 * abs(X.imag)
    assert abs(cyc.amp - abs(X)) < 1e-6 * abs(X)
    # constant series: fundamental cancels to ~0 relative to mass
    assert flat.rel_amp < 1e-12
    # phase readout: peak at hour 6 means angle(X1) ~ -2*pi*6/24
    ang = math.atan2(cyc.b1, cyc.a1)
    # int-rounded inputs shift the angle slightly; 0.01 rad ~ 2 min of day
    assert abs(ang - (-2 * math.pi * 6 / 24)) < 0.01


def test_forecast_league_prefers_right_model(spark):
    import math

    # flat+noise -> ewma; steady ramp -> holt (in-bucket trend carries
    # into the next-bucket forecast); strong diurnal -> hw. Buckets need
    # several points: the smoothers fold WITHIN the bucket, so a
    # single-point bucket makes holt degenerate to ewma.
    rng = np.random.default_rng(5)
    rows = []
    for d in range(6):
        for p in range(24):
            for m in range(12):
                t = ((d * 24 + p) * 12 + m) * 300_000  # 5-min grid
                gi = (d * 24 + p) * 12 + m
                rows.append(("flat", t, int(50 + rng.integers(0, 3))))
                rows.append(("ramp", t, int(10 + 3 * gi)))
                rows.append(
                    (
                        "diur",
                        t,
                        int(100 + 80 * math.cos(2 * math.pi * p / 24) + m),
                    )
                )
    from modelardb_dynamic_spark.operators.analytics import forecast_league

    out = {
        r.sid: r
        for r in forecast_league(
            _points(spark, rows), bucket_ms=3_600_000
        ).collect()
    }
    assert out["ramp"].winner == "holt"
    assert out["diur"].winner == "hw"
    assert out["flat"].winner == "ewma"
    for r in out.values():
        assert r.best_sse == min(r.sse_ewma, r.sse_holt, r.sse_hw)
        assert r.n_scored == 6 * 24 - 1


def test_anomaly_consensus_verdicts(spark):
    # quiet: no detector fires; spike: z+mad fire (2 -> alert);
    # shift: cusum fires alone (1 -> watch)
    rows = []
    for i in range(96):
        t = i * 3_600_000
        rows.append(("quiet", t, 50 + (i % 2)))
        rows.append(("spike", t, 5_000 if i == 80 else 50 + (i % 2)))
        rows.append(("shift", t, 10 if i < 48 else 200))
    from modelardb_dynamic_spark.operators.analytics import (
        anomaly_consensus,
    )

    out = {
        r.sid: r
        for r in anomaly_consensus(_points(spark, rows)).collect()
    }
    assert out["quiet"].verdict == "ok" and out["quiet"].n_detectors == 0
    assert out["spike"].verdict == "alert"
    assert out["spike"].n_z > 0 and out["spike"].n_mad > 0
    assert out["shift"].verdict in ("watch", "alert")
    assert out["shift"].n_shifts > 0
    for r in out.values():
        assert r.n_buckets == 96


def test_session8_ops_fuzz_vs_scalar(spark):
    """Seeded random sparse series through ljung_box / spectral_daily /
    anomaly_consensus vs independent numpy references (not the mirrored
    oracle — independent references catch what replays cannot)."""
    import math

    H = 3_600_000
    rng = np.random.default_rng(80)
    rows = []
    series = {}
    for i in range(6):
        sid = f"s{i}"
        buckets = sorted(
            int(x) for x in rng.choice(24 * 30, size=240, replace=False)
        )
        vals = [
            int(
                5
                + rng.integers(0, 20)
                + (10 * math.cos(2 * math.pi * (b % 24) / 24) if i % 2 else 0)
            )
            for b in buckets
        ]
        series[sid] = (buckets, vals)
        rows.extend((sid, b * H, v) for b, v in zip(buckets, vals))
    pts = _points(spark, rows)

    from modelardb_dynamic_spark.operators.analytics import (
        anomaly_consensus,
        ljung_box,
        spectral_daily,
    )

    # --- ljung_box vs scalar sparse-ACF reference
    got_lb = {r.sid: r for r in ljung_box(pts, max_lag=4).collect()}
    for sid, (buckets, vals) in series.items():
        bv = dict(zip(buckets, vals))
        x = np.array(vals, dtype=np.float64)
        n = len(x)
        mu = x.mean()
        energy = ((x - mu) ** 2).sum()
        q_ref, have_all = 0.0, True
        for k in range(1, 5):
            pairs = [
                (bv[b] - mu) * (bv[b + k] - mu)
                for b in buckets
                if b + k in bv
            ]
            if not pairs:
                have_all = False
                break
            q_ref += (sum(pairs) / energy) ** 2 / (n - k)
        if not have_all:
            assert sid not in got_lb
            continue
        q_ref *= n * (n + 2)
        assert abs(got_lb[sid].q_lb - q_ref) < 1e-9 * max(1.0, abs(q_ref)), sid

    # --- spectral_daily vs numpy DFT over the phase sums
    got_sp = {r.sid: r for r in spectral_daily(pts).collect()}
    for sid, (buckets, vals) in series.items():
        sp = np.zeros(24)
        for b, v in zip(buckets, vals):
            sp[b % 24] += v
        X = np.fft.fft(sp)[1]
        r = got_sp[sid]
        assert abs(r.a1 - X.real) < 1e-9 * max(1.0, abs(X.real)), sid
        assert abs(r.b1 - X.imag) < 1e-9 * max(1.0, abs(X.imag)), sid
        assert r.peak_phase == min(
            p for p in range(24)
            if sp[p] == max(sp[q] for q in range(24))
        ), sid

    # --- anomaly_consensus count columns vs scalar detectors
    got_ac = {r.sid: r for r in anomaly_consensus(pts).collect()}
    for sid, (buckets, vals) in series.items():
        # rolling z flags (trailing 24, excl self, minp 12, k 3)
        n_z = 0
        for i in range(len(vals)):
            w = vals[max(0, i - 24):i]
            nw = len(w)
            if nw < 12:
                continue
            s, ss = sum(w), sum(v * v for v in w)
            var = nw * ss - s * s
            if var > 0 and (vals[i] * nw - s) ** 2 > 9 * var:
                n_z += 1
        # MAD flags (k=5), rank-selection medians
        sv = sorted(vals)
        m = len(sv)
        med = (sv[(m + 1) // 2 - 1] + sv[(m + 2) // 2 - 1]) / 2.0
        devs = sorted(abs(v - med) for v in vals)
        mad = (devs[(m + 1) // 2 - 1] + devs[(m + 2) // 2 - 1]) / 2.0
        n_mad = sum(
            1 for v in vals if mad > 0 and abs(v - med) > 5.0 * mad
        )
        r = got_ac[sid]
        assert r.n_z == n_z, sid
        assert r.n_mad == n_mad, sid
        assert r.n_buckets == len(vals), sid
        fired = int(r.n_z > 0) + int(r.n_mad > 0) + int(r.n_shifts > 0)
        assert r.n_detectors == fired
        assert r.verdict == (
            "alert" if fired >= 2 else ("watch" if fired == 1 else "ok")
        )


def test_binseg_split_localizes_planted_shift(spark):
    # step at index 60 of 100; quadratic scan must find it exactly
    rows = []
    for i in range(100):
        rows.append(("step", i * 3_600_000, 10 if i < 60 else 200))
        rows.append(("flat", i * 3_600_000, 7))  # zero variance: excluded
    from modelardb_dynamic_spark.operators.analytics import binseg_split

    out = {r.sid: r for r in binseg_split(_points(spark, rows)).collect()}
    assert set(out) == {"step"}
    r = out["step"]
    # best split = prefix ending at the last pre-shift point
    assert r.n_left == 60 and r.split_ts == 59 * 3_600_000
    assert r.mean_left == 10.0 and r.mean_right == 200.0
    assert abs(r.r2_split - 1.0) < 1e-12  # clean step: all variance
    # scalar argmax differential on a noisy series
    rng = np.random.default_rng(21)
    vals = [int(20 + rng.integers(0, 9) + (37 if i >= 33 else 0))
            for i in range(80)]
    rows2 = [("n", i * 3_600_000, v) for i, v in enumerate(vals)]
    got = binseg_split(_points(spark, rows2)).collect()[0]
    import numpy as np2
    x = np2.array(vals, dtype=object)
    n, S = len(vals), sum(vals)
    best, bi = -1.0, None
    for t in range(2, n - 1):  # nl = t in [2, n-2]
        sl = int(sum(vals[:t]))
        num = sl * n - S * t
        c = float(num * num) / float(t * (n - t))
        if c > best:
            best, bi = c, t
    assert got.n_left == bi


def test_percentile_bands_exact_picks(spark):
    # 1 day, 24 known hourly values -> P10/P50/P90 are exact rank picks
    vals = list(range(1, 25))  # 1..24
    rows = [("a", i * 3_600_000, v) for i, v in enumerate(vals)]
    from modelardb_dynamic_spark.operators.analytics import (
        percentile_bands,
    )

    r = percentile_bands(_points(spark, rows)).collect()[0]
    n = 24
    assert r.n == n and r.day_ts == 0
    # ceil-index picks: ceil(n/10)=3, ceil(n/2)=12, ceil(9n/10)=22
    assert r.p10_ms == 3 and r.p50_ms == 12 and r.p90_ms == 22
    assert r.min_ms == 1 and r.max_ms == 24 and r.gap_sum_ms == sum(vals)


def test_locf_fill_carries_and_counts_staleness(spark):
    rows = [("a", 0, 10), ("a", 3 * 3_600_000, 40), ("a", 4 * 3_600_000, 7)]
    from modelardb_dynamic_spark.operators.analytics import locf_fill

    out = {
        r.ts_ms: r
        for r in locf_fill(_points(spark, rows), si_ms=3_600_000).collect()
    }
    assert len(out) == 5  # full grid [0, 4h]
    assert [out[h * 3_600_000].v for h in range(5)] == [10, 10, 10, 40, 7]
    assert [out[h * 3_600_000].filled for h in range(5)] == [
        False, True, True, False, False,
    ]
    assert [out[h * 3_600_000].staleness for h in range(5)] == [0, 1, 2, 0, 0]
