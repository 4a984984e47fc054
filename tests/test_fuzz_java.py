"""Differential FUZZ against the reference Java engine (VERDICT r3 #5).

The 11 + 14 committed goldens pin specific scenarios; this module
generates 120 seeded random cases — random walks, constant stretches,
cluster churn that forces dynamic splits and rejoins, per-member gaps,
error bounds 0/1/10, split fractions 1/10/100 — runs the REFERENCE's own
Java classes over them (tools/goldengen/FuzzHarness.java, one JVM for all
cases), and asserts the Python/C engines emit the byte- and
order-identical segment stream:

- grouped cases (G >= 2) -> models.grouped.compress_group (the shipping
  path: whole-group C fast path + windowed C fast path + per-row engine);
- single-series cases    -> models.kernels.compress_series.

Grouped comparison is order-insensitive (sorted by a canonical key):
the reference drains its pending-join set via HashSet iteration
(SegmentGenerator.java:445 `iterator().next()` on identity hashes), so
the CROSS-sub emission interleave around joins is not deterministic in
Java itself — segment CONTENT is the contract (the sink is an unordered
table), and the committed goldens still pin exact order on their
scenarios. Single-series comparison stays order-exact.

error bounds are chosen float32-exact so the single-series kernel's
f32-widened bound and the grouped engine's raw-double bound coincide
with the Java engine's for every case.

Skipped when javac or the read-only reference checkout is unavailable.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.models.grouped import compress_group
from modelardb_dynamic_spark.models.kernels import compress_series

REF = "/root/reference/src/main/java/dk/aau/modelardb/core"
SI = 100
LB = 50

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None or not os.path.isdir(REF),
    reason="javac or reference checkout unavailable",
)


def _commons_lang_jar() -> str:
    import pyspark

    return os.path.join(
        os.path.dirname(pyspark.__file__), "jars", "commons-lang-2.6.jar"
    )


def _classes_dir() -> str:
    """Compile the reference core + FuzzHarness once per machine (cached;
    the harness source's mtime busts the cache on edits)."""
    base = "/tmp/mdbs_jref_fuzz"
    classes = os.path.join(base, "classes")
    harness = (
        Path(__file__).parent.parent / "tools" / "goldengen" / "FuzzHarness.java"
    )
    stamp = os.path.join(base, f"stamp-{int(harness.stat().st_mtime)}")
    if os.path.exists(stamp):
        return classes
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(classes, exist_ok=True)
    srcs = []
    for sub in (
        "models", "utility",
    ):
        srcs += [str(p) for p in Path(REF, sub).glob("*.java")]
    srcs += [
        f"{REF}/DataPoint.java", f"{REF}/SegmentGenerator.java",
        f"{REF}/TimeSeriesGroup.java",
        f"{REF}/timeseries/TimeSeries.java",
        f"{REF}/timeseries/TimeSeriesCSV.java",
        f"{REF}/timeseries/AsyncTimeSeries.java",
    ]
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-cp", _commons_lang_jar(),
         "-d", classes, *srcs],
        check=True, capture_output=True, timeout=300,
    )
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-cp", classes, "-d", classes,
         str(harness)],
        check=True, capture_output=True, timeout=300,
    )
    Path(stamp).touch()
    return classes


def _gen_case(rng: np.random.Generator, force_g1: bool):
    """One fuzz case: per-member (t, v) arrays on the SI grid with holes."""
    n = int(rng.integers(100, 1200))
    G = 1 if force_g1 else int(rng.integers(2, 6))
    grid = np.arange(n, dtype=np.int64) * SI + 100
    # cluster levels + churn: members jump between levels at change points
    levels = np.array([10.0, 11.0, 1000.0, -50.0, 0.0])[
        rng.integers(0, 5, size=G)
    ]
    V = np.empty((n, G), dtype=np.float32)
    for g in range(G):
        kind = int(rng.integers(0, 4))
        if kind == 0:  # constant stretches with jumps
            v = np.repeat(
                levels[g] + rng.normal(0, 5, n // 100 + 1), 100
            )[:n]
        elif kind == 1:  # random walk
            v = levels[g] + np.cumsum(rng.normal(0, 0.3, n))
        elif kind == 2:  # linear ramps
            v = levels[g] + np.arange(n) * rng.uniform(-0.5, 0.5)
        else:  # noisy around level
            v = levels[g] + rng.normal(0, abs(levels[g]) * 0.02 + 0.5, n)
        V[:, g] = v.astype(np.float32)
    # churn: re-level random spans of random members (split/join pressure)
    for _ in range(int(rng.integers(0, 4))):
        g = int(rng.integers(0, G))
        a = int(rng.integers(0, n - 20))
        b = a + int(rng.integers(10, 200))
        V[a:b, g] = np.float32(levels[int(rng.integers(0, G))]) + rng.normal(
            0, 0.1, min(b, n) - a
        ).astype(np.float32)
    series = []
    for g in range(G):
        keep = np.ones(n, dtype=bool)
        for _ in range(int(rng.integers(0, 3))):  # per-member gaps
            a = int(rng.integers(0, n - 5))
            keep[a : a + int(rng.integers(2, 40))] = False
        if not keep.any():
            keep[0] = True
        series.append((grid[keep], V[keep, g]))
    eb = float(rng.choice([0.0, 1.0, 10.0]))  # float32-exact bounds only
    sf = float(rng.choice([1.0, 10.0, 100.0]))
    return series, eb, sf


def _java_expected(cases, tmp: Path, keep_kind: bool = False) -> list[list[tuple]]:
    classes = _classes_dir()
    manifest = []
    for ci, case in enumerate(cases):
        series, eb, sf = case[:3]
        lat = case[3] if len(case) > 3 else 0
        paths = []
        for g, (t, v) in enumerate(series):
            p = tmp / f"c{ci}.ts{g + 1}.csv"
            with open(p, "w") as f:
                for tt, vv in zip(t.tolist(), v.tolist()):
                    # positional (non-exponent) shortest float32 repr:
                    # the reference's locale-based CSV parser stops at
                    # 'e', so 8.47e-05 would be read as 8.47
                    f.write(
                        f"{tt},"
                        f"{np.format_float_positional(np.float32(vv), unique=True)}\n"
                    )
            paths.append(str(p))
        out = tmp / f"c{ci}.segments.csv"
        manifest.append(f"{eb} {LB} {SI} {sf} {lat} {out} " + " ".join(paths))
    mpath = tmp / "manifest.txt"
    mpath.write_text("\n".join(manifest) + "\n")
    subprocess.run(
        ["java", "-cp", f"{classes}:{_commons_lang_jar()}",
         "dk.aau.modelardb.core.FuzzHarness", str(mpath)],
        check=True, capture_output=True, timeout=600,
    )
    expected = []
    for ci in range(len(cases)):
        rows = []
        for line in (tmp / f"c{ci}.segments.csv").read_text().splitlines():
            k, st, et, mtid, cnt, hx, gaps = line.split(",")
            gt = tuple(int(g) for g in gaps.split(";")) if gaps else ()
            row = (int(st), int(et), int(mtid), int(cnt), hx, gt)
            rows.append((k,) + row if keep_kind else row)
        expected.append(rows)
    return expected


def _group_matrix(series):
    tids = list(range(1, len(series) + 1))
    all_ts = np.unique(np.concatenate([t for t, _ in series]))
    V = np.full((len(all_ts), len(series)), np.nan, dtype=np.float32)
    for j, (t, v) in enumerate(series):
        V[np.searchsorted(all_ts, t), j] = v
    return all_ts, V, tids


def _isolated_rematch(case, got, tmp_path, ci, keep_kind=False) -> bool:
    """Re-run ONE case in a fresh JVM and compare. The reference drains
    its pending-join set via HashSet identity order
    (SegmentGenerator.java:445 `iterator().next()`), so for join-churn
    cases the segment STREAM ITSELF (not just its order) depends on JVM
    allocation history — several outputs are equally valid reference
    behavior, and which one a batch run produces shifts with unrelated
    heap noise. A fresh single-case JVM gives the canonical allocation
    history; matching there is the strongest reproducible contract."""
    iso = tmp_path / f"iso{ci}"
    iso.mkdir()
    exp = _java_expected([case], iso, keep_kind=keep_kind)[0]
    return got == sorted(exp)


@pytest.mark.parametrize("kind", ["grouped", "single"])
def test_fuzz_bit_match_java(kind, tmp_path):
    rng = np.random.default_rng(2024 if kind == "grouped" else 4048)
    n_cases = 90 if kind == "grouped" else 30
    cases = [_gen_case(rng, force_g1=(kind == "single")) for _ in range(n_cases)]
    expected = _java_expected(cases, tmp_path)
    for ci, (series, eb, sf) in enumerate(cases):
        cfg = EngineConfig(
            error_bound=eb, length_bound=LB, sampling_interval_ms=SI
        )
        if kind == "grouped":
            ts, V, _ = _group_matrix(series)
            segs = compress_group(ts, V, cfg, split_fraction=sf)
            got = sorted(
                (s.start_ts, s.end_ts, s.mtid, s.cnt, s.model.hex(), s.gaps)
                for s in segs
            )
            expected[ci] = sorted(expected[ci])
        else:
            t, v = series[0]
            segs = compress_series(t, v, cfg)
            got = [
                (s.start_ts, s.end_ts, s.mtid, s.cnt, s.model.hex(), ())
                for s in segs
            ]
        if kind == "grouped" and got != expected[ci]:
            # join-churn indeterminism in the reference itself (see
            # _isolated_rematch): accept iff a fresh-JVM rerun matches
            assert _isolated_rematch(cases[ci], got, tmp_path, ci), (
                f"case {ci}: eb={eb} sf={sf} G={len(series)} — diverges "
                f"from the reference in batch AND isolated JVM runs"
            )
            continue
        assert got == expected[ci], (
            f"case {ci}: eb={eb} sf={sf} G={len(series)} — "
            f"{len(got)} vs {len(expected[ci])} segments"
        )


def test_fuzz_latency_temporaries_match_java(tmp_path):
    """maximum_latency fuzz: the interleaved temporary (T) + finalized (F)
    stream — emission cadence, fallback-when-model-short, split/join temp
    re-announcements (SegmentGenerator.java temporary path) — matches the
    reference on 40 seeded random group cases. Content-set comparison for
    the same HashSet-order reason as the grouped fuzz."""
    rng = np.random.default_rng(8096)
    cases = [
        _gen_case(rng, force_g1=False) + (int(rng.choice([17, 40, 100])),)
        for _ in range(40)
    ]
    expected = _java_expected(cases, tmp_path, keep_kind=True)
    for ci, (series, eb, sf, lat) in enumerate(cases):
        cfg = EngineConfig(
            error_bound=eb, length_bound=LB, sampling_interval_ms=SI
        )
        ts, V, _ = _group_matrix(series)
        segs = compress_group(
            ts, V, cfg, split_fraction=sf, maximum_latency=lat
        )
        got = sorted(
            (s.kind, s.start_ts, s.end_ts, s.mtid, s.cnt, s.model.hex(), s.gaps)
            for s in segs
        )
        want = sorted(expected[ci])
        if got != want:
            assert _isolated_rematch(
                cases[ci], got, tmp_path, ci, keep_kind=True
            ), (
                f"case {ci}: eb={eb} sf={sf} lat={lat} G={len(series)} — "
                f"diverges from the reference in batch AND isolated JVM runs"
            )


def test_split_at_prefetched_last_tick_keeps_data():
    """Divergence-by-design, found by tools/deep_fuzz.py (seed 123,
    grouped case 113): the REFERENCE loses the final grid tick for
    members of a group that splits while that tick is prefetched —
    TimeSeriesGroup's split constructor recomputes timeSeriesHasNext
    from the underlying iterators (TimeSeriesGroup.java:72-89) while
    the last point still sits unemitted in nextDataPoints, so the
    child reports hasNext()==false and close() flushes without it.
    OUR engine operates on materialized arrays and keeps the data.

    This test pins our side: every input member-row is covered by
    exactly one emitted segment (no loss, no duplication), and the two
    post-split singleton finals cover through the true last tick.
    deep_fuzz accepts the reference's dropped-tick stream for exactly
    this pattern (reference_tail_drop_equivalent)."""
    import numpy as np

    from modelardb_dynamic_spark.models.grouped import compress_group

    rng = np.random.default_rng(123)
    cases = [_gen_case(rng, force_g1=False) for _ in range(114)]
    series, eb, sf = cases[113]
    assert len(series) == 4
    cfg = EngineConfig(
        error_bound=eb, length_bound=LB, sampling_interval_ms=SI
    )
    ts, V, _ = _group_matrix(series)
    segs = compress_group(ts, V, cfg, split_fraction=sf)
    total = sum(
        (len(series) - len(s.gaps)) * s.cnt for s in segs
    )
    truth = sum(len(t) for t, _ in series)
    assert total == truth  # every member-row covered exactly once
    last_ts = max(int(t[-1]) for t, _ in series)
    finals = [
        s for s in segs if s.start_ts == last_ts - SI and len(s.gaps) == 3
    ]
    assert len(finals) == 2  # the two post-split singletons
    for s in finals:
        assert s.end_ts == last_ts and s.cnt == 2  # last tick KEPT


def test_dropped_tick_forming_new_segment_keeps_data():
    """Second shape of the same reference divergence-by-design, found
    by tools/deep_fuzz.py (seed 20260821, grouped case 105): when the
    final grid tick would have BEGUN a new segment for the split
    members, the reference emits NOTHING for it (TimeSeriesGroup.java:
    72-89 drops the prefetched tick on split), so our stream carries
    got-only SINGLETONS with no shortened expected counterpart. This
    pins our side: exact full coverage, and the two singleton finals
    at the true last tick. deep_fuzz's reference_tail_drop_equivalent
    accepts the reference's stream for exactly this pattern."""
    import numpy as np

    from modelardb_dynamic_spark.models.grouped import compress_group

    rng = np.random.default_rng(20260821)
    cases = [_gen_case(rng, force_g1=False) for _ in range(106)]
    series, eb, sf = cases[105]
    assert len(series) == 4
    cfg = EngineConfig(
        error_bound=eb, length_bound=LB, sampling_interval_ms=SI
    )
    ts, V, _ = _group_matrix(series)
    segs = compress_group(ts, V, cfg, split_fraction=sf)
    total = sum((len(series) - len(s.gaps)) * s.cnt for s in segs)
    truth = sum(len(t) for t, _ in series)
    assert total == truth  # every member-row covered exactly once
    last_ts = max(int(t[-1]) for t, _ in series)
    singles = [
        s for s in segs
        if s.start_ts == last_ts and s.end_ts == last_ts and s.cnt == 1
    ]
    assert len(singles) == 2  # the two post-split singleton finals
    for s in singles:
        assert len(s.gaps) == 3  # each covers exactly one member
