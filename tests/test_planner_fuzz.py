"""Property fuzz for the tier-selection planner's predicate ALGEBRA
(plans/planner.py): the exact SQL strings Spark executes are evaluated by
DuckDB over brute-force-computed tier tables, and the routed union must
equal the direct aggregate for ARBITRARY (lo, hi, W, high-water) choices.
No SparkSession — hundreds of examples run in seconds, so this covers the
parameter space the four hand-picked Spark cases cannot."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from modelardb_dynamic_spark.plans.planner import _inside_sql, _used_sql

SI = 60_000
HOUR = 3_600_000
DAY = 86_400_000
T0 = 1_704_067_200_000
SPAN = 3 * DAY  # 3 days of minute grid


def _mk_tables(con):
    rng = np.random.default_rng(3)
    frames = []
    for sid in ("a", "b"):
        t = T0 + np.arange(SPAN // SI, dtype=np.int64) * SI
        keep = rng.random(len(t)) > 0.15
        v = rng.integers(0, 100, len(t))[keep]
        frames.append(pd.DataFrame({"sid": sid, "ts_ms": t[keep], "v": v}))
    series = pd.concat(frames)
    con.register("series", series)
    for name, w in (("t1m", SI), ("t1h", HOUR), ("t1d", DAY)):
        con.execute(
            f"CREATE TABLE {name} AS "
            f"SELECT sid, (ts_ms // {w}) * {w} AS bucket_ts, "
            f"count(*) AS cnt, sum(v) AS vsum, min(v) AS vmin, "
            f"max(v) AS vmax FROM series GROUP BY 1, 2"
        )


CON = duckdb.connect()
_mk_tables(CON)
LEVELS = (("t1m", SI), ("t1h", HOUR), ("t1d", DAY))


def _routed_sql(lo, hi, W, hw, lw=None):
    """Assemble the identical branch predicates tiered_agg builds and close
    them with the same groupBy — in SQL, over the DuckDB tier tables."""
    lw = lw or {}
    branches = []
    coarser = []
    for name, w in sorted(LEVELS, key=lambda x: -x[1]):
        pred = _used_sql(
            "bucket_ts", w, coarser, lo, hi, W, hw.get(w), div="//",
            lw=lw.get(w),
        )
        branches.append(
            f"SELECT sid, (bucket_ts // {W}) * {W} AS b, cnt, vsum, vmin, "
            f"vmax FROM {name} WHERE {pred}"
        )
        coarser.append((w, hw.get(w), lw.get(w)))
    raw_not = " AND ".join(
        f"NOT {_inside_sql(f'((ts_ms) // {cw}) * {cw}', cw, lo, hi, W, chw, div='//', lw=clw)}"
        for cw, chw, clw in coarser
    )
    branches.append(
        f"SELECT sid, (ts_ms // {W}) * {W} AS b, 1 AS cnt, v AS vsum, "
        f"v AS vmin, v AS vmax FROM series "
        f"WHERE ts_ms >= {lo} AND ts_ms < {hi} AND {raw_not}"
    )
    u = " UNION ALL ".join(f"({x})" for x in branches)
    return (
        f"SELECT sid, b, sum(cnt) AS cnt, sum(vsum) AS vsum, "
        f"min(vmin) AS vmin, max(vmax) AS vmax FROM ({u}) "
        f"GROUP BY 1, 2 ORDER BY 1, 2"
    )


def _direct_sql(lo, hi, W):
    return (
        f"SELECT sid, (ts_ms // {W}) * {W} AS b, count(*) AS cnt, "
        f"sum(v) AS vsum, min(v) AS vmin, max(v) AS vmax FROM series "
        f"WHERE ts_ms >= {lo} AND ts_ms < {hi} GROUP BY 1, 2 ORDER BY 1, 2"
    )


# DuckDB's // floors like Spark's DIV truncates only for non-negative
# operands — which the planner requires (documented) and these draws honor.
@settings(max_examples=150, deadline=None)
@given(
    lo_off=st.integers(0, SPAN // 2),
    span=st.integers(1, SPAN),
    w_choice=st.sampled_from(
        [SI, 7 * SI, 10 * SI, HOUR, 2 * HOUR, 7 * HOUR, DAY, 2 * DAY]
    ),
    hw_kind=st.sampled_from(["none", "cut", "per_level"]),
    hw_off=st.integers(0, SPAN),
    lw_kind=st.sampled_from(["none", "fine_retained"]),
    lw_off=st.integers(0, SPAN // 2),
)
def test_routed_equals_direct_fuzz(
    lo_off, span, w_choice, hw_kind, hw_off, lw_kind, lw_off
):
    lo = T0 + lo_off
    hi = min(T0 + lo_off + span, T0 + SPAN)
    if hw_kind == "none":
        hw = {}
    elif hw_kind == "cut":
        hw = {w: T0 + hw_off for _, w in LEVELS}
    else:
        # staggered marks: each coarser level lags a further half-day
        hw = {
            w: T0 + max(0, hw_off - i * DAY // 2)
            for i, (_, w) in enumerate(sorted(LEVELS, key=lambda x: x[1]))
        }
    # retention low-water on the FINE tiers only (the realistic shape:
    # 1m/1h retained, 1d keeps history); the fuzz tables keep all rows,
    # so the routed result must STILL equal direct — the cover simply
    # routes around the 'dropped' region via coarser tiers and raw rows
    lw = (
        {SI: T0 + lw_off, HOUR: T0 + (lw_off // DAY) * DAY}
        if lw_kind == "fine_retained"
        else {}
    )
    got = CON.execute(_routed_sql(lo, hi, w_choice, hw, lw)).fetchall()
    want = CON.execute(_direct_sql(lo, hi, w_choice)).fetchall()
    assert got == want
