"""Randomized Spark-engine vs EmbeddedEngine differential: the same SQL
over the same segment store must return the same rows from both host
engines — the reference's two-engine contract (Spark.scala vs
H2.scala over one storage layer; H2Test.scala pins it with one known
stream, this fuzz pins it with seeded random stores x random windows).

Integer aggregates and raw decoded points must match EXACTLY (both
engines decode with the same numpy/C kernels); double aggregates over
stored float summaries (SUM_S/AVG_S and min/max/avg over DataPoint)
are compared to 1e-9 relative — summation ORDER is engine-scheduled,
so last-ulp drift is legitimate there and only there.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.embedded import EmbeddedEngine
from modelardb_dynamic_spark.engine import ModelarEngine
from modelardb_dynamic_spark.operators.compress import compress

SI = 60_000
T0 = 1_700_000_000_000 - (1_700_000_000_000 % SI)


def _random_store(spark, tmp_path, seed: int, eb: float):
    """Seeded random multi-series raw frame -> compressed parquet store.

    Mix of regimes per series (constant / ramp / noise / regime-switch)
    with random gaps, so every model type and the gap sentinel appear.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(rng.integers(3, 7)):
        sid = f"s{s}"
        n = int(rng.integers(50, 400))
        kind = rng.integers(0, 4)
        if kind == 0:
            v = np.full(n, float(rng.integers(1, 50)))
        elif kind == 1:
            v = np.arange(n) * float(rng.uniform(0.1, 3.0)) + 5.0
        elif kind == 2:
            v = rng.normal(20, 5, n)
        else:
            v = np.where(np.arange(n) % 37 < 20, 7.0, rng.normal(40, 2, n))
        keep = rng.random(n) > 0.12  # ~12% gaps
        for i in np.nonzero(keep)[0]:
            rows.append((sid, "turn_rate", T0 + int(i) * SI, float(v[i])))
    raw = spark.createDataFrame(
        rows, "sid string, metric string, ts_ms long, value double"
    )
    cfg = EngineConfig(error_bound=eb, sampling_interval_ms=SI)
    path = str(tmp_path / f"store_{seed}_{int(eb)}")
    compress(raw, cfg).write.mode("overwrite").parquet(path)
    spark_eng = ModelarEngine(spark, spark.read.parquet(path), cfg)
    spark_eng.register_views()
    return spark_eng, EmbeddedEngine(path)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
    return (
        df.sort_values(list(df.columns))
        .reset_index(drop=True)
        .sort_index(axis=1)
    )


def _compare(spark_df, duck_tbl, float_rtol: float | None):
    a = _norm(spark_df.toPandas())
    b = _norm(duck_tbl.to_pandas())
    assert list(a.columns) == list(b.columns), (a.columns, b.columns)
    assert len(a) == len(b), (len(a), len(b))
    for c in a.columns:
        if float_rtol is not None and a[c].dtype.kind == "f":
            assert np.allclose(
                a[c].to_numpy(), b[c].to_numpy(),
                rtol=float_rtol, atol=0.0, equal_nan=True,
            ), c
        else:
            assert a[c].tolist() == b[c].tolist(), c


def _queries(rng, lo_all: int, hi_all: int, sids: list[str]):
    """Random (sql, float_rtol) cases over a random time window / sid set."""
    span = hi_all - lo_all
    lo = lo_all + int(rng.integers(0, max(span // 2, 1)))
    hi = lo + int(rng.integers(span // 8 + 1, span + 1))
    pick = sorted(
        rng.choice(sids, size=max(1, len(sids) // 2), replace=False)
    )
    in_list = ", ".join(f"'{s}'" for s in pick)
    return [
        (
            "SELECT sid, COUNT_S(#) AS c, MIN_S(#) AS mn, MAX_S(#) AS mx, "
            "SUM_S(#) AS sm, AVG_S(#) AS av FROM Segment "
            f"WHERE start_ts >= {lo} AND end_ts <= {hi} "
            "GROUP BY sid ORDER BY sid",
            1e-9,  # SUM_S/AVG_S sum stored doubles in engine order
        ),
        (
            "SELECT sid, ts_ms, value FROM DataPoint "
            f"WHERE ts_ms >= {lo} AND ts_ms <= {hi} AND sid IN ({in_list})",
            None,  # raw decoded points: bit-identical kernels
        ),
        (
            "SELECT sid, count(*) AS n, min(value) AS mn, max(value) AS mx "
            f"FROM DataPoint WHERE ts_ms BETWEEN {lo} AND {hi} "
            "GROUP BY sid ORDER BY sid",
            None,  # min/max pick existing float32 values: order-free
        ),
        (
            "SELECT sid, start_ts, end_ts, cnt FROM Segment "
            f"WHERE start_ts >= {lo} AND end_ts <= {hi} "
            f"AND sid IN ({in_list})",
            None,  # raw segment rows: exact
        ),
        (
            # a non-timestamp predicate the pushdown walk must IGNORE
            # (prune on ts only, re-filter value exactly)
            "SELECT sid, ts_ms, value FROM DataPoint "
            f"WHERE ts_ms BETWEEN {lo} AND {hi} AND value >= 15",
            None,
        ),
    ]


@pytest.mark.parametrize("seed,eb", [(1, 0.0), (2, 10.0), (3, 5.0)])
def test_spark_vs_embedded_fuzz(spark, tmp_path, seed, eb):
    spark_eng, emb = _random_store(spark, tmp_path, seed, eb)
    import pyspark.sql.functions as F

    seg = spark_eng.segments.agg(
        F.min("start_ts"), F.max("end_ts")
    ).collect()[0]
    lo_all, hi_all = int(seg[0]), int(seg[1])
    sids = [r[0] for r in spark_eng.segments.select("sid").distinct().collect()]
    rng = np.random.default_rng(seed * 1009)
    for round_ in range(3):
        for sql, rtol in _queries(rng, lo_all, hi_all, sids):
            _compare(spark_eng.sql(sql), emb.sql(sql), rtol)
