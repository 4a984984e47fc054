"""EmbeddedEngine (DuckDB twin of the reference's H2 engine): same segment
store, same model kernels, same answers as the Spark engine.

Mirrors the reference's H2 engine-integration strategy (H2Test.scala:55-107:
real SQL through the embedded engine over a real segment store must match
the known point stream)."""

from __future__ import annotations

import pytest

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.embedded import EmbeddedEngine, _extract_point_bounds
from modelardb_dynamic_spark.engine import ModelarEngine
from modelardb_dynamic_spark.operators.compress import compress
from modelardb_dynamic_spark.sources.timeseries import transcript_series
from modelardb_dynamic_spark.sources.transcripts import generate_transcripts

CFG0 = EngineConfig(error_bound=0.0, sampling_interval_ms=60_000)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """One segment store written by the Spark pipeline, opened by both
    engines — the shared-storage contract (storage/ParquetStorage.scala
    serves Spark and H2 alike)."""
    path = str(tmp_path_factory.mktemp("segstore") / "segments")
    tr = generate_transcripts(spark, n_convs=8, turns_base=40)
    segs = compress(transcript_series(tr, 60_000), CFG0)
    segs.write.mode("overwrite").parquet(path)
    spark_engine = ModelarEngine(spark, spark.read.parquet(path), CFG0)
    spark_engine.register_views()
    return spark_engine, EmbeddedEngine(path)


def _sorted_rows(tbl, cols, keep=None):
    df = tbl.to_pandas() if not hasattr(tbl, "toPandas") else tbl.toPandas()
    return df[cols + (keep or [])].sort_values(cols).reset_index(drop=True)


def test_udaf_twins_match_spark_engine(store):
    spark_engine, emb = store
    q = (
        "SELECT sid, COUNT_S(#) AS cnt, MIN_S(#) AS mn, MAX_S(#) AS mx, "
        "SUM_S(#) AS sm, AVG_S(#) AS av FROM Segment "
        "WHERE metric = 'turn_rate' GROUP BY sid"
    )
    want = _sorted_rows(spark_engine.sql(q), ["sid", "cnt", "mn", "mx", "sm", "av"])
    got = _sorted_rows(emb.sql(q), ["sid", "cnt", "mn", "mx", "sm", "av"])
    assert list(got["sid"]) == list(want["sid"])
    assert list(got["cnt"]) == list(want["cnt"])
    for c in ("mn", "mx", "sm", "av"):
        assert (got[c] - want[c]).abs().max() < 1e-6


def test_macros_callable_without_sugar(store):
    _, emb = store
    tbl = emb.sql(
        "SELECT metric, COUNT_S(start_ts, end_ts, si) AS pts "
        "FROM Segment GROUP BY metric ORDER BY metric"
    )
    assert tbl.num_rows >= 1 and all(n > 0 for n in tbl.column("pts").to_pylist())


def test_datapoint_range_matches_spark(store):
    spark_engine, emb = store
    # pick a window interior to the data
    lo, hi = (
        spark_engine.segments.selectExpr(
            "min(start_ts) + 20*60000 AS lo", "min(start_ts) + 200*60000 AS hi"
        ).first()
    )
    want = _sorted_rows(
        spark_engine.datapoints(lo_ms=lo, hi_ms=hi).select(
            "sid", "metric", "ts_ms", "value"
        ),
        ["sid", "metric", "ts_ms"],
        keep=["value"],
    )
    got = _sorted_rows(
        emb.sql(
            f"SELECT sid, metric, ts_ms, value FROM DataPoint "
            f"WHERE ts_ms >= {lo} AND ts_ms <= {hi}"
        ),
        ["sid", "metric", "ts_ms"],
        keep=["value"],
    )
    assert len(got) == len(want) > 0
    assert list(got["ts_ms"]) == list(want["ts_ms"])
    assert (got["value"] - want["value"]).abs().max() == 0  # eb0: bit-exact


def test_calendar_twin_matches_spark(spark, store):
    spark_engine, emb = store
    want = _sorted_rows(
        spark_engine.calendar("hour_of_day")
        .selectExpr("sid", "metric", "hour_of_day AS hour", "cnt", "vsum", "vavg"),
        ["sid", "metric", "hour"],
        keep=["cnt", "vsum", "vavg"],
    )
    got = emb.calendar("hour").to_pandas()[
        ["sid", "metric", "hour", "cnt", "vsum", "vavg"]
    ]
    got = got.sort_values(["sid", "metric", "hour"]).reset_index(drop=True)
    assert list(got["cnt"]) == list(want["cnt"])
    # the Spark tier path keeps the reference's float32 PMC vsum quirk
    # (PMC_MeanModelType.java:148-150); the embedded path sums exact
    # doubles over the reconstruction — equal to float32 rounding.
    rel = (got["vsum"] - want["vsum"]).abs() / want["vsum"].abs().clip(lower=1.0)
    assert rel.max() < 1e-5
    assert (got["vavg"] - want["vavg"]).abs().max() < 1e-3


def test_pushdown_extraction_is_conservative():
    lo, hi, sids, metrics = _extract_point_bounds(
        "SELECT * FROM DataPoint WHERE ts_ms >= 100 AND ts_ms < 900 "
        "AND sid IN ('a', 'b') AND metric = 'turn_rate' AND value > 0"
    )
    assert (lo, hi, sids, metrics) == (100, 900, {"a", "b"}, {"turn_rate"})
    # an OR anywhere disables extraction entirely (soundness first)
    assert _extract_point_bounds(
        "SELECT * FROM DataPoint WHERE ts_ms >= 100 OR sid = 'a'"
    ) == (None, None, None, None)
    lo, hi, sids, metrics = _extract_point_bounds(
        "SELECT * FROM DataPoint WHERE ts_ms BETWEEN 5 AND 10 AND sid = 'x'"
    )
    assert (lo, hi, sids, metrics) == (5, 10, {"x"}, None)


def test_pruned_window_still_answers_exactly(store):
    """The two-phase contract: extraction only prunes, DuckDB re-filters;
    a query whose WHERE the walker can't fully model is still exact."""
    spark_engine, emb = store
    lo = spark_engine.segments.selectExpr("min(start_ts)").first()[0]
    q = (
        f"SELECT COUNT(*) AS n FROM DataPoint "
        f"WHERE ts_ms >= {lo} AND value >= 0 AND metric = 'turn_rate'"
    )
    got = emb.sql(q).column("n")[0].as_py()
    want = (
        spark_engine.datapoints(lo_ms=lo)
        .where("value >= 0 AND metric = 'turn_rate'")
        .count()
    )
    assert got == want > 0


def test_arrow_table_source(spark, store):
    """EmbeddedEngine accepts an in-memory Arrow segment table (the
    fresh-compress path, no files)."""
    spark_engine, _ = store
    emb = EmbeddedEngine(spark_engine.segments.toArrow())
    n_pts = emb.sql("SELECT COUNT_S(#) AS n FROM Segment").column("n")[0].as_py()
    n_raw = emb.sql("SELECT COUNT(*) AS n FROM DataPoint").column("n")[0].as_py()
    assert n_pts == n_raw > 0
