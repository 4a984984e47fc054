"""Engine facade + source readers: SQL views with '#' rewrites, pruned
point queries, derived series, CSV/parquet reader parity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.engine import ModelarEngine
from modelardb_dynamic_spark.operators.compress import compress
from modelardb_dynamic_spark.sources import readers
from modelardb_dynamic_spark.sources.timeseries import transcript_series
from modelardb_dynamic_spark.sources.transcripts import generate_transcripts

CFG0 = EngineConfig(error_bound=0.0, sampling_interval_ms=60_000)


@pytest.fixture(scope="module")
def engine(spark):
    tr = generate_transcripts(spark, n_convs=10, turns_base=48)
    series = transcript_series(tr, 60_000).cache()
    segs = compress(series, CFG0).cache()
    e = ModelarEngine(spark, segs, CFG0)
    e.register_views()
    return e, series


def test_sql_udaf_rewrites_match_raw(spark, engine):
    e, series = engine
    got = e.sql(
        "SELECT sid, COUNT_S(#) AS cnt, MIN_S(#) AS mn, MAX_S(#) AS mx, "
        "SUM_S(#) AS sm, AVG_S(#) AS av FROM Segment "
        "WHERE metric = 'turn_rate' GROUP BY sid"
    )
    raw = (
        series.where("metric = 'turn_rate'")
        .groupBy("sid")
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            F.sum(F.col("value").cast("double")).alias("sm"),
            F.avg(F.col("value").cast("double")).alias("av"),
        )
    )
    j = got.join(raw.withColumnsRenamed(
        {"cnt": "rcnt", "mn": "rmn", "mx": "rmx", "sm": "rsm", "av": "rav"}
    ), "sid")
    bad = j.where(
        "cnt != rcnt OR mn != rmn OR mx != rmx "
        "OR abs(sm - rsm) > 1e-6 OR abs(av - rav) > 1e-9"
    )
    assert bad.count() == 0


def test_hash_rewrite_expands_columns(spark, engine):
    e, _ = engine
    df = e.sql("SELECT # FROM Segment LIMIT 1")
    assert df.columns == [
        "sid", "metric", "start_ts", "end_ts", "si", "mtid", "model",
        "cnt", "vmin", "vmax", "vsum",
    ]


def test_datapoint_view_equals_pruned_method(spark, engine):
    e, series = engine
    lo, hi = series.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
    mid = (lo + hi) // 2
    via_view = e.sql(
        f"SELECT * FROM DataPoint WHERE ts_ms BETWEEN {lo} AND {mid}"
    )
    via_method = e.datapoints(lo_ms=lo, hi_ms=mid)
    assert via_view.exceptAll(via_method).count() == 0
    assert via_method.exceptAll(via_view).count() == 0
    assert via_method.count() > 0


def test_derived_series(spark, engine):
    e, series = engine
    e.register_derived(
        "turn_rate_x60", "turn_rate", F.col("value") * 60.0
    )
    d = e.sql(
        "SELECT sid, ts_ms, value FROM DataPoint WHERE metric = 'turn_rate_x60'"
    ).withColumnRenamed("value", "dval")
    base = series.where("metric = 'turn_rate'")
    j = d.join(base, ["sid", "ts_ms"])
    assert j.count() == base.count()
    assert j.where("abs(dval - value * 60.0) > 1e-4").count() == 0


def test_csv_reader_roundtrip(spark, tmp_path):
    p = str(tmp_path / "series.csv")
    with open(p, "w") as f:
        f.write("ts,value\n")
        for i, v in [(100, 115.0), (200, 765.0), (300, 765.0), (400, 128.0)]:
            f.write(f"{i},{v}\n")
    df = readers.series_from_csv(spark, p, sid="s1", ts_format="java")
    rows = df.orderBy("ts_ms").collect()
    assert [r["ts_ms"] for r in rows] == [100, 200, 300, 400]
    assert [r["value"] for r in rows] == [115.0, 765.0, 765.0, 128.0]
    assert rows[0]["sid"] == "s1"
    # scaling factor divides values (reference scalingFactor semantics)
    scaled = readers.series_from_csv(
        spark, p, sid="s1", ts_format="java", scaling_factor=2.0
    )
    assert scaled.orderBy("ts_ms").collect()[0]["value"] == 57.5


def test_table_reader_matches_event_series_shape(spark, tmp_path):
    ev = spark.createDataFrame(
        [("u1", 1_700_000_000_000, 2.0), ("u2", 1_700_000_060_000, 4.0)],
        "user_id string, ts_ms long, v double",
    )
    out = readers.series_from_table(ev, "user_id", "ts_ms", "v", metric="m")
    assert out.columns == ["sid", "metric", "ts_ms", "value"]
    assert out.count() == 2


def test_gap_fill_long_span_chunked(spark):
    """Multi-year span at 1m buckets: the chunked two-level explode fills
    every bucket without a single giant per-row array."""
    import pandas as pd
    from pyspark.sql import functions as F

    from modelardb_dynamic_spark.operators.rollup import gap_fill

    bucket = 60_000
    lo = 1_700_000_000_000 - (1_700_000_000_000 % bucket)
    hi = lo + 3 * 365 * 86_400_000  # 3 years -> ~1.58M minute buckets
    tier = spark.createDataFrame(
        pd.DataFrame(
            {
                "sid": ["s"] * 2,
                "metric": ["m"] * 2,
                "bucket_ts": [lo, hi],
                "cnt": [3, 4],
                "vsum": [1.0, 2.0],
                "vmin": [1.0, 2.0],
                "vmax": [1.0, 2.0],
            }
        )
    )
    filled = gap_fill(tier, bucket, chunk_buckets=4096)
    n = filled.count()
    assert n == (hi - lo) // bucket + 1
    assert filled.where(F.col("cnt") == 0).count() == n - 2
    # spot-check boundaries survived the chunking
    row = filled.where(F.col("bucket_ts") == hi).collect()[0]
    assert row["cnt"] == 4 and row["vsum"] == 2.0


def test_calendar_agg_timezone_dst(spark):
    """calendar_agg(tz=) composes hourly partials in the target zone; a
    whole-hour-offset zone stays exact across the DST fall-back (the
    reference inherits the JVM default Calendar zone, Segment.java:135)."""
    import pandas as pd

    from modelardb_dynamic_spark.operators.rollup import calendar_agg

    # hourly buckets spanning the 2023-11-05 America/New_York fall-back
    # (06:00 UTC): UTC hours 04..08 are NY hours 0,1,1,2,3
    hours_utc = [
        1699156800000,  # 2023-11-05 04:00 UTC = 00:00 EDT
        1699160400000,  # 05:00 UTC = 01:00 EDT
        1699164000000,  # 06:00 UTC = 01:00 EST (repeated local hour)
        1699167600000,  # 07:00 UTC = 02:00 EST
        1699171200000,  # 08:00 UTC = 03:00 EST
    ]
    tier = spark.createDataFrame(
        pd.DataFrame(
            {
                "sid": ["s"] * 5,
                "metric": ["m"] * 5,
                "bucket_ts": hours_utc,
                "cnt": [1, 2, 4, 8, 16],
                "vsum": [1.0, 2.0, 4.0, 8.0, 16.0],
                "vmin": [1.0] * 5,
                "vmax": [1.0] * 5,
            }
        )
    )
    got = {
        r["hour_of_day"]: r["cnt"]
        for r in calendar_agg(
            tier, "hour_of_day", tz="America/New_York"
        ).collect()
    }
    assert got == {0: 1, 1: 6, 2: 8, 3: 16}
    utc = {
        r["hour_of_day"]: r["cnt"]
        for r in calendar_agg(tier, "hour_of_day").collect()
    }
    assert utc == {4: 1, 5: 2, 6: 4, 7: 8, 8: 16}


def test_calendar_agg_rejects_fractional_offset_zone(spark):
    """ADVICE r3: the tz exactness condition is enforced — Asia/Kolkata
    (+05:30) on the hour tier raises instead of silently mis-bucketing;
    the minute tier accepts it."""
    import pytest as _pytest

    from modelardb_dynamic_spark.operators.rollup import calendar_agg

    tier = spark.createDataFrame(
        [("a", "m", 0, 1, 1.0, 1.0, 1.0)],
        "sid string, metric string, bucket_ts long, cnt long, "
        "vsum double, vmin double, vmax double",
    )
    with _pytest.raises(ValueError, match="not exact"):
        calendar_agg(tier, "hour_of_day", tz="Asia/Kolkata")
    # a :30-offset zone IS exact on the minute tier
    calendar_agg(tier, "minute", tz="Asia/Kolkata")
    # and a whole-hour zone stays accepted on the hour tier
    calendar_agg(tier, "hour_of_day", tz="America/New_York")
