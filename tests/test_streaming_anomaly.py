"""Streaming rolling z-score (streaming/anomaly.py): the scored append
stream must equal the batch rolling_zscore over the same points — every
column, exact, including the float z (identical IEEE ops) — and late
rows must be dropped per the in-order contract."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from modelardb_dynamic_spark.operators.analytics import rolling_zscore
from modelardb_dynamic_spark.streaming.anomaly import stream_zscore

W, MINP, K = 10, 5, 3


def _points_df(spark):
    rng = np.random.default_rng(31)
    rows = []
    for sid in ("a", "b", "c"):
        vals = rng.integers(10, 40, size=60)
        vals[45] = 500  # guaranteed spike
        rows += [
            (sid, i * 60_000, int(v)) for i, v in enumerate(vals)
        ]
    return spark.createDataFrame(rows, "sid string, ts_ms long, v long")


def _run_stream(spark, pts, d, n_chunks=5):
    lo, hi = pts.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
    span = (hi - lo) // n_chunks + 1
    for i in range(n_chunks):
        (
            pts.where(
                (F.col("ts_ms") >= lo + i * span)
                & (F.col("ts_ms") < lo + (i + 1) * span)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"chunk={i}"))
        )
    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    scored = stream_zscore(stream, W, MINP, K)
    q = (
        scored.writeStream.format("memory")
        .queryName("stream_zscore_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("stream_zscore_t")


def test_streamed_zscore_equals_batch(spark, tmp_path):
    pts = _points_df(spark)
    streamed = _run_stream(spark, pts, str(tmp_path))
    batch = rolling_zscore(pts, W, MINP, K)

    def keyed(df):
        return {
            (r.sid, r.ts_ms): (r.v, r.n_w, r.s_w, r.ss_w, r.z, r.is_anomaly)
            for r in df.collect()
        }

    got, want = keyed(streamed), keyed(batch)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == want[key], key  # exact, including float z
    # the planted spike is flagged
    assert any(r.is_anomaly for r in streamed.collect())


def test_streamed_zscore_drops_late_rows(spark, tmp_path):
    d = str(tmp_path)
    first = spark.createDataFrame(
        [("s", i * 1000, 10) for i in range(8)],
        "sid string, ts_ms long, v long",
    )
    late = spark.createDataFrame(
        [("s", 3_000, 99), ("s", 9_000, 11)],  # one late, one fresh
        "sid string, ts_ms long, v long",
    )
    first.coalesce(1).write.parquet(os.path.join(d, "chunk=0"))
    late.coalesce(1).write.parquet(os.path.join(d, "chunk=1"))
    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    q = (
        stream_zscore(stream, W, MINP, K)
        .writeStream.format("memory")
        .queryName("stream_zscore_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.ts_ms: r for r in spark.table("stream_zscore_late").collect()}
    assert 9_000 in rows  # fresh row scored
    assert rows[3_000].v == 10  # late duplicate dropped: original stands
    assert len(rows) == 9
    # the drop is counted, never silent: the second chunk's emitted row
    # carries the cumulative late counter
    assert rows[9_000].n_late_dropped == 1
    assert rows[7_000].n_late_dropped == 0  # first chunk saw no lateness


def test_stream_ohlc_matches_batch_at_frontier(spark, tmp_path):
    """Streamed closed-bucket bars equal the batch operator's rows for
    every non-frontier bucket, across a two-chunk state handoff."""
    import os

    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import ohlc_bars
    from modelardb_dynamic_spark.streaming.ohlc import stream_ohlc

    rng = np.random.default_rng(3)
    rows = []
    for sid in ("a", "b"):
        for i in range(500):
            # irregular minute-ish grid with gaps
            t = i * 60_000 + (7_000 if sid == "b" else 0)
            if rng.integers(0, 10) == 0:
                continue
            rows.append((sid, t, int(rng.integers(1, 100))))
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    mid = 250 * 60_000
    d = str(tmp_path / "ohlc")
    pts.where(f"ts_ms <= {mid}").coalesce(1).write.parquet(
        os.path.join(d, "chunk=0")
    )
    pts.where(f"ts_ms > {mid}").coalesce(1).write.parquet(
        os.path.join(d, "chunk=1")
    )
    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    q = (
        stream_ohlc(stream, bucket_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("t_ohlc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.sid, r.bucket_ts): r for r in spark.table("t_ohlc").collect()
    }
    batch = ohlc_bars(pts, bucket_ms=3_600_000)
    frontier = {
        r.sid: r.mx
        for r in batch.groupBy("sid").agg(
            F.max("bucket_ts").alias("mx")
        ).collect()
    }
    want = {
        (r.sid, r.bucket_ts): r
        for r in batch.collect()
        if r.bucket_ts != frontier[r.sid]
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for c in (
            "ts_first", "ts_last", "v_open", "v_close", "v_min", "v_max",
            "n", "vsum",
        ):
            assert getattr(g, c) == getattr(w, c), (k, c)
        assert g.n_late_dropped == 0


def test_stream_ohlc_counts_late_rows(spark, tmp_path):
    import os

    from modelardb_dynamic_spark.streaming.ohlc import stream_ohlc

    rows0 = [("a", t * 60_000, t + 1) for t in range(120)]
    rows1 = [("a", 30 * 60_000, 99), ("a", 200 * 60_000, 7)]  # one late
    p0 = spark.createDataFrame(rows0, "sid string, ts_ms long, v long")
    p1 = spark.createDataFrame(rows1, "sid string, ts_ms long, v long")
    d = str(tmp_path / "late")
    p0.coalesce(1).write.parquet(os.path.join(d, "chunk=0"))
    p1.coalesce(1).write.parquet(os.path.join(d, "chunk=1"))
    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    q = (
        stream_ohlc(stream, bucket_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("t_ohlc_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = {r.bucket_ts: r for r in spark.table("t_ohlc_late").collect()}
    # the late row (ts 30min <= hwm 119min) was dropped and counted on
    # the bar emitted after it
    assert out[3_600_000].n_late_dropped == 1
    # and it did NOT mutate the already-closed first bar's values
    assert out[0].n == 60 and out[0].v_open == 1 and out[0].v_close == 60


def test_stream_ewma_matches_batch_at_frontier(spark, tmp_path):
    """Streamed closed-bucket levels/forecasts equal the batch
    ewma_levels rows (float-exact) for every non-frontier bucket."""
    import math
    import os

    import numpy as np

    from modelardb_dynamic_spark.operators.analytics import ewma_levels
    from modelardb_dynamic_spark.streaming.ewma import stream_ewma

    rng = np.random.default_rng(9)
    rows = []
    for sid in ("a", "b"):
        for i in range(400):
            t = i * 60_000 + (11_000 if sid == "b" else 0)
            if rng.integers(0, 8) == 0:
                continue  # gaps
            rows.append((sid, t, int(rng.integers(1, 500))))
    pts = spark.createDataFrame(rows, "sid string, ts_ms long, v long")
    d = str(tmp_path / "ewma")
    mid = 200 * 60_000
    pts.where(f"ts_ms <= {mid}").coalesce(1).write.parquet(
        os.path.join(d, "chunk=0")
    )
    pts.where(f"ts_ms > {mid}").coalesce(1).write.parquet(
        os.path.join(d, "chunk=1")
    )
    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    q = (
        stream_ewma(stream, bucket_ms=3_600_000, alpha=0.3)
        .writeStream.format("memory")
        .queryName("t_ewma")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {(r.sid, r.bucket_ts): r for r in spark.table("t_ewma").collect()}
    batch = ewma_levels(pts, bucket_ms=3_600_000, alpha=0.3)
    frontier = {
        r.sid: r.mx
        for r in batch.groupBy("sid").agg(
            F.max("bucket_ts").alias("mx")
        ).collect()
    }
    want = {
        (r.sid, r.bucket_ts): r
        for r in batch.collect()
        if r.bucket_ts != frontier[r.sid]
    }
    assert set(got) == set(want) and len(want) > 6
    for k, w in want.items():
        g = got[k]
        assert g.n == w.n, k
        assert g.level == w.level, k  # bit-exact float
        assert (g.forecast is None) == (w.forecast is None), k
        if w.forecast is not None:
            assert g.forecast == w.forecast and g.abs_err == w.abs_err, k
        assert g.n_late_dropped == 0
