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
