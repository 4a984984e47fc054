"""Streaming SLO burn pager (streaming/sloburn.py): closed-bucket rows
must equal the batch slo_burn rows — every column, exact, including the
float burn rates — and late buckets must be dropped and counted."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from modelardb_dynamic_spark.operators.analytics import slo_burn
from modelardb_dynamic_spark.streaming.sloburn import stream_slo_burn


def _events_df(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(10):
        n_err = 30 if h in (6, 7) else 0
        for i in range(70 + (30 - n_err)):
            rows.append((base + dt.timedelta(hours=h, seconds=i), "ok"))
        for i in range(n_err):
            rows.append(
                (base + dt.timedelta(hours=h, seconds=200 + i), "error")
            )
    return spark.createDataFrame(rows, "ts timestamp, event_type string")


def _run_stream(spark, ev, d, n_chunks=4):
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / n_chunks
    for i in range(n_chunks):
        a = lo + i * span
        b = lo + (i + 1) * span + dt.timedelta(seconds=1 if i == n_chunks - 1 else 0)
        (
            ev.where((F.col("ts") >= a) & (F.col("ts") < b))
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
    out = stream_slo_burn(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_slo_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table("stream_slo_t")


def test_streamed_slo_burn_equals_batch_closed_buckets(spark, tmp_path):
    ev = _events_df(spark)
    streamed = _run_stream(spark, ev, str(tmp_path))
    batch = slo_burn(ev)

    def keyed(df):
        return {
            r.bucket_ts: (
                r.err_s, r.tot_s, r.err_l, r.tot_l,
                r.burn_short, r.burn_long, r.page,
            )
            for r in df.collect()
        }

    got, want = keyed(streamed), keyed(batch)
    frontier = max(want)
    closed = {k: v for k, v in want.items() if k < frontier}
    assert set(got) == set(closed)
    for k in closed:
        assert got[k] == closed[k], k  # exact, including float burns
    # the double-hot window pages in both
    assert any(r.page for r in streamed.collect())
    assert all(r.n_late_dropped == 0 for r in streamed.collect())


def test_streamed_slo_burn_drops_late_buckets(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    d = str(tmp_path)
    # chunk 0: hours 0 and 2 (closes 0; 2 stays open... then 1 is late)
    c0 = [(base + dt.timedelta(hours=0, seconds=i), "ok") for i in range(5)]
    c0 += [(base + dt.timedelta(hours=2, seconds=i), "ok") for i in range(5)]
    # chunk 1: hour 1 (late: 2 already superseded it? no — 1 < hwm only
    # if a bucket after 1 CLOSED; closing happened for 0 and... hour 2 is
    # open, hwm = 0 -> hour-1 rows are NOT late yet, they re-open 1? They
    # arrive with h=1 > hwm=0 -> accepted, then hour 3 closes 1 and 2.
    c1 = [(base + dt.timedelta(hours=1, seconds=i), "ok") for i in range(5)]
    c1 += [(base + dt.timedelta(hours=3, seconds=i), "ok") for i in range(5)]
    # chunk 2: hour 1 again — NOW late (hwm = 2), dropped and counted
    c2 = [(base + dt.timedelta(hours=1, seconds=30 + i), "ok") for i in range(4)]
    c2 += [(base + dt.timedelta(hours=4, seconds=i), "ok") for i in range(5)]
    for i, rows in enumerate((c0, c1, c2)):
        spark.createDataFrame(rows, "ts timestamp, event_type string").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(d, f"chunk={i}"))
    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    out = stream_slo_burn(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_slo_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r.bucket_ts // 3_600_000 - 473352: r
        for r in spark.table("stream_slo_late").collect()
    }
    H = 3_600_000
    got = {r.bucket_ts: r for r in spark.table("stream_slo_late").collect()}
    base_ms = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    h1 = got[base_ms + 1 * H]
    assert h1.tot_s == 5  # only the in-time hour-1 rows scored
    last = got[max(got)]
    assert last.n_late_dropped == 4  # the chunk-2 hour-1 stragglers
