"""Streaming peak-concurrency gauge (streaming/concurrency.py): closed
buckets must equal the batch peak_concurrency rows exactly; late
deltas are dropped and counted."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from modelardb_dynamic_spark.operators.analytics import peak_concurrency
from modelardb_dynamic_spark.streaming.concurrency import stream_concurrency

B = 1000


def _run(spark, deltas_rows, d, n_chunks=3, name="stream_conc_t"):
    n = len(deltas_rows)
    per = n // n_chunks + 1
    for i in range(n_chunks):
        chunk = deltas_rows[i * per : (i + 1) * per]
        if not chunk:
            continue
        spark.createDataFrame(chunk, "t long, d int").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"chunk={i}"))
    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    q = (
        stream_concurrency(stream, B)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def test_streamed_concurrency_equals_batch(spark, tmp_path):
    rng = random.Random(11)
    sess = [(rng.randint(0, 9000), rng.randint(1, 1500)) for _ in range(80)]
    sdf = spark.createDataFrame(
        [(a, a + dur) for a, dur in sess], "start_ms long, end_ms long"
    )
    batch = {
        r.bucket_ts: (r.peak, r.peak_at_ms)
        for r in peak_concurrency(sdf, B).collect()
    }
    # boundary deltas in time order (the stream contract)
    deltas = sorted(
        [(a, 1) for a, dur in sess] + [(a + dur + 1, -1) for a, dur in sess]
    )
    streamed = _run(spark, deltas, str(tmp_path))
    got = {r.bucket_ts: (r.peak, r.peak_at_ms) for r in streamed.collect()}
    frontier = max(batch)
    closed = {k: v for k, v in batch.items() if k < frontier}
    assert got == closed
    assert all(r.n_late_dropped == 0 for r in streamed.collect())


def test_streamed_concurrency_counts_late(spark, tmp_path):
    d = str(tmp_path)
    # chunk 0 reaches t=2500 (closes buckets 0,1); chunk 1 has a late
    # t=1500 delta (dropped+counted) and t=3500 (closes bucket 2)
    c0 = [(100, 1), (200, 1), (1200, -1), (2500, 1)]
    c1 = [(1500, 1), (3500, -1)]
    for i, rows in enumerate((c0, c1)):
        spark.createDataFrame(rows, "t long, d int").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"chunk={i}"))
    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    q = (
        stream_concurrency(stream, B)
        .writeStream.format("memory")
        .queryName("stream_conc_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.bucket_ts: r for r in spark.table("stream_conc_late").collect()}
    assert rows[0].peak == 2 and rows[0].peak_at_ms == 200
    assert rows[1000].peak == 1 and rows[1000].peak_at_ms == 1200
    # t=2500 start on top of the one still-open session -> gauge 2
    assert rows[2000].peak == 2
    assert rows[2000].n_late_dropped == 1  # the t=1500 straggler
