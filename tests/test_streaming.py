"""Streaming ingest: finalized segments from Structured Streaming must be
exactly the batch compressor's segments at the watermark frontier
(FIXTURES.md §5 streaming invariant; reference online mode §3.3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.operators.compress import SEGMENT_SCHEMA, compress
from modelardb_dynamic_spark.sources.timeseries import transcript_series
from modelardb_dynamic_spark.sources.transcripts import generate_transcripts
from modelardb_dynamic_spark.streaming.ingest import run_to_memory_sink, segment_stream

CFG = EngineConfig(error_bound=10.0, sampling_interval_ms=60_000)
SI = 60_000


@pytest.fixture(scope="module")
def series_chunks(spark, tmp_path_factory):
    """The batch series split into 4 time-ordered parquet files (arriving
    chunks), plus the full series DataFrame."""
    tr = generate_transcripts(spark, n_convs=12, turns_base=64)
    series = transcript_series(tr, SI).cache()
    lo, hi = series.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
    d = tmp_path_factory.mktemp("chunks")
    n_chunks = 4
    span = (hi - lo) // n_chunks + 1
    for i in range(n_chunks):
        (
            series.where(
                (F.col("ts_ms") >= lo + i * span)
                & (F.col("ts_ms") < lo + (i + 1) * span)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(str(d), f"chunk={i}"))
        )
    # two sentinel chunks with far-future points: the first advances the
    # watermark past every real run, the second triggers the event-time
    # timeouts that flush the remaining buffered tails (watermark updates
    # take effect one micro-batch later)
    for j, extra_ms in enumerate((100 * SI, 200 * SI)):
        spark.createDataFrame(
            [("__sentinel__", "turn_rate", hi + extra_ms, 1.0)],
            "sid string, metric string, ts_ms long, value float",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(str(d), f"chunk={n_chunks + j}")
        )
    return str(d), series


def test_streamed_segments_match_batch_at_frontier(spark, series_chunks):
    chunk_dir, series = series_chunks
    stream = (
        spark.readStream.schema("sid string, metric string, ts_ms long, value float")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(chunk_dir, "chunk=*"))
    )
    segs = segment_stream(stream, CFG, watermark_delay="2 minutes")
    q = run_to_memory_sink(segs, "streamed_segs")
    q.processAllAvailable()
    q.stop()

    streamed = (
        spark.table("streamed_segs")
        .where("sid != '__sentinel__'")
        .drop("is_final", "temp_gen")
    )
    batch = compress(series, CFG)

    # the sentinel advances the watermark past every real run, so the
    # streamed output must equal the batch segment table EXACTLY
    extra = streamed.exceptAll(batch)
    assert extra.count() == 0, extra.limit(5).collect()
    missing = batch.exceptAll(streamed)
    assert missing.count() == 0, missing.limit(5).collect()
    assert streamed.count() > 0


def test_temporary_segments_cover_the_tail(spark, series_chunks):
    """maximum_latency parity: with temporaries on, latest_view covers
    points the watermark has not finalized yet, within the error bound."""
    from modelardb_dynamic_spark.operators.reconstruct import datapoint_view
    from modelardb_dynamic_spark.streaming.ingest import latest_view

    chunk_dir, series = series_chunks
    # real chunks only (no watermark-advancing sentinels): the tail stays
    # unfinalized, so the temporaries are what provides coverage
    stream = (
        spark.readStream.schema("sid string, metric string, ts_ms long, value float")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(chunk_dir, "chunk=[0-3]"))
    )
    segs = segment_stream(stream, CFG, watermark_delay="2 minutes",
                          max_latency_points=1)
    q = run_to_memory_sink(segs, "latency_segs")
    q.processAllAvailable()
    q.stop()
    appended = spark.table("latency_segs")
    assert appended.where("NOT is_final").count() > 0  # temporaries emitted

    view = latest_view(appended)
    # no double representation: reconstructed timestamps are unique per key
    rec = datapoint_view(view.drop("is_final", "temp_gen"))
    dup = rec.groupBy("sid", "metric", "ts_ms").count().where("count > 1")
    assert dup.count() == 0
    # coverage beyond the finalized frontier: with max_latency_points=1 and
    # sentinel-advanced watermark, every original point is represented
    j = rec.withColumnRenamed("value", "rv").join(
        series, ["sid", "metric", "ts_ms"], "right"
    )
    missing = j.where("rv IS NULL").count()
    assert missing == 0
    bad = j.where("NOT (rv = value OR abs((value - rv) / value) * 100.0 <= 10.0)")
    assert bad.count() == 0


def test_streamed_points_roundtrip(spark, series_chunks):
    """Reconstructing streamed segments reproduces the original points
    (error-bound semantics) for the covered range."""
    from modelardb_dynamic_spark.operators.reconstruct import datapoint_view

    streamed = (
        spark.table("streamed_segs")
        .where("sid != '__sentinel__'")
        .drop("is_final", "temp_gen")
    )
    rec = datapoint_view(streamed).withColumnRenamed("value", "rec")
    _, series = series_chunks
    j = rec.join(series, ["sid", "metric", "ts_ms"], "left")
    assert j.where("value IS NULL").count() == 0  # every rec point existed
    bad = j.where(
        "NOT (rec = value OR abs((value - rec) / value) * 100.0 <= 10.0)"
    )
    assert bad.count() == 0


def test_streamed_exact_dedup_matches_batch(spark, tmp_path):
    """dedup_stream keeps exactly one doc per content hash across
    micro-batches (duplicates span chunk boundaries on purpose) and the
    surviving fingerprint set equals batch exact_dedup's."""
    import os

    from modelardb_dynamic_spark.operators.dedup import dedup_stream, exact_dedup

    # 3 chunks x 8 docs; text repeats every 5 ids -> cross-chunk dupes
    rows = [(i, f"text {i % 5}") for i in range(24)]
    for c in range(3):
        spark.createDataFrame(
            rows[c * 8 : (c + 1) * 8], "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(str(tmp_path), f"chunk={c}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(str(tmp_path), "chunk=*"))
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("streamed_dedup")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    kept = spark.table("streamed_dedup").collect()
    batch = {
        r["fp"] for r in exact_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert len(kept) == len(batch) == 5          # one survivor per hash
    assert {r["fp"] for r in kept} == batch
    by_fp = {r["fp"]: r["doc_id"] for r in kept}
    for r in kept:                               # survivor carries its own text's hash
        assert r["text"] == f"text {r['doc_id'] % 5}"
    assert len(by_fp) == 5
