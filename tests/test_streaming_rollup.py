"""Streaming continuous aggregates (streaming/rollup.py): an unbounded
transcript-turn stream maintained as an append-only tier table must equal
(a) the batch windowed aggregation over the same raw turns and (b) the
batch segment-path tier (compress at error 0 -> analytic rollup) at the
watermark frontier, and compose with downsample() unchanged."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.operators.compress import compress
from modelardb_dynamic_spark.operators.rollup import downsample, rollup
from modelardb_dynamic_spark.sources.timeseries import transcript_series
from modelardb_dynamic_spark.sources.transcripts import generate_transcripts
from modelardb_dynamic_spark.streaming.rollup import continuous_aggregate

SI = 60_000
BUCKET = 300_000
HOUR = 3_600_000
CFG0 = EngineConfig(error_bound=0.0, sampling_interval_ms=SI)


@pytest.fixture(scope="module")
def streamed_tier(spark, tmp_path_factory):
    """Run the streaming continuous aggregate ONCE over time-ordered
    arriving chunks (plus watermark-advancing sentinels) and return
    (streamed tier DataFrame, the full batch transcript DataFrame)."""
    tr = generate_transcripts(spark, n_convs=12, turns_base=64).cache()
    lo, hi = tr.agg(
        F.min(F.unix_millis("ts")), F.max(F.unix_millis("ts"))
    ).collect()[0]
    d = str(tmp_path_factory.mktemp("turn_chunks"))
    n_chunks = 4
    span = (hi - lo) // n_chunks + 1
    for i in range(n_chunks):
        (
            tr.where(
                (F.unix_millis("ts") >= lo + i * span)
                & (F.unix_millis("ts") < lo + (i + 1) * span)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"chunk={i}"))
        )
    # two sentinel chunks: the first advances the watermark past every real
    # bucket, the second gives the engine one more micro-batch to flush
    # (watermark updates take effect one batch later)
    for j, extra_ms in enumerate((100 * SI, 200 * SI)):
        (
            spark.createDataFrame(
                [("__sentinel__", 0, "user", "x", "none")],
                "conv_id string, turn_idx int, role string, text string, tool string",
            )
            .withColumn("ts", F.timestamp_millis(F.lit(hi + extra_ms)))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"chunk={n_chunks + j}"))
        )

    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    tier = continuous_aggregate(stream, SI, BUCKET, watermark_delay="2 minutes")
    q = (
        tier.writeStream.format("memory")
        .queryName("stream_tier_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = (
        spark.table("stream_tier_t").where("sid != '__sentinel__'").cache()
    )
    streamed.count()
    return streamed, tr


def _assert_same(a, b):
    extra = a.exceptAll(b)
    assert extra.count() == 0, extra.limit(5).collect()
    missing = b.exceptAll(a)
    assert missing.count() == 0, missing.limit(5).collect()


def test_streamed_tier_matches_batch_raw_aggregation(spark, streamed_tier):
    """Exactly-once bucket emission: the append-mode stream over arriving
    chunks equals the batch groupBy over the full raw table (the sentinel
    pushed the watermark past every real bucket)."""
    streamed, tr = streamed_tier
    slot = (F.floor(F.unix_millis("ts") / SI) * SI).alias("slot")
    per_slot = (
        tr.select(
            F.col("conv_id").alias("sid"),
            slot,
            F.floor(F.length("text") / 4).alias("tok"),
        )
        .groupBy("sid", "slot")
        .agg(
            F.count(F.lit(1)).cast("float").alias("turn_rate"),
            F.sum("tok").cast("float").alias("token_rate"),
        )
    )
    batch = (
        per_slot.select(
            "sid",
            "slot",
            F.expr(
                "stack(2,'turn_rate',turn_rate,'token_rate',token_rate)"
            ).alias("metric", "value"),
        )
        .withColumn("bucket_ts", (F.floor(F.col("slot") / BUCKET) * BUCKET).cast("long"))
        .groupBy("sid", "metric", "bucket_ts")
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").cast("double").alias("vsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
    assert streamed.count() > 0
    _assert_same(streamed, batch.select(*streamed.columns))


def test_streamed_tier_matches_segment_path_and_downsamples(spark, streamed_tier):
    """Cross-path identity: the streaming windowed aggregate equals the
    batch MODEL path (series -> compress at error bound 0 -> analytic
    rollup) bucket for bucket — the same invariant the batch oracle gate
    pins, now spanning online and offline paths. downsample() composes on
    the streamed sink unchanged (counts/sums add, min/max nest)."""
    streamed, tr = streamed_tier
    segs = compress(transcript_series(tr, SI), CFG0)
    batch_tier = rollup(segs, BUCKET)
    _assert_same(streamed, batch_tier.select(*streamed.columns))
    _assert_same(
        downsample(streamed, HOUR).select(*streamed.columns),
        downsample(batch_tier, HOUR).select(*streamed.columns),
    )


def test_dedup_turns_cross_batch_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics pinned: a redelivery in a
    LATER micro-batch (same key, inside the watermark horizon) is
    dropped; distinct keys all pass; the survivor is the row itself."""
    from modelardb_dynamic_spark.streaming.rollup import dedup_turns

    d = str(tmp_path / "in")
    SCHEMA = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string"
    )
    base = 1_700_000_000_000

    def chunk(i, rows):
        (
            spark.createDataFrame(rows, SCHEMA)
            .withColumn(
                "ts",
                F.timestamp_millis(
                    F.lit(base) + F.col("turn_idx").cast("long") * 60_000
                ),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"chunk={i}"))
        )

    # batch 0: three turns, one of them duplicated in-batch
    chunk(0, [("c1", 0, "user", "a", None), ("c1", 1, "assistant", "b", None),
              ("c1", 1, "assistant", "b", None)])
    # batch 1: redelivery of turn 0 (old ts, within the 1h watermark
    # horizon) + one genuinely new turn
    chunk(1, [("c1", 0, "user", "a", None), ("c1", 2, "tool", "c", "t")])
    schema = spark.read.parquet(os.path.join(d, "chunk=0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "chunk=*"))
    )
    out = dedup_turns(stream, watermark_delay="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in spark.table("dedup_t").collect()
    )
    assert got == [("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "c")]
