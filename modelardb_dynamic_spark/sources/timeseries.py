"""Derive regular time series from irregular event/transcript tables.

The reference ingests pre-gridded series (TimeSeries.java fixed
samplingInterval); our inputs are irregular rows, so the first stage bins
them onto the sampling-interval grid. Buckets with no rows are simply
absent — that absence IS the gap the compressor flushes on
(SegmentGenerator.java:165-185 semantics via split_runs).

Output schema (the compressor input): one row per (series, metric, grid ts)
    sid string, metric string, ts_ms long, value float
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TURN_RATE = "turn_rate"
TOKEN_RATE = "token_rate"


def to_ms(col) -> Column:
    """Epoch millis from timestamp OR timestamp_ntz columns (NTZ parquet
    timestamps are interpreted in the session timezone, pinned to UTC)."""
    return F.unix_millis(F.col(col).cast("timestamp") if isinstance(col, str) else col.cast("timestamp"))


def transcript_series(transcripts: DataFrame, si_ms: int) -> DataFrame:
    """Per conv_id per SI bucket: turn_rate = count of turns, token_rate =
    sum of approx tokens (len(text) // 4). Both exact small integers, so
    float32 representation is lossless."""
    bucket = (F.floor(to_ms("ts") / si_ms) * si_ms).alias("ts_ms")
    per_bucket = (
        transcripts.select(
            F.col("conv_id").alias("sid"),
            bucket,
            (F.floor(F.length("text") / 4)).alias("tokens"),
        )
        .groupBy("sid", "ts_ms")
        .agg(
            F.count(F.lit(1)).cast("float").alias(TURN_RATE),
            F.sum("tokens").cast("float").alias(TOKEN_RATE),
        )
    )
    return per_bucket.select(
        "sid",
        "ts_ms",
        F.expr(
            f"stack(2, '{TURN_RATE}', {TURN_RATE}, '{TOKEN_RATE}', {TOKEN_RATE})"
        ).alias("metric", "value"),
    ).select("sid", "metric", "ts_ms", "value")


def event_series(
    events: DataFrame,
    si_ms: int = 60_000,
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-count series per id per SI bucket (the events testdata analog
    of turn_rate). Counts are exact in float32."""
    bucket = (F.floor(to_ms(ts_col) / si_ms) * si_ms).alias("ts_ms")
    return (
        events.select(F.col(id_col).cast("string").alias("sid"), bucket)
        .groupBy("sid", "ts_ms")
        .agg(F.count(F.lit(1)).cast("float").alias("value"))
        .select("sid", F.lit("event_rate").alias("metric"), "ts_ms", "value")
    )
