"""Streaming continuous aggregates: the tier tables maintained online.

The north star materializes "continuous aggregates (count/avg/min/max
turn-rate and token-rate per conv_id per 1m/1h/1d bucket) via windowed
aggregation with explicit gap-fill". The batch path does this from the
segment table (operators/rollup.py); this module is the ONLINE twin — an
unbounded transcript-turn stream maintained as an append-only tier table
with Structured Streaming windowed aggregation, watermarks handling late
data (reference analog: the streaming ingest path of SparkEngine feeding
the same aggregate views it answers queries from, engines/spark/
Spark.scala:41 + SparkStreamReceiver; the reference keeps ONE code path by
re-running batch queries over the growing segment store — Spark-first, we
instead use the engine's native incremental windowed aggregation, which
emits each bucket exactly once when the event-time watermark passes its
end).

Two chained stateful aggregations (SPARK-40925, append mode):

  stage 1 — turns.withWatermark(ts).groupBy(window(ts, si), conv_id)
            -> turn_rate / token_rate per SI grid slot (the streaming twin
            of sources/timeseries.transcript_series: a grid slot is final
            once the watermark passes it, late turns are dropped exactly
            like the batch engine's in-order contract drops them);
  stage 2 — groupBy(window(window_time(slot), bucket), sid, metric)
            -> cnt / vsum / vmin / vmax per tier bucket (the streaming
            twin of operators/rollup.rollup's aggregate semantics).

Output schema == the batch TIER_SCHEMA, so downsample() composes on the
sink table unchanged, and the batch/stream results are directly
comparable: with error bound 0 the batch tier (which goes through model
compression + analytic rollup) is value-identical to the streamed tier at
the watermark frontier — pinned in tests/test_streaming_rollup.py.

Scale shape: both stages are built-in JVM windowed aggregations (RocksDB/
HDFS-backed state store per (key, window), partial aggregation map-side,
one shuffle each on the grouping key); no Python crosses the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_RATE = "turn_rate"
TOKEN_RATE = "token_rate"


def _secs(ms: int) -> str:
    if ms % 1000:
        raise ValueError(f"bucket must be whole seconds, got {ms} ms")
    return f"{ms // 1000} seconds"


def continuous_series(turns: DataFrame, si_ms: int) -> DataFrame:
    """Streaming twin of sources/timeseries.transcript_series: per conv_id
    per SI window, turn_rate = count of turns, token_rate = sum of approx
    tokens (len(text) // 4; exact small integers, lossless in float32).

    `turns` must already carry an event-time watermark on `ts`. The window
    struct is KEPT (column `w`) so a second windowed aggregation can chain
    on window_time(w)."""
    return (
        turns.groupBy(
            F.window("ts", _secs(si_ms)).alias("w"),
            F.col("conv_id").alias("sid"),
        )
        .agg(
            F.count(F.lit(1)).cast("float").alias(TURN_RATE),
            F.sum(F.floor(F.length("text") / 4)).cast("float").alias(TOKEN_RATE),
        )
    )


def continuous_tier(series_w: DataFrame, bucket_ms: int) -> DataFrame:
    """Chained windowed aggregation: SI grid slots -> tier buckets, same
    aggregate semantics as the batch rollup (cnt = grid slots with data,
    vsum/vmin/vmax over the slot values). Emits TIER_SCHEMA columns."""
    long_df = series_w.select(
        "w",
        "sid",
        F.expr(
            f"stack(2, '{TURN_RATE}', {TURN_RATE}, '{TOKEN_RATE}', {TOKEN_RATE})"
        ).alias("metric", "value"),
    )
    return (
        long_df.groupBy(
            F.window(F.window_time("w"), _secs(bucket_ms)).alias("b"),
            "sid",
            "metric",
        )
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").cast("double").alias("vsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .select(
            "sid",
            "metric",
            F.unix_millis("b.start").alias("bucket_ts"),
            "cnt",
            "vsum",
            "vmin",
            "vmax",
        )
    )


def continuous_aggregate(
    turns: DataFrame,
    si_ms: int,
    bucket_ms: int,
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Unbounded transcript-turn stream -> append-only tier table at
    bucket_ms granularity (TIER_SCHEMA), each bucket emitted exactly once
    when the watermark passes its end. bucket_ms must be a multiple of
    si_ms (tier buckets nest on the SI grid, FIXTURES.md §4)."""
    if bucket_ms % si_ms:
        raise ValueError(f"bucket_ms {bucket_ms} not a multiple of si {si_ms}")
    wm = turns.withWatermark("ts", watermark_delay)
    return continuous_tier(continuous_series(wm, si_ms), bucket_ms)


def session_aggregate(
    turns: DataFrame, gap_ms: int, watermark_delay: str = "2 minutes"
) -> DataFrame:
    """Streaming SESSIONIZATION: Spark's native session_window merges a
    conversation's turns whose gap-extended windows overlap (two turns
    share a session iff their timestamps differ by LESS than gap_ms); a
    session closes — and is emitted exactly once in append mode — when
    the event-time watermark passes last_turn + gap. The online twin of
    textstats.sessionize's gaps-and-islands form, with identical
    semantics (a delta of exactly gap_ms starts a new session in both).

    Output: (conv_id, session_start ms, session_end ms = last + gap,
    n_turns, tokens) — all exact integers.

    Scale shape: one built-in stateful aggregation keyed on (conv_id,
    merging session window); state is per OPEN session only (closed
    sessions leave the store), map-side partial merge, one shuffle."""
    w = turns.withWatermark("ts", watermark_delay)
    return (
        w.groupBy(
            F.session_window("ts", _secs(gap_ms)), F.col("conv_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.floor(F.length("text") / 4)).cast("long").alias("tokens"),
        )
        .select(
            "conv_id",
            F.unix_millis("session_window.start").alias("session_start"),
            F.unix_millis("session_window.end").alias("session_end"),
            "n_turns",
            "tokens",
        )
    )


def hopping_aggregate(
    turns: DataFrame,
    window_ms: int,
    slide_ms: int,
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Streaming HOPPING-window aggregate: per conversation, turn count
    and token sum over a `window_ms` window sliding every `slide_ms` —
    "activity in the trailing 15 minutes, updated every 5" as an
    append-only stream (each overlapping window emitted exactly once
    when the watermark passes its end). The overlapping-window shape the
    tumbling continuous_aggregate cannot express; the streaming twin of
    analytics.sliding_agg's batch RANGE frame.

    Spark's native window(ts, window, slide) assigns each turn to its
    window_ms/slide_ms covering windows (epoch-aligned), with stateful
    partial aggregation per (window, conv) — state bounded by open
    windows only. Output: (conv_id, window_start ms, window_end ms,
    n_turns, tokens), all exact integers.
    """
    if window_ms % slide_ms:
        raise ValueError(f"window {window_ms} not a multiple of slide {slide_ms}")
    w = turns.withWatermark("ts", watermark_delay)
    return (
        w.groupBy(
            F.window("ts", _secs(window_ms), _secs(slide_ms)).alias("hw"),
            F.col("conv_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.floor(F.length("text") / 4)).cast("long").alias("tokens"),
        )
        .select(
            "conv_id",
            F.unix_millis("hw.start").alias("window_start"),
            F.unix_millis("hw.end").alias("window_end"),
            "n_turns",
            "tokens",
        )
    )


def dedup_turns(
    turns: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Exactly-once turn ingestion over an at-least-once source: drop
    redelivered turns by their natural key (conv_id, turn_idx) with
    dropDuplicatesWithinWatermark — the stream-side guard every Kafka /
    at-least-once file source needs in front of the ingest pipeline
    (batch twin: TierPipeline.append's keyed raw upsert).

    Why WithinWatermark and not plain dropDuplicates: the state store
    keeps one entry per key FOREVER under plain dropDuplicates (unbounded
    on a 10^12-turn stream); the watermark variant expires a key's state
    once the event-time watermark passes ts + delay, bounding state to
    the redelivery horizon while still deduplicating any duplicate that
    arrives within it — redelivery windows are minutes, not months.

    Rows pass through unchanged (first arrival wins; with exact
    redelivery the survivor is value-identical by construction), so the
    whole ingest chain (continuous_series -> continuous_tier, or
    foreachBatch -> TierPipeline.append) composes downstream unchanged.
    """
    return turns.withWatermark("ts", watermark_delay) \
        .dropDuplicatesWithinWatermark(list(keys))
