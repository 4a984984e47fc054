"""Streaming warehouse maintenance: an unbounded transcript-turn stream
kept rolled up through every retention tier, via foreachBatch ->
TierPipeline.append.

This is the third maintenance mode, composing the other two:
- batch build (TierPipeline.run),
- incremental batch append (TierPipeline.append),
- STREAMING append (this module): each micro-batch of arriving turns is
  upserted and only the touched series-hash buckets re-roll, so the
  warehouse (raw + series + segments + 1m/1h/1d) trails the stream by one
  trigger interval while staying BYTE-IDENTICAL to a from-scratch batch
  build on everything that has arrived (tests/test_streaming_maintenance).

Exactly-once without sinks-side transactions: Structured Streaming replays
a crashed epoch with the SAME epoch id, and append() is idempotent per
(turn key, batch id) — the raw upsert anti-joins on (conv_id, turn_idx)
and completed buckets are skipped via batch-id lineage fingerprints — so
a replay converges to the same state instead of duplicating (the classic
foreachBatch idempotent-sink recipe, Structured Streaming guide §
foreachBatch). Late and out-of-order turns need no watermark here:
whatever bucket they land in is recomputed from merged raw, which is why
this path complements the watermarked continuous aggregate
(streaming/rollup.py) that trades exactness-under-lateness for
lower-latency tier rows.

Scale notes: per epoch the work is O(touched buckets / total buckets) of
a rebuild + one anti-join against only those buckets' raw partitions; the
stream never holds aggregation state (no state store growth — the
warehouse IS the state)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from modelardb_dynamic_spark.plans.pipeline import TierPipeline


def stream_into_warehouse(
    turns_stream: DataFrame,
    pipeline: TierPipeline,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start the maintenance query: every micro-batch is appended to the
    pipeline's warehouse with batch_id = the epoch id. Returns the
    StreamingQuery; awaitTermination/stop is the caller's."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pipeline.append(batch_df, batch_id=f"epoch{epoch_id}")

    w = turns_stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time:
        w = w.trigger(processingTime=processing_time)
    return w.start()
