"""Streaming warehouse maintenance (streaming/maintenance.py): a transcript
stream replayed file-by-file through foreachBatch -> TierPipeline.append
must leave EVERY warehouse table equal to a from-scratch batch build on
the full input — including late chunks that land inside already-rolled-up
buckets."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.plans.pipeline import TierPipeline
from modelardb_dynamic_spark.sources.catalog import Warehouse
from modelardb_dynamic_spark.sources.transcripts import generate_transcripts
from modelardb_dynamic_spark.streaming.maintenance import stream_into_warehouse

CFG10 = EngineConfig(error_bound=10.0, sampling_interval_ms=60_000)
TABLES = ["raw", "series", "segments", "tier_1m", "tier_1h", "tier_1d"]


def test_streamed_warehouse_equals_batch_build(spark, tmp_path):
    tr = generate_transcripts(spark, n_convs=24, turns_base=48).cache()
    lo, hi = tr.agg(
        F.min(F.unix_millis("ts")), F.max(F.unix_millis("ts"))
    ).collect()[0]

    # arrival order: three time chunks, then a LATE chunk of mid-timeline
    # turns held back from chunk 2 (out-of-order inside built buckets)
    late = (F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(5)) == 0) & (
        F.unix_millis("ts") < lo + (hi - lo) // 2
    )
    chunks_dir = str(tmp_path / "arrivals")
    os.makedirs(chunks_dir)
    span = (hi - lo) // 3 + 1
    for i in range(3):
        in_chunk = (
            (F.unix_millis("ts") >= lo + i * span)
            & (F.unix_millis("ts") < lo + (i + 1) * span)
            & ~late
        )
        tr.where(in_chunk).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(chunks_dir, f"c{i}")
        )
    tr.where(late).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(chunks_dir, "c3_late")
    )
    # flatten: file stream reads one top-level dir; one file per chunk
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n_files = 0
    for i, name in enumerate(["c0", "c1", "c2", "c3_late"]):
        d = os.path.join(chunks_dir, name)
        src = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(src) == 1
        os.rename(
            os.path.join(d, src[0]), os.path.join(flat, f"{i:02d}.parquet")
        )
        n_files += 1

    wh_s = Warehouse(str(tmp_path / "stream_wh"), n_buckets=4)
    p_s = TierPipeline(spark, wh_s, CFG10, chunk_buckets=4, salt_span_points=None)
    stream = (
        spark.readStream.schema(tr.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    q = stream_into_warehouse(
        stream, p_s, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(600)
    assert q.lastProgress is not None
    assert not q.isActive

    wh_b = Warehouse(str(tmp_path / "batch_wh"), n_buckets=4)
    p_b = TierPipeline(spark, wh_b, CFG10, chunk_buckets=4, salt_span_points=None)
    p_b.run(tr)

    for table in TABLES:
        a = wh_b.read(spark, table).drop("sbucket")
        b = wh_s.read(spark, table).drop("sbucket")
        assert a.exceptAll(b).count() == 0, table
        assert b.exceptAll(a).count() == 0, table
