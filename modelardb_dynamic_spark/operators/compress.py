"""Compression stage: regular series -> segment table.

Spark shape:
    series.repartition(hash(sid[, salt]))
          .sortWithinPartitions(sid, metric[, salt], ts_ms)
          .mapInPandas(kernel)                         ->  segments

mapInPandas over sorted partitions (rather than per-group applyInPandas)
amortizes the Python/Arrow round trip over whole 64k-row batches: group
boundaries are found with numpy on the sorted batch and each group is a
zero-copy slice. A group that spans batch boundaries is carried over. The
numpy cascade in models.kernels does the actual compression (no per-row
Python anywhere). Replaces the reference's per-group SegmentGenerator
threads driven by WorkingSets (core/WorkingSet.java:87-189) with Spark's
own scheduling.

Skew / salting (the 10^12-turn concern): a single hot series must not pin a
task. With salt_span_points set, a series is pre-split on disjoint time
ranges (salt = ts_ms // span); ranges compress independently, which forces
a segment boundary at salt edges — the same semantics as a gap flush
(SegmentGenerator.java:213-236), so reconstruction and error bounds are
unaffected; only segment counts can grow by (#spans - 1) per series.
Deterministic at any parallelism.

Segment table schema (SURVEY.md §1.2 / FIXTURES.md §3; summary columns are
materialized at compress time so tier rollups become pure columnar plans —
strictly stronger than the reference's query-time UDAF-over-model-objects,
engines/spark/SparkUDAF.scala:348-401):
    sid string, metric string, start_ts long, end_ts long, si int,
    mtid int, model binary, cnt long, vmin float, vmax float, vsum double
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.models.kernels import compress_series

SEGMENT_SCHEMA = (
    "sid string, metric string, start_ts long, end_ts long, si int, "
    "mtid int, model binary, cnt long, vmin float, vmax float, vsum double"
)
_COLS = [
    "sid", "metric", "start_ts", "end_ts", "si",
    "mtid", "model", "cnt", "vmin", "vmax", "vsum",
]


def _emit_group(
    rows: list, sid: str, metric: str, t: np.ndarray, v: np.ndarray,
    cfg: EngineConfig,
) -> None:
    order = np.argsort(t, kind="stable")
    t = t[order]
    v = v[order]
    si = cfg.sampling_interval_ms
    for s in compress_series(t, v, cfg):
        rows.append(
            (sid, metric, s.start_ts, s.end_ts, si, s.mtid, s.model,
             s.cnt, s.vmin, s.vmax, s.vsum)
        )


def _make_map_fn(cfg: EngineConfig, keys: list[str]):
    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_key: tuple | None = None
        carry_t: list[np.ndarray] = []
        carry_v: list[np.ndarray] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows: list[tuple] = []
            keycols = [pdf[k].to_numpy() for k in keys]
            n = len(pdf)
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for kc in keycols:
                change[1:] |= kc[1:] != kc[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            t_all = pdf["ts_ms"].to_numpy().astype(np.int64)
            v_all = pdf["value"].to_numpy().astype(np.float32)
            for gi, (a, b) in enumerate(zip(starts.tolist(), ends.tolist())):
                key = tuple(kc[a] for kc in keycols)
                is_last = gi == len(starts) - 1
                if carry_key is not None and key != carry_key:
                    # flush the carried group: it ended at a batch boundary
                    _emit_group(
                        rows, carry_key[0], carry_key[1],
                        np.concatenate(carry_t), np.concatenate(carry_v), cfg,
                    )
                    carry_key, carry_t, carry_v = None, [], []
                if is_last or carry_key == key:
                    # accumulate: group may continue into the next batch
                    carry_key = key
                    carry_t.append(t_all[a:b])
                    carry_v.append(v_all[a:b])
                else:
                    _emit_group(rows, key[0], key[1], t_all[a:b], v_all[a:b], cfg)
            if rows:
                yield pd.DataFrame(rows, columns=_COLS)
        if carry_key is not None:
            rows = []
            _emit_group(
                rows, carry_key[0], carry_key[1],
                np.concatenate(carry_t), np.concatenate(carry_v), cfg,
            )
            yield pd.DataFrame(rows, columns=_COLS)

    return map_fn


def compress(
    series: DataFrame,
    cfg: EngineConfig,
    salt_span_points: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """series (sid, metric, ts_ms, value) -> segment DataFrame.

    salt_span_points: split each series into ranges of that many sampling
    intervals so hot series parallelize (flush-at-boundary semantics above).
    """
    hash_keys = ["sid"]
    keys = ["sid", "metric"]
    df = series
    if salt_span_points:
        span_ms = salt_span_points * cfg.sampling_interval_ms
        df = df.withColumn("salt", (F.col("ts_ms") / span_ms).cast("long"))
        hash_keys = ["sid", "salt"]
        keys = ["sid", "metric", "salt"]
    n_part = num_partitions or series.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(n_part, *hash_keys).sortWithinPartitions(*keys, "ts_ms")
    return df.mapInPandas(_make_map_fn(cfg, keys), schema=SEGMENT_SCHEMA)


def compression_stats(segments: DataFrame) -> DataFrame:
    """Corpus compression ratio per the reference formula
    16*len/(24+size+4*gaps) with gaps == 0 (core/models/ModelType.java:
    65-70), plus counts."""
    return segments.agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("cnt").alias("n_points"),
        (16.0 * F.sum("cnt") / F.sum(F.length("model") + F.lit(24))).alias(
            "compression_ratio"
        ),
    )
