"""Reconstruction: segment table -> virtual DataPoint view.

Two-phase prune-then-exact shape of the reference's point view
(engines/spark/ViewDataPoint.scala:37-78): timestamp predicates are mapped
to segment-overlap predicates (start_ts <= hi AND end_ts >= lo) which
Catalyst pushes into the parquet scan (partition pruning + row-group
min/max), segments are gridded with a vectorized mapInArrow, and the exact
point-level filter is re-applied afterwards (the reference reports
unhandledFilters = all for the same reason, ViewDataPoint.scala:35).

The gridding itself is vectorized ACROSS segments per Arrow batch: PMC and
Swing values for every segment in the batch are produced by a single
np.repeat / fused multiply-add; only Gorilla/Uncompressed payloads decode
per segment (<= length_bound points each).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modelardb_dynamic_spark.config import (
    MTID_GORILLA,
    MTID_PMC_MEAN,
    MTID_SWING,
    MTID_UNCOMPRESSED,
)
from modelardb_dynamic_spark.models.gorilla import gorilla_decode_batch
from modelardb_dynamic_spark.models.kernels import swing_decode

DATAPOINT_SCHEMA = "sid string, metric string, ts_ms long, value float"


_OUT_SCHEMA = pa.schema(
    [
        ("sid", pa.string()),
        ("metric", pa.string()),
        ("ts_ms", pa.int64()),
        ("value", pa.float32()),
    ]
)


def _grid_batch(rb: pa.RecordBatch) -> pa.RecordBatch:
    n_seg = rb.num_rows
    start = rb.column("start_ts").to_numpy(zero_copy_only=False).astype(np.int64)
    end = rb.column("end_ts").to_numpy(zero_copy_only=False).astype(np.int64)
    si = rb.column("si").to_numpy(zero_copy_only=False).astype(np.int64)
    mtid = rb.column("mtid").to_numpy(zero_copy_only=False)
    models = rb.column("model").to_pylist()
    lens = ((end - start) // si + 1).astype(np.int64)
    total = int(lens.sum())
    seg_idx = np.repeat(np.arange(n_seg), lens)
    # per-point index within its segment
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pt_idx = np.arange(total) - np.repeat(offs, lens)
    ts = np.repeat(start, lens) + pt_idx * np.repeat(si, lens)
    values = np.empty(total, dtype=np.float32)

    is_pmc = mtid == MTID_PMC_MEAN
    if is_pmc.any():
        pmc_vals = np.array(
            [
                np.frombuffer(m, dtype=">f4")[0] if p else np.float32(0)
                for m, p in zip(models, is_pmc)
            ],
            dtype=np.float32,
        )
        mask = is_pmc[seg_idx]
        values[mask] = pmc_vals[seg_idx[mask]]
    is_swing = mtid == MTID_SWING
    if is_swing.any():
        ab = np.zeros((n_seg, 2), dtype=np.float64)
        for i in np.flatnonzero(is_swing):
            ab[i] = swing_decode(models[i])
        mask = is_swing[seg_idx]
        sidx = seg_idx[mask]
        values[mask] = (
            ab[sidx, 0] * ts[mask].astype(np.float64) + ab[sidx, 1]
        ).astype(np.float32)
    g_ids = np.flatnonzero(mtid == MTID_GORILLA)
    if len(g_ids):
        # one C call decodes every Gorilla stream of the batch straight
        # into its values[] slice (per-segment decode hops dominated here)
        gorilla_decode_batch(
            [models[i] for i in g_ids], lens[g_ids], values, offs[g_ids]
        )
    for i in np.flatnonzero(mtid == MTID_UNCOMPRESSED).tolist():
        a, b = offs[i], offs[i] + lens[i]
        values[a:b] = np.frombuffer(models[i], dtype=">f4")[: lens[i]]
    # string columns fan out via Arrow take (C++), never via Python objects
    idx = pa.array(seg_idx, type=pa.int64())
    return pa.RecordBatch.from_arrays(
        [
            rb.column("sid").take(idx),
            rb.column("metric").take(idx),
            pa.array(ts, type=pa.int64()),
            pa.array(values, type=pa.float32()),
        ],
        schema=_OUT_SCHEMA,
    )


def _map_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for rb in batches:
        if rb.num_rows:
            yield _grid_batch(rb)


def datapoint_view(
    segments: DataFrame,
    lo_ms: int | None = None,
    hi_ms: int | None = None,
) -> DataFrame:
    """Grid segments back to points, optionally restricted to
    [lo_ms, hi_ms]. The overlap predicate prunes segments BEFORE decoding
    (pushed to the scan); the exact predicate re-filters points after."""
    df = segments
    if lo_ms is not None:
        df = df.where(F.col("end_ts") >= lo_ms)
    if hi_ms is not None:
        df = df.where(F.col("start_ts") <= hi_ms)
    out = df.select(
        "sid", "metric", "start_ts", "end_ts", "si", "mtid", "model"
    ).mapInArrow(_map_fn, schema=DATAPOINT_SCHEMA)
    if lo_ms is not None:
        out = out.where(F.col("ts_ms") >= lo_ms)
    if hi_ms is not None:
        out = out.where(F.col("ts_ms") <= hi_ms)
    return out
