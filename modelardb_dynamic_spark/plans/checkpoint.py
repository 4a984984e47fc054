"""Per-partition lineage checkpoints.

Every pipeline stage commits one manifest per series-hash bucket after that
bucket's output is durably in place:

    <warehouse>/<table>/_lineage/bucket=<K>.json
    {"bucket": K, "rows": n, "high_water_ts": ms, "input_fingerprint": ...,
     "wall_s": ..., "stage": ..., "committed_utc": ...}

On restart, buckets whose manifest exists AND whose input fingerprint is
unchanged are skipped, so a killed job resumes mid-tier and re-does at most
one in-flight chunk (idempotent: bucket directories are overwritten whole).
This replaces the reference's rename-log crash-recovery protocol
(storage/FileStorage.scala:176-259); on an Iceberg deployment the bucket
overwrite becomes overwrite-by-filter on the bucket partition and the
manifest doubles as the job's own progress/metrics record.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass


@dataclass
class BucketManifest:
    stage: str
    bucket: int
    rows: int
    high_water_ts: int | None
    input_fingerprint: str
    wall_s: float
    committed_utc: float
    # name of the event-time column high_water_ts was computed from, so
    # audits (fsck) can recompute and compare it without a per-stage
    # schema registry; None on manifests written before this field existed
    ts_col: str | None = None


class Lineage:
    def __init__(self, table_root: str):
        self.dir = os.path.join(table_root, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, bucket: int) -> str:
        return os.path.join(self.dir, f"bucket={bucket}.json")

    def get(self, bucket: int) -> BucketManifest | None:
        p = self._path(bucket)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return BucketManifest(**json.load(f))

    def is_done(self, bucket: int, input_fingerprint: str) -> bool:
        m = self.get(bucket)
        return m is not None and m.input_fingerprint == input_fingerprint

    def commit(
        self,
        stage: str,
        bucket: int,
        rows: int,
        high_water_ts: int | None,
        input_fingerprint: str,
        wall_s: float,
        ts_col: str | None = None,
    ) -> None:
        m = BucketManifest(
            stage, bucket, rows, high_water_ts, input_fingerprint,
            wall_s, time.time(), ts_col,
        )
        tmp = self._path(bucket) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(m), f)
        os.replace(tmp, self._path(bucket))  # atomic

    def completed_buckets(self) -> list[int]:
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("bucket=") and name.endswith(".json"):
                out.append(int(name[len("bucket=") : -len(".json")]))
        return sorted(out)

    def metrics(self) -> dict:
        ms = [self.get(b) for b in self.completed_buckets()]
        return {
            "buckets": len(ms),
            "rows": sum(m.rows for m in ms if m),
            "wall_s": sum(m.wall_s for m in ms if m),
            "high_water_ts": max(
                (m.high_water_ts for m in ms if m and m.high_water_ts), default=None
            ),
        }
