#!/usr/bin/env python
"""Grouped-engine throughput on split/join-heavy corpora (single core).

Reproduces the BENCH.md round-4 "windowed C fast path" table: the same
three corpora, windows on vs off, best-of-N wall time (single-shot
timings swing multi-x under the sandbox's bursty CPU steal — see
BENCH.md "Steal accounting"). Pin for stable numbers:

    taskset -c 0 python tools/grouped_bench.py [--reps 3] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.models.grouped import GroupEngine

CFG = EngineConfig(error_bound=10.0, length_bound=50, sampling_interval_ms=100)


def corpora(scale: int):
    rng = np.random.default_rng(3)
    n = 500_000 // scale
    ts = np.arange(n, dtype=np.int64) * 100
    two_way = np.stack(
        [
            10 + 0.3 * np.sin(np.arange(n) / 50) + rng.normal(0, 0.2, n),
            1000 + 30 * np.sin(np.arange(n) / 70) + rng.normal(0, 20, n),
        ],
        axis=1,
    ).astype(np.float32)
    yield "2-way divergent split churn", ts, two_way

    m = n // 4
    base = np.where(np.arange(8) < 4, 10.0, 1000.0)[None, :]
    eight = (base * (1 + 0.001 * rng.normal(0, 1, (m, 8)))).astype(np.float32)
    yield "8-way -> two 4-member subs", np.arange(m, dtype=np.int64) * 100, eight

    k = 200_000 // scale
    a = 10 + rng.normal(0, 0.1, k)
    b = a.copy()
    for s in range(0, k, 400):
        b[s : s + 200] = 1000 + rng.normal(0, 10, 200)
    flap = np.stack([a, b], axis=1).astype(np.float32)
    yield "200-row in/out-of-band flapping", np.arange(k, dtype=np.int64) * 100, flap


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true", help="1/10 input size")
    args = ap.parse_args()
    out = []
    for name, ts, V in corpora(10 if args.quick else 1):
        row = {"corpus": name, "member_rows": int(ts.shape[0] * V.shape[1])}
        for label, w in (("windows_on", True), ("windows_off", False)):
            best, segs, hits = 1e18, 0, 0
            for _ in range(args.reps if w else 1):
                e = GroupEngine(
                    ts.copy(), V.copy(), CFG, split_fraction=10.0,
                    use_windows=w,
                )
                t0 = time.perf_counter()
                s = e.run()
                best = min(best, time.perf_counter() - t0)
                segs, hits = len(s), e.windows_hit
            row[label] = {
                "m_member_rows_per_s": round(row["member_rows"] / best / 1e6, 2),
                "segments": segs,
                "windows_hit": hits,
            }
        row["speedup"] = round(
            row["windows_on"]["m_member_rows_per_s"]
            / max(row["windows_off"]["m_member_rows_per_s"], 1e-9),
            1,
        )
        assert row["windows_on"]["segments"] == row["windows_off"]["segments"]
        print(json.dumps(row), flush=True)
        out.append(row)
    print(json.dumps({"rows": out}))


if __name__ == "__main__":
    main()
