#!/usr/bin/env python
"""Large-scale pipeline headline: the full transcript tier pipeline
(storage read -> fused derive+compress -> 1m/1h/1d tiers + gap-fill) on a
~62M-turn input at local[32], several passes with /proc/stat steal
sampling per pass (the sandbox has a bursty noisy neighbor; the quietest
pass is the honest capability estimate — methodology documented in
BENCH.md round 3).

Usage: python tools/largescale_bench.py [--passes 4] [--convs 1000000]
       [--turns-base 5000] [--cpus 32]

Prints one JSON line per pass: wall_s, turns_per_sec, steal_frac (steal
ticks / (100 Hz * cpus * wall)).
"""

from __future__ import annotations

import argparse
import json
import os
os.environ.setdefault("MDBS_TMPFS_LOCAL_DIR", "1")
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--convs", type=int, default=1_000_000)
    ap.add_argument("--turns-base", type=int, default=5000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from bench import bench_pipeline
    from modelardb_dynamic_spark.session import build_session

    spark = build_session("largescale", master=f"local[{args.cpus}]")

    def _ident(it):
        yield from it

    # spawn + warm the Python UDF workers before any timed window
    spark.range(0, args.cpus, 1, args.cpus).mapInPandas(
        _ident, schema="id long"
    ).count()

    results = []
    for p in range(args.passes):
        s0, t0 = steal_ticks(), time.time()
        wall, n_turns = bench_pipeline(
            spark, n_convs=args.convs, turns_base=args.turns_base
        )
        s1, t1 = steal_ticks(), time.time()
        steal_frac = (s1 - s0) / (100.0 * args.cpus * (t1 - t0))
        row = {
            "pass": p,
            "n_turns": n_turns,
            "wall_s": round(wall, 1),
            "turns_per_sec": round(n_turns / wall, 0),
            "steal_frac": round(steal_frac, 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    best = min(results, key=lambda r: r["wall_s"])
    print(json.dumps({"best": best}))
    spark.stop()


if __name__ == "__main__":
    main()
