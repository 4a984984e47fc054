#!/usr/bin/env python
"""Tier-routing benefit measurement (plans/planner.py).

Stages a dense minute-grid series table (SIDS x DAYS x 1440 rows) plus its
1m/1h/1d tiers to tmpfs parquet, then times a day-bucket aggregate over a
wide unaligned range two ways on the SAME session:

  direct : groupBy over the raw series parquet (what you do without tiers)
  routed : tiered_agg through the coarsest exact cover

and prints one JSON line with both walls, the speedup, and the rows each
plan scanned (Spark REST stage input metrics would need a second process;
the row counts here are computed from the cover arithmetic, which the
plan tests pin to the executed filters).

Usage: python tools/planner_bench.py [--sids 512] [--days 64] [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from modelardb_dynamic_spark.plans.planner import cover_report, tiered_agg  # noqa: E402
from modelardb_dynamic_spark.session import build_session  # noqa: E402

SI, HOUR, DAY = 60_000, 3_600_000, 86_400_000
T0 = 1_704_067_200_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sids", type=int, default=512)
    ap.add_argument("--days", type=int, default=64)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    os.environ.setdefault("MDBS_TMPFS_LOCAL_DIR", "1")
    spark = build_session("planner-bench")
    base = (
        "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    ) + f"/mdbs_planner_bench_{args.sids}_{args.days}"

    n_minutes = args.days * 24 * 60
    if not os.path.exists(os.path.join(base, "series", "_SUCCESS")):
        # dense integer-valued minute grid, pure JVM expressions
        series = (
            spark.range(args.sids * n_minutes)
            .select(
                F.concat(F.lit("s"), (F.col("id") % args.sids)).alias("sid"),
                F.lit("m").alias("metric"),
                (
                    F.lit(T0)
                    + (F.col("id") / args.sids).cast("long") * SI
                ).alias("ts_ms"),
                F.pmod(F.xxhash64("id"), F.lit(1000)).cast("float").alias("value"),
            )
        )
        series.repartition(64).write.mode("overwrite").parquet(base + "/series")
        s = spark.read.parquet(base + "/series")
        for name, w, src in [("t1m", SI, None), ("t1h", HOUR, "t1m"),
                             ("t1d", DAY, "t1h")]:
            src_df = s if src is None else spark.read.parquet(f"{base}/{src}")
            col = "ts_ms" if src is None else "bucket_ts"
            tier = src_df.groupBy(
                "sid", "metric",
                F.expr(f"(({col}) DIV {w}) * {w}").alias("bucket_ts"),
            ).agg(
                (F.sum("cnt") if src else F.count(F.lit(1))).alias("cnt"),
                F.sum("vsum" if src else F.col("value").cast("double")).alias("vsum"),
                F.min("vmin" if src else F.col("value").cast("float")).alias("vmin"),
                F.max("vmax" if src else F.col("value").cast("float")).alias("vmax"),
            )
            tier.write.mode("overwrite").parquet(f"{base}/{name}")

    series = spark.read.parquet(base + "/series")
    tiers = [
        (spark.read.parquet(f"{base}/t1m"), SI),
        (spark.read.parquet(f"{base}/t1h"), HOUR),
        (spark.read.parquet(f"{base}/t1d"), DAY),
    ]
    lo = T0 + 90 * SI
    hi = T0 + args.days * DAY - 90 * SI

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(mk):
        best = float("inf")
        for _ in range(args.passes):
            t = time.time()
            force(mk())
            best = min(best, time.time() - t)
        return best

    direct = timed(
        lambda: series.where(f"ts_ms >= {lo} AND ts_ms < {hi}").groupBy(
            "sid", "metric",
            F.expr(f"((ts_ms) DIV {DAY}) * {DAY}").alias("bucket_ts"),
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("double")).alias("vsum"),
            F.min(F.col("value").cast("float")).alias("vmin"),
            F.max(F.col("value").cast("float")).alias("vmax"),
        )
    )
    routed = timed(lambda: tiered_agg(series, tiers, lo, hi, DAY))

    rep = cover_report([SI, HOUR, DAY], lo, hi, DAY, grid_ms=SI)
    # rows actually read per branch = grid points / points-per-row
    rows_routed = args.sids * (
        rep[DAY] // (DAY // SI) + rep[HOUR] // (HOUR // SI) + rep[SI] + rep[0]
    )
    rows_direct = args.sids * sum(rep.values())
    print(json.dumps({
        "sids": args.sids, "days": args.days,
        "series_rows": args.sids * n_minutes,
        "direct_s": round(direct, 3), "routed_s": round(routed, 3),
        "speedup": round(direct / routed, 2),
        "rows_aggregated_direct": rows_direct,
        "rows_aggregated_routed": rows_routed,
        "row_reduction": round(rows_direct / max(rows_routed, 1), 1),
    }))


if __name__ == "__main__":
    main()
