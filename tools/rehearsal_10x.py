#!/usr/bin/env python
"""10x scale rehearsal (round-5 brief #5): the FULL persistent tier
pipeline (TierPipeline.run — raw/series/segments/1m/1h/1d with per-bucket
lineage) on a ~618M-turn staged input (10x the 61.8M-turn round-4
headline), with:

  - per-stage shuffle read/write bytes (Spark REST API, deterministic);
  - executor peak-memory metrics;
  - task-skew straggler audit on the heaviest stages (median vs p95 vs
    max task runtime — the salting path's proof-of-work at a 3M-turn hot
    conversation);
  - a sampled-conversation ORACLE SPOT-CHECK at full scale: per-turn raw
    text equality, tier_1h vs an independent aggregation of the
    reconstructed points (exact), and reconstruction within the error
    bound vs the true series — the same gates the sf-small pytests pin,
    re-proven at 618M.

Usage:
    python tools/rehearsal_10x.py --input /dev/shm/mdbs_bench_input_1000000_1000000 \
        --warehouse /dev/shm/wh10x [--buckets 64] [--sample 10]
"""

from __future__ import annotations

import argparse
import json
import os

os.environ.setdefault("MDBS_TMPFS_LOCAL_DIR", "1")
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rest(port: int, app_id: str, path: str):
    url = f"http://localhost:{port}/api/v1/applications/{app_id}{path}"
    return json.load(urllib.request.urlopen(url))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--warehouse", default="/dev/shm/wh10x")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sample", type=int, default=10)
    ap.add_argument("--error-bound", type=float, default=10.0)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--salt-span", type=int, default=None,
                    help="salt_span_points for TierPipeline (default: its 1<<20)")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from pyspark.sql import functions as F

    from modelardb_dynamic_spark.config import EngineConfig
    from modelardb_dynamic_spark.operators.reconstruct import datapoint_view
    from modelardb_dynamic_spark.plans.pipeline import HOUR_MS, TierPipeline
    from modelardb_dynamic_spark.session import build_session
    from modelardb_dynamic_spark.sources.catalog import Warehouse
    from modelardb_dynamic_spark.sources.timeseries import to_ms, transcript_series

    port = 4952
    spark = build_session(
        "rehearsal10x",
        master=f"local[{args.cpus}]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(port),
            # wide text rows (ramp conversations reach 100s of KB): the
            # default 4096-row vectorized batch is GBs per task there
            "spark.sql.parquet.columnarReaderBatchSize": "512",
        },
    )
    app_id = spark.sparkContext.applicationId
    cfg = EngineConfig(
        error_bound=args.error_bound, length_bound=256,
        sampling_interval_ms=60_000,
    )
    wh = Warehouse(args.warehouse, n_buckets=args.buckets)
    p = TierPipeline(
        spark, wh, cfg, chunk_buckets=16,
        **({'salt_span_points': args.salt_span}
           if args.salt_span is not None else {}),
    )
    tr = spark.read.parquet(args.input)
    report: dict = {"input": args.input, "n_buckets": args.buckets,
               "salt_span": args.salt_span}

    if not args.skip_build:
        n_turns = tr.count()
        report["n_turns"] = n_turns
        t0 = time.time()
        p.run(tr)
        report["pipeline_wall_s"] = round(time.time() - t0, 1)
        report["turns_per_sec"] = round(n_turns / report["pipeline_wall_s"], 0)
        # resume proof at scale: a second run over the same warehouse must
        # skip every committed bucket via lineage fingerprints
        t0 = time.time()
        p.run(tr)
        report["resume_wall_s"] = round(time.time() - t0, 1)

    # ---- per-stage shuffle bytes + skew + peak memory (REST) ----
    stages = [s for s in rest(port, app_id, "/stages")
              if s["status"] == "COMPLETE"]
    report["shuffle_write_bytes"] = sum(s["shuffleWriteBytes"] for s in stages)
    report["shuffle_read_bytes"] = sum(s["shuffleReadBytes"] for s in stages)
    if "n_turns" in report:
        report["shuffle_write_bytes_per_turn"] = round(
            report["shuffle_write_bytes"] / report["n_turns"], 2
        )
    heavy = sorted(
        stages, key=lambda s: -(s["shuffleWriteBytes"] + s["executorRunTime"])
    )[:8]
    skew = []
    for s in heavy:
        try:
            q = rest(
                port, app_id,
                f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.5,0.95,1.0",
            )
            rt = q["executorRunTime"]
            med, p95, mx = rt[0], rt[1], rt[2]
            skew.append({
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "task_ms_median": int(med),
                "task_ms_p95": int(p95),
                "task_ms_max": int(mx),
                "straggler_ratio": round(mx / med, 2) if med else None,
            })
        except Exception as e:  # pragma: no cover - REST quirk tolerance
            skew.append({"stage": s["stageId"], "err": str(e)[:80]})
    report["heavy_stages"] = skew
    execs = rest(port, app_id, "/executors")
    report["executor_peak_memory"] = [
        {
            "id": e["id"],
            "peak_jvm_heap_gb": round(
                e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0) / 2**30,
                2,
            ),
            "peak_offheap_gb": round(
                (e.get("peakMemoryMetrics", {}).get("JVMOffHeapMemory", 0)
                 + e.get("peakMemoryMetrics", {}).get("DirectPoolMemory", 0))
                / 2**30, 2,
            ),
        }
        for e in execs
    ]

    # ---- sampled-conversation oracle spot-check at full scale ----
    # derive the sample from the input itself: the lexicographic head
    # (the Zipf-hot conversations — the salting path) plus a
    # deterministic hash-spread across the id space
    distinct = tr.select("conv_id").distinct()
    head = [r.conv_id for r in
            distinct.orderBy("conv_id").limit(args.sample // 2).collect()]
    spread = [r.conv_id for r in
              distinct.orderBy(F.xxhash64("conv_id"))
              .limit(args.sample - len(head)).collect()]
    sample = sorted(set(head + spread))
    checks: dict = {}

    raw_wh = wh.read(spark, "raw").where(F.col("conv_id").isin(sample))
    raw_in = tr.where(F.col("conv_id").isin(sample))
    # 1. per-turn text equality under (conv_id, turn_idx) ordering
    a = raw_wh.select("conv_id", "turn_idx", "role", "tool", "text", "ts")
    b = raw_in.select("conv_id", "turn_idx", "role", "tool", "text", "ts")
    checks["raw_text_equal"] = (
        a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    )
    checks["raw_rows_sampled"] = a.count()

    # 2. series tier equals a fresh derivation from the input
    ser_wh = wh.read(spark, "series").where(F.col("sid").isin(sample)).select(
        "sid", "metric", "ts_ms", "value"
    )
    ser_direct = transcript_series(raw_in, cfg.sampling_interval_ms).select(
        "sid", "metric", "ts_ms", "value"
    )
    checks["series_equal"] = (
        ser_wh.exceptAll(ser_direct).count() == 0
        and ser_direct.exceptAll(ser_wh).count() == 0
    )

    # 3. tier_1h equals independent aggregation of reconstructed points
    segs = wh.read(spark, "segments").where(F.col("sid").isin(sample))
    pts = datapoint_view(segs)
    direct_1h = pts.groupBy(
        "sid", "metric",
        F.expr(f"(ts_ms DIV {HOUR_MS}) * {HOUR_MS}").alias("bucket_ts"),
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("double")).alias("vsum"),
        F.min(F.col("value").cast("float")).alias("vmin"),
        F.max(F.col("value").cast("float")).alias("vmax"),
    )
    t1h = wh.read(spark, "tier_1h").where(F.col("sid").isin(sample)).select(
        "sid", "metric", "bucket_ts", "cnt", "vsum", "vmin", "vmax"
    )
    # cnt/vmin/vmax are order-free (exact ints, f32 extrema) — compared
    # bit-exactly; vsum is a DOUBLE sum of f32 values whose summation
    # order differs between the analytic tier rollup and this
    # re-aggregation, so it gets a 1e-7 relative gate (measured order noise
    # tops out ~3e-9 on 50-point sums of ~1e5-magnitude f32 values) (the engine's
    # DuckDB value oracles pin tier vsum separately via identical-order
    # folds; this check is about 618M-scale plumbing, not float order)
    j = t1h.alias("t").join(
        direct_1h.alias("d"), ["sid", "metric", "bucket_ts"], "full_outer"
    )
    bad = j.where(
        "t.cnt IS NULL OR d.cnt IS NULL OR t.cnt != d.cnt "
        "OR t.vmin != d.vmin OR t.vmax != d.vmax "
        "OR abs(t.vsum - d.vsum) > 1e-7 * greatest(abs(d.vsum), 1.0)"
    ).count()
    checks["tier_1h_equal"] = bad == 0
    checks["tier_1h_rows_sampled"] = t1h.count()

    # 4. reconstruction within the error bound vs the true series
    err = (
        pts.alias("p")
        .join(
            ser_direct.alias("t"),
            ["sid", "metric", "ts_ms"],
        )
        .selectExpr(
            "CASE WHEN t.value = 0 THEN abs(p.value) "
            "ELSE abs(p.value - t.value) / abs(t.value) * 100 END AS pe"
        )
        .agg(F.max("pe").alias("max_pe"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    checks["reconstruction_points"] = err["n"]
    checks["reconstruction_max_pct_err"] = (
        round(float(err["max_pe"]), 4) if err["max_pe"] is not None else None
    )
    checks["reconstruction_within_bound"] = (
        err["max_pe"] is not None
        and err["n"] > 0
        and float(err["max_pe"]) <= args.error_bound + 1e-6
    )

    report["oracle_spot_check"] = checks
    report["all_green"] = (
        all(v for k, v in checks.items() if isinstance(v, bool))
        and checks["raw_rows_sampled"] > 0
        and checks["tier_1h_rows_sampled"] > 0
    )
    print(json.dumps(report))
    with open(os.path.join(REPO, "REHEARSAL_10X.json"), "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
