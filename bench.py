#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Each timed query is forced end-to-end with a noop-format write (full
computation on executors, no driver collect). The headline `pipeline`
entry is the north-star path: synthetic transcript table -> per-conv
series -> model compression -> 1m/1h/1d tiers with gap-fill; its
turns/sec is reported separately. Scaling (local[8] vs local[32]) is
measured by tools/scaling_bench.py and reported in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from modelardb_dynamic_spark import queries as Q  # noqa: E402
from modelardb_dynamic_spark.config import EngineConfig  # noqa: E402
from modelardb_dynamic_spark.session import build_session  # noqa: E402

# queries() entries timed as-is (self-contained; include the compress step
# where they use the segment table, which is exactly the engine's hot path)
BENCH_QUERIES = [
    "seg_count_s",
    "seg_agg_s",
    "dp_restore_range",
    "rollup_1h_gapfill",
    "tier_1d",
    "agg_hour_of_day",
    "segment_restrict",
    "tpch_q1",
    "topk_orders_per_cust",
    "sessionize",
    "asof_purchase",
    "interval_join",
    "dedup_exact",
    "minhash_pairs",
    "simhash_pairs",
    "ngram_jaccard",
    "dup_spans",
    "novelty",
    "bpe_merges",
    "bpe_encode",
    "bm25_search",
    "token_stats",
    "token_rarity",
    "lm_xent",
    "token_entropy",
    "pmi_collocations",
    "zipf_head",
    "vocab_drift",
    "hll_sliding",
    "tfidf_keywords",
    "alp_points",
    "transition_entropy",
    "sax_similar",
    "source_health",
    "hist_sliding",
    "hist_psi",
    "tool_affinity",
    "trimmed_tokens",
    "lang_id",
    "fingerprint",
    "winnow_fingerprints",
    "rolling_fingerprint",
    "embedding_dups",
    "paraphrase_pairs",
    "ann_topk",
    "ann_ivf",
    "ann_recall",
    "wav_features",
    "png_features",
    "avi_features",
    "decontaminate",
    "stratified_sample",
    "pack_documents",
    "repetition_stats",
    "pii_scrub",
    "gopher_quality",
    "corr_pairs",
    "xcorr_leadlag",
    "interp_10m",
    "dod_times",
    "tiered_agg",
    "dup_clusters",
    "leak_splits",
    "curation_verdict",
    "hll_distinct",
    "kmv_distinct",
    "kmv_overlap",
    "turn_transitions",
    "hist_quantile",
    "rolling_zscore",
    "mad_outliers",
    "counter_rate",
    "tiered_hll_range",
    "cms_heavy",
    "tiered_cms_range",
    "ewma_backtest",
    "holt_backtest",
    "hw_backtest",
    "cohort_retention",
    "funnel_daily",
    "m4_downsample",
    "zorder_scan",
    "gap_audit",
    "acf_turnrate",
    "sax_words",
    "reply_latency",
    "burst_episodes",
    "cusum_shifts",
    "interarrival",
    "bloom_members",
    "twa",
    "trend_ols",
    "theil_sen",
    "seasonal_anom",
    "seasonal_envelope",
    "sliding_24h",
    "context_growth",
    "conv_summary",
    "vocab_growth",
    "tool_usage",
    "agent_loops",
    "tool_latency",
    "tool_latency_pct",
    "turn_echo",
    "verbosity_latency",
    "trending_terms",
    "dispersion",
    "peak_concurrency",
    "flatline_runs",
    "benford",
    "decayed_counts",
    "mann_kendall",
    "slo_burn",
    "pacf",
    "temporal_entropy",
    "stream_slo",
    "stream_concurrency",
    "concurrency_occupancy",
    "graph_triangles",
    "hist_ks",
    "seasonal_strength",
    "ljung_box",
    "spectral_daily",
    "forecast_league",
    "ohlc_1h",
    "anomaly_consensus",
    "binseg_split",
    "percentile_bands",
    "locf_fill",
    "latency_trend",
    "type_hour_chi2",
    "rate_shift",
    "fk_audit",
    "nation_revenue",
    "order_percentiles",
    "weighted_sample",
    "hill_tail",
    "ann_pq",
]


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_pipeline(
    spark,
    n_convs: int,
    turns_base: int = 5000,
    input_dir: str | None = None,
    bucketed: bool | None = None,
) -> tuple[float, int]:
    """North-star path: transcripts (parquet) -> series -> segments ->
    1m -> 1h -> 1d (all forced). Input synthesis happens once, to a
    size-keyed parquet dir, OUTSIDE the timed window (the generator is
    deterministic, so every run and parallelism level reads identical
    bytes); the timed pipeline starts at the storage read, like a real
    job. turns_base=5000 with the generator's Zipf skew yields roughly
    50 * n_convs turns with a 15k-turn hot head conversation.

    bucketed (default OFF; MDBS_PIPELINE_BUCKETED=1 to opt in): stage
    the input as a bucket(128, conv_id) table — the north rule's Iceberg
    input layout, reproduced on plain parquet (sources/bucketed.py) —
    and compress with pre_partitioned=True, so the whole compress stage
    runs shuffle-FREE (scan -> in-task sort -> Arrow kernel). Output is
    bit-identical to the shuffled path (tests/test_pipeline.py). Why the
    local default is the SHUFFLED path: a warm quiet-window A/B on this
    box (18.6M turns, local[16], steal <=1%) measured legacy 24.3-28.0 s
    vs bucketed 35.9-36.3 s (29.7-33.9 s with the coalesce-to-2xcores
    read) — a single-JVM "shuffle" is an in-memory copy, so eliminating
    it buys ~nothing here, while the bucketed scan's fixed one-task-per-
    bucket granularity forfeits AQE's balanced partitions and multiplies
    downstream per-(map x reduce) zstd stream setup. On a real cluster
    the same exchange is 12.2 B/turn ACROSS THE NETWORK (~12 TB moved
    twice at 10^12 turns, BENCH.md round-4 headline) and the bucketed
    scan wins; the trade is per-deployment, both paths are tested, and
    the full A/B table is in BENCH.md."""
    import tempfile

    from modelardb_dynamic_spark.operators.compress import compress_transcripts
    from modelardb_dynamic_spark.operators.rollup import downsample, gap_fill, rollup
    from modelardb_dynamic_spark.sources.transcripts import generate_transcripts

    if bucketed is None:
        bucketed = os.environ.get("MDBS_PIPELINE_BUCKETED", "0") == "1"
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    suffix = "_b128" if bucketed else ""
    path = input_dir or os.path.join(
        base, f"mdbs_bench_input_{n_convs}_{turns_base}{suffix}"
    )
    n_buckets = 128
    if bucketed:
        from modelardb_dynamic_spark.sources.bucketed import (
            read_bucketed,
            register_bucketed,
            write_bucketed,
        )

        table = f"mdbs_bench_in_{n_convs}_{turns_base}_b{n_buckets}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            if spark.catalog.tableExists(table):
                spark.sql(f"DROP TABLE `{table}`")
            write_bucketed(
                generate_transcripts(
                    spark, n_convs=n_convs, turns_base=turns_base
                ),
                path,
                table,
                bucket_col="conv_id",
                n_buckets=n_buckets,
                sort_cols=("conv_id", "ts"),
            )
        else:
            register_bucketed(
                spark, path, table, "conv_id", n_buckets, ("conv_id", "ts")
            )
    elif not os.path.exists(os.path.join(path, "_SUCCESS")):
        # fixed 64-file layout regardless of the generating session's core
        # count: scan parallelism must not be capped by whoever staged the
        # input (8 files would cap the read stage at 8 tasks)
        generate_transcripts(
            spark, n_convs=n_convs, turns_base=turns_base
        ).repartition(64).write.mode("overwrite").parquet(path)
    n_turns = spark.read.parquet(path).count()

    t0 = time.time()
    tr = (
        read_bucketed(
            spark, table, n_buckets,
            coalesce_to=2 * spark.sparkContext.defaultParallelism,
        )
        if bucketed
        else spark.read.parquet(path)
    )
    # fused derive+compress: one narrow exchange, or ZERO on the bucketed
    # path (bit-identical to the staged series path, asserted in tests)
    # length_bound 256 (reference default 50 is an in-memory JVM buffer
    # constraint; the vectorized kernel has none): +37% ratio on the noisy
    # token_rate series at identical error bound, same reconstruction
    segs = compress_transcripts(
        tr,
        EngineConfig(
            error_bound=10.0, length_bound=256, sampling_interval_ms=60_000
        ),
        salt_span_points=1 << 16,
        pre_partitioned=bucketed,
    ).persist()
    # segs is persisted above: the rollup branches re-read the cache
    m1 = rollup(segs, 60_000, materialize=False)
    h1 = rollup(segs, 3_600_000, materialize=False).persist()
    d1 = downsample(h1, 86_400_000)
    _force(m1)
    _force(gap_fill(h1, 3_600_000))
    _force(d1)
    wall = time.time() - t0
    from modelardb_dynamic_spark.operators.compress import compression_stats

    stats = compression_stats(segs).collect()[0].asDict()
    bench_pipeline.last_stats = {
        "n_segments": stats["n_segments"],
        "n_points": stats["n_points"],
        "compression_ratio": round(stats["compression_ratio"], 2),
    }
    segs.unpersist()
    h1.unpersist()
    return wall, n_turns


def smooth_control() -> dict:
    """Kernel-level control on REDD-like data (integer watt readings, long
    appliance states): pins down that the bench pipeline's modest corpus
    ratio is DATA-bound (the synthetic transcript series inject hash noise
    by design), not engine-bound — on reference-class smooth data the same
    kernel exceeds the reference's REDD ratios (report Table 4.5: 38.8x at
    10%) and its ~1 M pts/s/core scalar-Java ingest bar."""
    import numpy as np

    from modelardb_dynamic_spark.models.kernels import compress_series

    rng = np.random.default_rng(5)
    n = 1_000_000
    t = np.arange(n, dtype=np.int64) * 60_000
    v = np.empty(n, dtype=np.float32)
    i = 0
    levels = [0.0, 4.0, 85.0, 210.0, 1200.0]
    while i < n:
        run = min(int(rng.integers(60, 12 * 60)), n - i)
        lvl = levels[int(rng.integers(0, len(levels)))]
        v[i : i + run] = lvl + np.round(
            rng.normal(0, max(lvl * 0.004, 0.0), run)
        )
        i += run
    cfg = EngineConfig(error_bound=10.0, sampling_interval_ms=60_000)
    dt = float("inf")
    for _ in range(3):  # best-of-3: see the steal note in main()
        t0 = time.time()
        segs = compress_series(t, v, cfg)
        dt = min(dt, time.time() - t0)
    stored = sum(24 + len(s.model) for s in segs)
    return {
        "smooth_control_ratio_eb10": round(16.0 * n / stored, 1),
        "smooth_control_mpts_per_core": round(n / dt / 1e6, 2),
    }


def main() -> None:
    # bench opt-in: tmpfs shuffle dir (the sandbox /tmp is a slow virtual
    # disk; see session.build_session for the safety gate)
    os.environ.setdefault("MDBS_TMPFS_LOCAL_DIR", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    spark = build_session("bench")

    registry = Q.QUERIES
    # warm the JVM/Arrow path once so q1 doesn't pay session startup
    _force(registry["seg_count_s"](spark, sf_dir))
    # best-of-2 per query: the sandbox VM has a bursty noisy neighbor
    # (sustained 10-33% CPU-steal windows, measured in BENCH.md) and a
    # single contaminated pass misreports capability by multiple x.
    # Repeats are INTERLEAVED (pass 1 of every query, then pass 2) so a
    # multi-minute steal window cannot contaminate both samples of one
    # query — with 62 queries a full pass takes ~10 min, longer than the
    # observed windows. A query whose two samples still disagree >1.6x
    # gets one tiebreak rep (bounded extra cost, only where contamination
    # is evident).
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

    def run_passes(n_passes: int) -> dict[str, float]:
        out: dict[str, float] = {}
        samples: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
        for _ in range(n_passes):
            for name in BENCH_QUERIES:
                t0 = time.time()
                _force(registry[name](spark, sf_dir))
                samples[name].append(time.time() - t0)
        for name, ss in samples.items():
            if len(ss) >= 2 and max(ss) > 1.6 * min(ss):
                t0 = time.time()
                _force(registry[name](spark, sf_dir))
                ss.append(time.time() - t0)
            out[name] = round(min(ss), 3)
        return out

    # COLD: every query self-contained (re-derives its own segment table
    # from the events parquet) — methodology identical to rounds 1-4, so
    # the headline stays comparable across BENCH_r*.json.
    os.environ["MDBS_BENCH_MEMO_SEGMENTS"] = "0"
    timings = run_passes(repeats)
    # WARM: the shared events->segments derivation memoized behind a
    # localCheckpoint (queries._event_segments, opt-in env) — steady-state
    # per-query cost with the ~1.5 s/query fixed re-compression removed
    # (r4 VERDICT #4). Queries that don't touch the segment table are
    # unaffected; their warm number is just one more repetition. ONE pass
    # (memoized timings vary far less than cold ones, and the suite
    # already ran 2x by now — the JVM is hot); the 1.6x tiebreak still
    # reruns any noise-hit query.
    os.environ["MDBS_BENCH_MEMO_SEGMENTS"] = "1"
    _force(registry["seg_count_s"](spark, sf_dir))  # builds the memo once
    warm_timings = run_passes(1)
    os.environ["MDBS_BENCH_MEMO_SEGMENTS"] = "0"

    pipe_best = None
    for _ in range(repeats):
        pipe_wall, n_turns = bench_pipeline(
            spark, n_convs=max(256, int(200_000 * sf))
        )
        if pipe_best is None or pipe_wall < pipe_best[0]:
            pipe_best = (pipe_wall, n_turns)
    pipe_wall, n_turns = pipe_best
    timings["pipeline"] = round(pipe_wall, 3)

    total = round(sum(timings.values()), 3)
    warm_total = round(sum(warm_timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline queries + transcript tier pipeline wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm_timings,
                "warm_total": warm_total,
                "sf": sf,
                "pipeline_turns": n_turns,
                "turns_per_sec": round(n_turns / pipe_wall, 1),
                # reference yardstick: REDD ungrouped ratio 38.8 at 10%
                # error (ModelarDB-Dynamic_report.pdf Table 4.5); ratios are
                # data-dependent
                **getattr(bench_pipeline, "last_stats", {}),
                **smooth_control(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
