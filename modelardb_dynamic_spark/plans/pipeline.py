"""The retention-tier pipeline: raw -> series -> segments -> 1m -> 1h -> 1d.

Each stage is computed bucket-chunk by bucket-chunk (series-hash buckets,
consistent across all stages because every table keys on the same sid), and
every bucket commits a lineage manifest once its parquet directory is in
place — so a killed pipeline resumes mid-tier, skipping completed buckets
(plans/checkpoint.py). Chunks keep many buckets per Spark job so the
cluster stays fully parallel while bounding re-work after a crash.

Tiers (FIXTURES.md §4): tier_1m is rolled up from segments analytically;
tier_1h and tier_1d are pure columnar downsamples of the previous tier.
Retention: drop raw/segment data older than a horizon once the coarser
tiers cover it (here: filter-rewrite per bucket; Iceberg deployment:
overwrite-by-filter / partition drop).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modelardb_dynamic_spark.config import EngineConfig
from modelardb_dynamic_spark.operators.compress import compress
from modelardb_dynamic_spark.operators.rollup import downsample, gap_fill, rollup
from modelardb_dynamic_spark.plans.checkpoint import Lineage
from modelardb_dynamic_spark.sources.catalog import Warehouse, sid_bucket
from modelardb_dynamic_spark.sources.timeseries import transcript_series

MINUTE_MS = 60_000
HOUR_MS = 3_600_000
DAY_MS = 86_400_000

TIERS = (("tier_1m", MINUTE_MS), ("tier_1h", HOUR_MS), ("tier_1d", DAY_MS))


class TierPipeline:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: Warehouse,
        cfg: EngineConfig,
        chunk_buckets: int = 16,
        salt_span_points: int | None = 1 << 20,
        segment_layout: str = "bucket",
        zorder_partitions: int | None = None,
    ):
        if segment_layout not in ("bucket", "zorder"):
            raise ValueError(f"unknown segment_layout {segment_layout!r}")
        self.spark = spark
        self.wh = warehouse
        self.cfg = cfg
        self.chunk_buckets = chunk_buckets
        self.salt_span_points = salt_span_points
        # "bucket": files land as the compress shuffle produced them
        # (hash(sid)-mixed). "zorder": one extra repartitionByRange on a
        # Morton key of (series rank, start_ts) so file/row-group min-max
        # stats prune per-series scans AND time-window rollups
        # (operators/zorder.py; same idea as Delta OPTIMIZE ZORDER).
        self.segment_layout = segment_layout
        self.zorder_partitions = zorder_partitions

    # -- stage plumbing ------------------------------------------------------

    def _run_stage(
        self,
        stage: str,
        fingerprint: str,
        build: "callable",
        ts_col: str,
        fail_after_chunks: int | None = None,
        only_buckets: list[int] | None = None,
    ) -> None:
        """build(bucket_ids) -> DataFrame carrying an sbucket column.

        Writes each chunk partitioned by sbucket, moves bucket dirs into the
        stage table atomically, then commits one manifest per bucket.
        fail_after_chunks injects a crash for resume tests. only_buckets
        restricts the stage to a bucket subset (incremental append path) —
        untouched buckets keep their existing data AND manifests.
        """
        root = self.wh.path(stage)
        os.makedirs(root, exist_ok=True)
        lineage = Lineage(root)
        if only_buckets is not None and not lineage.metrics().get("buckets"):
            # a stage that has never been built has nothing to restrict to:
            # an incremental append on a warehouse predating this stage
            # (e.g. cms_1d added after hist/hll) must BACKFILL all buckets,
            # or untouched-bucket queries would silently answer from
            # missing counters while lineage high-water (a max over
            # existing manifests) still validated the cover
            only_buckets = None
        buckets = (
            sorted(only_buckets)
            if only_buckets is not None
            else list(range(self.wh.n_buckets))
        )
        chunks = [
            buckets[i : i + self.chunk_buckets]
            for i in range(0, len(buckets), self.chunk_buckets)
        ]
        done_chunks = 0
        for chunk in chunks:
            pending = [b for b in chunk if not lineage.is_done(b, fingerprint)]
            if not pending:
                continue
            t0 = time.time()
            df = build(pending)
            tmp = root + "." + uuid.uuid4().hex[:8] + ".tmp"
            (
                df.where(F.col("sbucket").isin(pending))
                .write.mode("overwrite")
                .partitionBy("sbucket")
                .parquet(tmp)
            )
            stats = {}
            # a rewrite can legitimately produce ZERO rows for a whole
            # chunk (retain/purge to empty): partitionBy writes no part
            # files then, and reading the bare tmp dir would fail schema
            # inference — every pending bucket is simply empty
            tmp_nonempty = any(
                f.endswith(".parquet")
                for d in (
                    os.listdir(tmp) if os.path.isdir(tmp) else ()
                )
                if os.path.isdir(os.path.join(tmp, d))
                for f in os.listdir(os.path.join(tmp, d))
            )
            if tmp_nonempty:
                tmp_df = self.spark.read.parquet(tmp)
                # timestamp OR timestamp_ntz (NTZ parquet reads interpret
                # in the session tz, pinned UTC) -> epoch-ms high-water
                # mark; anything else is already a long
                hw_col = (
                    F.unix_millis(F.col(ts_col).cast("timestamp"))
                    if dict(tmp_df.dtypes)
                    .get(ts_col, "")
                    .startswith("timestamp")
                    else F.col(ts_col)
                )
                for r in (
                    tmp_df.groupBy("sbucket")
                    .agg(
                        F.count(F.lit(1)).alias("rows"),
                        F.max(hw_col).alias("hw"),
                    )
                    .collect()
                ):
                    stats[r["sbucket"]] = (r["rows"], r["hw"])
            wall = time.time() - t0
            for b in pending:
                src = os.path.join(tmp, f"sbucket={b}")
                dst = os.path.join(root, f"sbucket={b}")
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                if os.path.exists(src):
                    os.rename(src, dst)
                else:
                    os.makedirs(dst, exist_ok=True)  # empty bucket
                rows, hw = stats.get(b, (0, None))
                lineage.commit(
                    stage, b, rows, hw, fingerprint, wall / len(pending),
                    ts_col=ts_col,
                )
            shutil.rmtree(tmp, ignore_errors=True)
            done_chunks += 1
            if fail_after_chunks is not None and done_chunks >= fail_after_chunks:
                raise RuntimeError(f"injected failure after {done_chunks} chunks")

    def _live_buckets(self, table: str, bucket_ids: list[int]) -> list[int]:
        """Buckets that actually hold parquet part files. A fully-retained
        or never-written bucket leaves an empty dir (or none); feeding such
        paths to spark.read.parquet fails schema inference, so every reader
        of a bucket subset must filter through this first."""
        root = self.wh.path(table)
        out = []
        for b in bucket_ids:
            d = os.path.join(root, f"sbucket={b}")
            if os.path.isdir(d) and any(
                f.endswith(".parquet") for f in os.listdir(d)
            ):
                out.append(b)
        return out

    def _read_buckets(self, table: str, bucket_ids: list[int]) -> DataFrame:
        live = self._live_buckets(table, bucket_ids)
        if not live:
            # every requested bucket is committed-empty (e.g. a purge or
            # retain emptied it): serve an empty frame with the table's
            # schema taken from any live bucket — parquet schema inference
            # needs at least one part file
            any_live = self._live_buckets(
                table, list(range(self.wh.n_buckets))
            )
            if not any_live:
                raise ValueError(
                    f"table {table!r} has no non-empty bucket to read"
                )
            live, limit0 = any_live[:1], True
        else:
            limit0 = False
        df = self.spark.read.option("basePath", self.wh.path(table)).parquet(
            *[
                os.path.join(self.wh.path(table), f"sbucket={b}")
                for b in live
            ]
        )
        return df.limit(0) if limit0 else df

    # -- stages --------------------------------------------------------------

    def ingest_raw(
        self,
        transcripts: DataFrame,
        fingerprint: str = "raw-v1",
        only_buckets: list[int] | None = None,
    ) -> None:
        """Persist the raw tier bucketed by conv_id (per-turn text survives
        byte-identically; verified by tests under ORDER BY conv_id, turn_idx)."""

        def build(bucket_ids: list[int]) -> DataFrame:
            # filter to the chunk, rebalance, and SORT each task by sbucket:
            # with unsorted input every scan task holds an open parquet
            # writer per bucket dir in the chunk simultaneously (writer
            # page buffers x wide text rows x tasks OOMed the 618M-turn
            # rehearsal at a 64 GB heap); sorted input lets the dynamic-
            # partition writer close each bucket's file before opening the
            # next — one open writer per task at full parallelism. The
            # Iceberg deployment states the same requirement as the
            # write.distribution-mode/sort-order table properties.
            par = self.spark.sparkContext.defaultParallelism
            return (
                transcripts.withColumn(
                    "sbucket", sid_bucket(F.col("conv_id"), self.wh.n_buckets)
                )
                .where(F.col("sbucket").isin(bucket_ids))
                .repartition(max(len(bucket_ids), 2 * par))
                .sortWithinPartitions("sbucket")
            )

        self._run_stage("raw", fingerprint, build, ts_col="ts",
                        only_buckets=only_buckets)

    def build_series(
        self,
        fingerprint: str = "series-v1",
        only_buckets: list[int] | None = None,
        preserve_below: int | None = None,
    ) -> None:
        """preserve_below (append-after-raw-retention path): raw no longer
        holds history below the retention horizon, but the EXISTING series
        stage does — keep its rows with ts_ms < preserve_below (a grid
        boundary >= the horizon, so the straddling grid bucket's old row —
        built when history was complete — survives) and recompute only
        from raw turns at/after it. Exact as long as no new turn lands
        below preserve_below, which append() rejects."""

        def build(bucket_ids: list[int]) -> DataFrame:
            from modelardb_dynamic_spark.sources.timeseries import to_ms

            raw = self._read_buckets("raw", bucket_ids)
            if preserve_below is not None:
                raw = raw.where(to_ms("ts") >= preserve_below)
            s = transcript_series(raw, self.cfg.sampling_interval_ms)
            if preserve_below is not None:
                old = (
                    self._read_buckets("series", bucket_ids)
                    .drop("sbucket")
                    .where(f"ts_ms < {preserve_below}")
                )
                s = s.unionByName(old)
            return s.withColumn("sbucket", sid_bucket(F.col("sid"), self.wh.n_buckets))

        self._run_stage("series", fingerprint, build, ts_col="ts_ms",
                        only_buckets=only_buckets)

    def build_segments(
        self,
        fingerprint: str = "segments-v1",
        fail_after_chunks: int | None = None,
        only_buckets: list[int] | None = None,
    ) -> None:
        def build(bucket_ids: list[int]) -> DataFrame:
            series = self._read_buckets("series", bucket_ids)
            segs = compress(series, self.cfg, salt_span_points=self.salt_span_points)
            segs = segs.withColumn(
                "sbucket", sid_bucket(F.col("sid"), self.wh.n_buckets)
            )
            if self.segment_layout == "zorder":
                from modelardb_dynamic_spark.operators.zorder import zorder_keys

                keyed = zorder_keys(segs, "sid", "start_ts", bits=10)
                parts = ["sbucket", "zval"]
                keyed = (
                    keyed.repartitionByRange(self.zorder_partitions, *parts)
                    if self.zorder_partitions
                    else keyed.repartitionByRange(*parts)
                )
                segs = keyed.sortWithinPartitions(*parts).drop("zval")
            return segs

        self._run_stage(
            "segments",
            fingerprint + ("+zorder" if self.segment_layout == "zorder" else ""),
            build, ts_col="end_ts",
            fail_after_chunks=fail_after_chunks, only_buckets=only_buckets,
        )

    def build_tiers(
        self,
        fingerprint: str = "tiers-v1",
        only_buckets: list[int] | None = None,
    ) -> None:
        prev = "segments"
        for tier_name, bucket_ms in TIERS:
            def build(bucket_ids: list[int], prev=prev, bucket_ms=bucket_ms) -> DataFrame:
                src = self._read_buckets(prev, bucket_ids)
                # src is a storage scan: re-scanning it in the two rollup
                # branches is cheaper than copying it into the block store
                tier = (
                    rollup(src, bucket_ms, materialize=False)
                    if prev == "segments"
                    else downsample(src, bucket_ms)
                )
                return tier.withColumn(
                    "sbucket", sid_bucket(F.col("sid"), self.wh.n_buckets)
                )

            self._run_stage(tier_name, fingerprint, build, ts_col="bucket_ts",
                            only_buckets=only_buckets)
            prev = tier_name

    def build_sketch_tiers(
        self,
        fingerprint: str = "sketch-v1",
        only_buckets: list[int] | None = None,
        preserve_below_hour: int | None = None,
        preserve_below_day: int | None = None,
    ) -> None:
        """Mergeable sketch tiers beside the cnt/vsum/vmin/vmax tiers
        (operators/sketches.py): per conversation,
        - hist_1h / hist_1d — HDR log2x4 histogram of per-turn token
          counts (p50/p90/p99 turn length per conv per hour/day straight
          from the tier, hist_quantiles);
        - hll_1d — HLL-256 distinct turn contents per conv per day
          (repetition/degeneracy signal);
        - kmv_1d — KMV bottom-64 of the active conversation set per day
          keyed by sbucket (day-over-day overlap/churn, overlap_convs);
        - bloom_1d — Bloom membership filter of the active conversation
          set per day keyed by sbucket ("was conv X active on day D"
          point probes, active_convs).
        Built from the raw stage per bucket chunk like every other stage:
        lineage manifests, resume, and incremental append() all apply."""
        from modelardb_dynamic_spark.operators.sketches import (
            cms_tier,
            hist_downsample,
            hist_tier,
            hll_tier,
        )

        _turns = self._raw_turns

        def build_hist_1h(bucket_ids: list[int]) -> DataFrame:
            src = _turns(bucket_ids)
            if preserve_below_hour is not None:
                src = src.where(f"ts_ms >= {preserve_below_hour}")
            t = hist_tier(
                src, ["sid"], "tokens",
                f"(ts_ms DIV {HOUR_MS}) * {HOUR_MS}",
            )
            if preserve_below_hour is not None:
                old = (
                    self._read_buckets("hist_1h", bucket_ids)
                    .drop("sbucket")
                    .where(f"bucket_ts < {preserve_below_hour}")
                )
                t = t.unionByName(old)
            return t.withColumn("sbucket", sid_bucket(F.col("sid"), self.wh.n_buckets))

        self._run_stage("hist_1h", fingerprint, build_hist_1h,
                        ts_col="bucket_ts", only_buckets=only_buckets)

        def build_hist_1d(bucket_ids: list[int]) -> DataFrame:
            t = hist_downsample(
                self._read_buckets("hist_1h", bucket_ids).drop("sbucket"),
                ["sid"], DAY_MS,
            )
            return t.withColumn("sbucket", sid_bucket(F.col("sid"), self.wh.n_buckets))

        self._run_stage("hist_1d", fingerprint, build_hist_1d,
                        ts_col="bucket_ts", only_buckets=only_buckets)

        def build_hll_1d(bucket_ids: list[int]) -> DataFrame:
            src = _turns(bucket_ids)
            if preserve_below_day is not None:
                src = src.where(f"ts_ms >= {preserve_below_day}")
            t = hll_tier(
                src, ["sid"], "text",
                f"(ts_ms DIV {DAY_MS}) * {DAY_MS}",
            )
            if preserve_below_day is not None:
                old = (
                    self._read_buckets("hll_1d", bucket_ids)
                    .drop("sbucket")
                    .where(f"bucket_ts < {preserve_below_day}")
                )
                t = t.unionByName(old)
            return t.withColumn("sbucket", sid_bucket(F.col("sid"), self.wh.n_buckets))

        self._run_stage("hll_1d", fingerprint, build_hll_1d,
                        ts_col="bucket_ts", only_buckets=only_buckets)

        def build_cms_1d(bucket_ids: list[int]) -> DataFrame:
            # Count-Min counters of conv_id activity per day (hot-
            # conversation audit). Keyed by sbucket so each warehouse
            # bucket holds a valid partial sketch of ITS conversations —
            # counters merge by sum, so range queries just sum across
            # sbuckets, and append() recomputes only touched buckets.
            src = _turns(bucket_ids)
            if preserve_below_day is not None:
                src = src.where(f"ts_ms >= {preserve_below_day}")
            t = cms_tier(
                src.withColumn(
                    "sbucket", sid_bucket(F.col("sid"), self.wh.n_buckets)
                ),
                ["sbucket"], "sid",
                f"(ts_ms DIV {DAY_MS}) * {DAY_MS}",
            )
            if preserve_below_day is not None:
                old = self._read_buckets("cms_1d", bucket_ids).where(
                    f"bucket_ts < {preserve_below_day}"
                )
                t = t.unionByName(old)
            return t

        self._run_stage("cms_1d", fingerprint, build_cms_1d,
                        ts_col="bucket_ts", only_buckets=only_buckets)

        def build_kmv_1d(bucket_ids: list[int]) -> DataFrame:
            # KMV bottom-64 sketch of the ACTIVE CONVERSATION SET per
            # day, keyed by sbucket: the sid_bucket hash partitions
            # conversations disjointly, so each warehouse bucket's
            # sketch is the exact bottom-k of ITS convs and a global
            # day sketch is just the re-ranked union across sbuckets.
            # Unlike hll_1d this supports INTERSECTION — day-over-day
            # active-set overlap/churn (overlap_convs) — which HLL
            # registers cannot express.
            from modelardb_dynamic_spark.operators.sketches import kmv_tier

            src = _turns(bucket_ids)
            if preserve_below_day is not None:
                src = src.where(f"ts_ms >= {preserve_below_day}")
            t = kmv_tier(
                src.withColumn(
                    "sbucket", sid_bucket(F.col("sid"), self.wh.n_buckets)
                ),
                ["sbucket"], "sid",
                f"(ts_ms DIV {DAY_MS}) * {DAY_MS}",
            )
            if preserve_below_day is not None:
                old = self._read_buckets("kmv_1d", bucket_ids).where(
                    f"bucket_ts < {preserve_below_day}"
                )
                t = t.unionByName(old)
            return t

        self._run_stage("kmv_1d", fingerprint, build_kmv_1d,
                        ts_col="bucket_ts", only_buckets=only_buckets)

        def build_bloom_1d(bucket_ids: list[int]) -> DataFrame:
            # Bloom filter of the ACTIVE CONVERSATION SET per day, keyed
            # by sbucket (each warehouse bucket's filter covers exactly
            # ITS conversations — sid_bucket partitions them disjointly,
            # so a probe consults only its own bucket's 512 words). The
            # MEMBERSHIP question beside kmv_1d's intersection and
            # cms_1d's frequency: "was conv X active on day D" as a
            # point probe with no false negatives.
            from modelardb_dynamic_spark.operators.sketches import bloom_tier

            src = _turns(bucket_ids)
            if preserve_below_day is not None:
                src = src.where(f"ts_ms >= {preserve_below_day}")
            t = bloom_tier(
                src.withColumn(
                    "sbucket", sid_bucket(F.col("sid"), self.wh.n_buckets)
                ),
                ["sbucket"], "sid",
                f"(ts_ms DIV {DAY_MS}) * {DAY_MS}",
            )
            if preserve_below_day is not None:
                old = self._read_buckets("bloom_1d", bucket_ids).where(
                    f"bucket_ts < {preserve_below_day}"
                )
                t = t.unionByName(old)
            return t

        self._run_stage("bloom_1d", fingerprint, build_bloom_1d,
                        ts_col="bucket_ts", only_buckets=only_buckets)

    def run(self, transcripts: DataFrame, sketches: bool = False) -> None:
        self.ingest_raw(transcripts)
        self.build_series()
        self.build_segments()
        self.build_tiers()
        if sketches:
            self.build_sketch_tiers()

    # -- incremental maintenance ----------------------------------------------

    def append(self, new_transcripts: DataFrame, batch_id: str) -> dict:
        """Incrementally maintain every stage for a batch of NEW, LATE, or
        REPLACED turns: upsert into raw on the (conv_id, turn_idx) turn key
        (new rows win), then recompute ONLY the series-hash buckets the
        batch touches — series, segments, and all three tiers. Untouched
        buckets keep their data and lineage manifests byte-for-byte, so
        the cost of an append is (touched buckets / total buckets) of a
        full rebuild regardless of history size; at 10^12 turns a daily
        batch touching k of 4096 buckets re-rolls only those k. This is
        also the repair path for out-of-order arrivals that land INSIDE
        already-rolled-up buckets (which range_agg's high-water routing
        deliberately does not paper over — see range_agg). Idempotent: a
        crashed-and-rerun append re-merges via an anti-join on the turn
        key, so rows never duplicate; per-bucket fingerprints carry the
        batch_id, so completed buckets are skipped on rerun exactly like
        a resumed run. Iceberg deployment: the raw upsert becomes a
        MERGE INTO and the bucket rewrites overwrite-by-filter on the
        bucket partition; the lineage manifest stays the progress record.
        """
        nb = self.wh.n_buckets
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        # retention interaction: raw below the horizon is GONE, so stages
        # rebuilt from raw must preserve their old pre-horizon rows and
        # new turns may not land below the retention floor (a retained
        # TSDB rejects below-horizon inserts). The floor is the horizon
        # rounded UP to the coarsest maintained bucket (day when sketch
        # tiers exist, else the engine grid) so no straddling bucket ever
        # needs data that only existed pre-retention.
        if self.retention_horizon("series") is not None:
            raise ValueError(
                "append() cannot incrementally maintain a warehouse whose "
                "SERIES stage is retained: the segment cascade needs each "
                "conversation's full series history. Retain raw only (the "
                "coarser stages keep history), or rebuild."
            )
        raw_h = self.retention_horizon("raw")
        rejected = 0
        si = self.cfg.sampling_interval_ms
        sketches = os.path.exists(self.wh.path("hist_1h"))
        if raw_h is not None:
            from modelardb_dynamic_spark.sources.timeseries import to_ms

            unit = DAY_MS if sketches else si
            floor_ms = ((raw_h + unit - 1) // unit) * unit
            n0 = new_transcripts.count()
            new_transcripts = new_transcripts.where(to_ms("ts") >= floor_ms)
            rejected = n0 - new_transcripts.count()
        # a batch may itself carry several rows for one turn key (e.g. an
        # availableNow stream collapsing original + correction into one
        # micro-batch): keep exactly one, deterministically — latest ts
        # wins, content hash breaks exact-ts ties
        from pyspark.sql import Window as _W

        dedup_w = _W.partitionBy("conv_id", "turn_idx").orderBy(
            F.desc("ts"), F.desc(F.md5(F.concat_ws("\x1f", "role", "text", "tool")))
        )
        new_transcripts = (
            new_transcripts.withColumn("_rn", F.row_number().over(dedup_w))
            .where("_rn = 1")
            .drop("_rn")
        )
        aff = sorted(
            r["b"]
            for r in new_transcripts.select(
                sid_bucket(F.col("conv_id"), nb).alias("b")
            )
            .distinct()
            .collect()
        )
        if not aff:
            return {
                "affected_buckets": [], "n_buckets": nb,
                "rejected_below_retention": rejected,
            }

        def build(bucket_ids: list[int]) -> DataFrame:
            root = self.wh.path("raw")
            have = [
                b
                for b in bucket_ids
                if os.path.exists(os.path.join(root, f"sbucket={b}"))
            ]
            if have:  # bootstrap: first-ever batch has nothing to merge
                old = self._read_buckets("raw", have).select(cols)
                merged = old.join(
                    new_transcripts.select("conv_id", "turn_idx"),
                    ["conv_id", "turn_idx"],
                    "left_anti",
                ).unionByName(new_transcripts.select(cols))
            else:
                merged = new_transcripts.select(cols)
            return merged.withColumn(
                "sbucket", sid_bucket(F.col("conv_id"), nb)
            )

        self._run_stage(
            "raw", f"raw+{batch_id}", build, ts_col="ts", only_buckets=aff
        )
        pb_si = (
            ((raw_h + si - 1) // si) * si if raw_h is not None else None
        )
        self.build_series(
            fingerprint=f"series+{batch_id}", only_buckets=aff,
            preserve_below=pb_si,
        )
        self.build_segments(fingerprint=f"segments+{batch_id}", only_buckets=aff)
        self.build_tiers(fingerprint=f"tiers+{batch_id}", only_buckets=aff)
        if sketches:
            self.build_sketch_tiers(
                fingerprint=f"sketch+{batch_id}", only_buckets=aff,
                preserve_below_hour=(
                    ((raw_h + HOUR_MS - 1) // HOUR_MS) * HOUR_MS
                    if raw_h is not None else None
                ),
                preserve_below_day=(
                    ((raw_h + DAY_MS - 1) // DAY_MS) * DAY_MS
                    if raw_h is not None else None
                ),
            )
        return {
            "affected_buckets": aff, "n_buckets": nb,
            "rejected_below_retention": rejected,
        }

    # -- right-to-be-forgotten ------------------------------------------------

    def purge(self, conv_ids, batch_id: str) -> dict:
        """Delete EVERY trace of the given conversations from EVERY
        stage — the GDPR/right-to-be-forgotten path, priced like
        append(): only the hash(conv_id) buckets the purge set maps to
        are rewritten, untouched buckets keep data and manifests
        byte-for-byte, so at 10^12 turns deleting k users' conversations
        re-rolls k-ish of 4096 buckets, not the table.

        Mechanics per stage family:
        - sid-keyed tables (raw, series, segments, tier_1m/1h/1d,
          series_arch, hist_1h/1d, hll_1d): a bucket-local broadcast
          anti-join filter rewrite — exact, no kernel recompute, and it
          works BELOW a retention floor too (filtering preserved rows is
          always possible; recomputing them is not).
        - sbucket-MERGED sketches (cms_1d, kmv_1d, bloom_1d): a merged
          sketch cannot subtract a member (the purged conv would still
          answer membership/frequency probes), so affected buckets are
          REBUILT from the post-purge raw. If raw retention already
          dropped sub-floor turns, those sketch rows cannot be rebuilt
          without the purged member — they are conservatively DROPPED
          for affected buckets (compliance outranks sketch coverage)
          and the loss is reported in the metrics.

        Idempotent + resumable like every stage: fingerprints carry
        batch_id, a crashed purge resumes past completed buckets.
        Iceberg deployment: the filter rewrites become DELETE FROM ...
        WHERE on the bucket partition; lineage stays the progress record.

        conv_ids: iterable of conv_id strings (the purge list is
        user-supplied and bounded — broadcast-sized by construction).
        Returns {"affected_buckets", "rows_removed": {stage: n}, ...}.
        """
        ids = sorted(set(conv_ids))
        nb = self.wh.n_buckets
        if not ids:
            return {"affected_buckets": [], "rows_removed": {}}
        id_df = self.spark.createDataFrame(
            [(i,) for i in ids], "purge_id string"
        ).localCheckpoint()
        aff = sorted(
            r["b"]
            for r in id_df.select(
                sid_bucket(F.col("purge_id"), nb).alias("b")
            )
            .distinct()
            .collect()
        )
        removed: dict[str, int] = {}
        # the fingerprint carries BOTH the batch id and a digest of the
        # purge set: re-running the same batch_id with a different victim
        # list must force a rewrite, not silently no-op against buckets
        # committed for the earlier set
        pfp = "purge+{}+{}".format(
            batch_id,
            hashlib.sha256(",".join(ids).encode("utf-8")).hexdigest()[:12],
        )

        def _filter_stage(stage: str, key_expr: str, ts_col: str) -> None:
            root = self.wh.path(stage)
            if not os.path.exists(root):
                return
            # a fully-retained stage leaves empty bucket dirs (no parquet
            # part files) — nothing to purge there, and reading them
            # would fail schema inference
            live = self._live_buckets(stage, aff)
            if not live:
                removed[stage] = 0
                return
            # "before" comes from the pre-purge lineage manifests, not a
            # count inside build(): build() is skipped for buckets already
            # committed under this fingerprint, so a resumed/re-run purge
            # would otherwise understate (or negate) rows_removed — and
            # the manifests save a count() job per chunk
            before = sum(
                rows for b, (rows, _) in self._bucket_stats(stage, live).items()
            )

            def build(bucket_ids: list[int]) -> DataFrame:
                return self._read_buckets(stage, bucket_ids).join(
                    F.broadcast(id_df),
                    F.expr(key_expr) == F.col("purge_id"),
                    "left_anti",
                )

            self._run_stage(
                stage, pfp, build, ts_col=ts_col,
                only_buckets=live,
            )
            after = sum(
                rows for b, (rows, _) in self._bucket_stats(stage, live).items()
            )
            removed[stage] = before - after

        _filter_stage("raw", "conv_id", "ts")
        _filter_stage("series", "sid", "ts_ms")
        _filter_stage("segments", "sid", "end_ts")
        for tier_name, _ in TIERS:
            _filter_stage(tier_name, "sid", "bucket_ts")
        _filter_stage(
            "series_arch",
            f"substring_index(akey, '{self._AKEY_SEP}', 1)",
            "hw_ts",
        )
        for sk in ("hist_1h", "hist_1d", "hll_1d"):
            _filter_stage(sk, "sid", "bucket_ts")

        # sbucket-merged sketches: rebuild affected buckets from the
        # now-purged raw (no preserve floor — see docstring)
        dropped_below_floor = 0
        if os.path.exists(self.wh.path("cms_1d")):
            from modelardb_dynamic_spark.operators.sketches import (
                bloom_tier,
                cms_tier,
                kmv_tier,
            )

            raw_h = self.retention_horizon("raw")
            floor = (
                ((raw_h + DAY_MS - 1) // DAY_MS) * DAY_MS
                if raw_h is not None else None
            )
            for sk, tier_fn in (
                ("cms_1d", cms_tier),
                ("kmv_1d", kmv_tier),
                ("bloom_1d", bloom_tier),
            ):
                if not os.path.exists(self.wh.path(sk)):
                    continue
                if floor is not None:
                    live_sk = self._live_buckets(sk, aff)
                    if live_sk:
                        dropped_below_floor += (
                            self._read_buckets(sk, live_sk)
                            .where(f"bucket_ts < {floor}")
                            .count()
                        )

                def build(
                    bucket_ids: list[int], tier_fn=tier_fn
                ) -> DataFrame:
                    src = self._raw_turns(bucket_ids)
                    if floor is not None:
                        # the raw tier has already dropped sub-floor turns,
                        # so a straddling day can only be PARTIALLY rebuilt
                        # — drop it entirely (documented conservative
                        # behavior; the rows are counted above)
                        src = src.where(f"ts_ms >= {floor}")
                    return tier_fn(
                        src.withColumn(
                            "sbucket", sid_bucket(F.col("sid"), nb)
                        ),
                        ["sbucket"], "sid",
                        f"(ts_ms DIV {DAY_MS}) * {DAY_MS}",
                    )

                self._run_stage(
                    sk, pfp, build, ts_col="bucket_ts",
                    only_buckets=aff,
                )
        return {
            "affected_buckets": aff,
            "n_buckets": nb,
            "n_conv_ids": len(ids),
            "rows_removed": removed,
            "sketch_rows_dropped_below_floor": dropped_below_floor,
        }

    def _bucket_stats(self, stage: str, buckets: list[int]) -> dict:
        """Post-rewrite row counts per bucket from the lineage manifests
        (no rescan)."""
        lineage = Lineage(self.wh.path(stage))
        out = {}
        for b in buckets:
            m = lineage.get(b)
            if m is not None:
                out[b] = (m.rows, m.high_water_ts)
        return out

    # -- integrity audit ------------------------------------------------------

    def fsck(self, tables: list[str] | None = None) -> dict:
        """Warehouse integrity audit: verify every committed bucket's
        lineage manifest against the parquet that is actually on disk —
        row count per bucket, and the event-time high-water mark. The
        filesystem-only status surface (warehouse_status) trusts the
        manifests; this is the deep check an operator runs after a
        suspicious crash, a manual copy, or a storage migration.

        Returns {table: {"buckets_checked": n, "rows_manifest": n,
        "rows_actual": n, "mismatches": [{bucket, manifest_rows,
        actual_rows, manifest_hw, actual_hw}]}} — empty mismatch lists
        mean the lineage is an exact description of the data. The
        high-water check uses the `ts_col` each manifest records; legacy
        manifests without it (or buckets whose manifest says 0 rows) are
        verified on row count only. Cost: ONE count+max-by-bucket scan
        per stage, no shuffle of data columns.
        """
        out: dict = {}
        names = tables if tables is not None else sorted(
            n for n in os.listdir(self.wh.root)
            if os.path.isdir(os.path.join(self.wh.path(n), "_lineage"))
        )
        for name in names:
            root = self.wh.path(name)
            lineage = Lineage(root)
            buckets = lineage.completed_buckets()
            if not buckets:
                out[name] = {
                    "buckets_checked": 0, "rows_manifest": 0,
                    "rows_actual": 0, "mismatches": [],
                }
                continue
            manifests = {b: lineage.get(b) for b in buckets}
            # every stage writes one ts_col for all its buckets; take any
            ts_col = next(
                (m.ts_col for m in manifests.values() if m and m.ts_col),
                None,
            )
            actual: dict[int, int] = {b: 0 for b in buckets}
            actual_hw: dict[int, int | None] = {b: None for b in buckets}
            live = self._live_buckets(name, buckets)
            if live:
                df = self._read_buckets(name, live)
                aggs = [F.count(F.lit(1)).alias("rows")]
                if ts_col is not None and ts_col in df.columns:
                    hw_col = (
                        F.unix_millis(F.col(ts_col).cast("timestamp"))
                        if dict(df.dtypes)[ts_col].startswith("timestamp")
                        else F.col(ts_col)
                    )
                    aggs.append(F.max(hw_col).alias("hw"))
                for r in df.groupBy("sbucket").agg(*aggs).collect():
                    actual[int(r["sbucket"])] = int(r["rows"])
                    if len(aggs) > 1 and r["hw"] is not None:
                        actual_hw[int(r["sbucket"])] = int(r["hw"])
            mismatches = []
            rows_m = rows_a = 0
            for b in buckets:
                m = manifests[b]
                rows_m += m.rows
                rows_a += actual.get(b, 0)
                hw_checkable = (
                    ts_col is not None and m.ts_col is not None
                    and actual.get(b, 0) > 0
                )
                hw_bad = hw_checkable and (
                    (m.high_water_ts or None) != actual_hw.get(b)
                )
                if m.rows != actual.get(b, 0) or hw_bad:
                    mismatches.append(
                        {
                            "bucket": b,
                            "manifest_rows": m.rows,
                            "actual_rows": actual.get(b, 0),
                            "manifest_hw": m.high_water_ts,
                            "actual_hw": actual_hw.get(b),
                        }
                    )
            out[name] = {
                "buckets_checked": len(buckets),
                "rows_manifest": rows_m,
                "rows_actual": rows_a,
                "mismatches": mismatches,
            }
        return out

    # -- retention -----------------------------------------------------------

    _TS_COLS = {"raw": "ts", "series": "ts_ms"}  # tiers use bucket_ts

    def retain(
        self, table: str, horizon_ms: int, fingerprint_suffix: str = ""
    ) -> None:
        """Drop a stage table's rows older than horizon (coarser tiers
        retain the aggregates). Filter-rewrite per bucket, lineage
        re-committed, and the horizon RECORDED in <table>/_retention.json
        so range_agg routes around the dropped region (low-water) and
        validate_cover can refuse queries nobody can answer anymore.

        Crash-safety + monotonicity: the marker is written BEFORE the
        destructive rewrite (routing around still-present data is exact;
        the reverse — dropped data with no marker — silently undercounts)
        and horizons only ever grow (a second retain with a smaller
        horizon cannot resurrect rows). A full rebuild under a new
        fingerprint DOES resurrect history; the stale marker then makes
        range_agg conservatively refuse sub-horizon queries — delete the
        marker to re-enable them."""
        import json

        existing = self.retention_horizon(table)
        horizon_ms = max(horizon_ms, existing or horizon_ms)
        marker = os.path.join(self.wh.path(table), "_retention.json")
        os.makedirs(self.wh.path(table), exist_ok=True)
        with open(marker + ".tmp", "w") as f:
            json.dump({"horizon_ms": horizon_ms}, f)
        os.replace(marker + ".tmp", marker)

        ts_col = self._TS_COLS.get(table, "bucket_ts")
        fingerprint = f"{table}-retained-{horizon_ms}{fingerprint_suffix}"

        def build(bucket_ids: list[int]) -> DataFrame:
            from modelardb_dynamic_spark.sources.timeseries import to_ms

            df = self._read_buckets(table, bucket_ids)
            cond = (
                to_ms("ts") >= horizon_ms
                if ts_col == "ts"
                else F.col(ts_col) >= horizon_ms
            )
            return df.where(cond)

        self._run_stage(table, fingerprint, build, ts_col=ts_col)

    def retention_horizon(self, table: str) -> int | None:
        import json

        marker = os.path.join(self.wh.path(table), "_retention.json")
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return int(json.load(f)["horizon_ms"])

    def retain_raw(self, horizon_ms: int, fingerprint_suffix: str = "") -> None:
        self.retain("raw", horizon_ms, fingerprint_suffix)

    # -- cold archive (series tier) -------------------------------------------

    _AKEY_SEP = "\x1f"

    def archive_series(self, horizon_ms: int) -> dict:
        """Retention that DEMOTES instead of deletes: sub-horizon series
        points collapse into one DoD-timestamp + ALP-value blob pair per
        (sid, metric) (operators/rawtier.py compress_points, ~2-6 B/point
        vs 16 B columnar), written as the `series_arch` stage with the
        same lineage/resume machinery as every stage — THEN the series
        tier drops below the horizon (retain). restore_series_archive
        returns the exact original rows, so history stays recoverable
        (e.g. to rebuild segments under a new error bound) at cold-storage
        cost while the hot tiers keep answering queries.

        Ordering is crash-safe: archive FIRST (series still intact), the
        destructive retain LAST; a crash in between resumes — completed
        archive buckets skip via fingerprint, retain re-runs idempotently.

        GROWING the horizon later re-archives: the build unions the
        existing archive's restored points (sub-old-horizon series rows
        are already gone) with the still-present [old, new) series rows;
        the fingerprint carries the horizon so unchanged horizons are
        no-ops. Shrinking is refused like retain()."""
        from modelardb_dynamic_spark.operators.rawtier import (
            compress_points,
            restore_points,
        )

        existing = self.retention_horizon("series")
        if existing is not None and horizon_ms < existing:
            horizon_ms = existing  # monotone, matching retain()
        arch_root = self.wh.path("series_arch")
        have_arch = bool(Lineage(arch_root).metrics().get("buckets")) if (
            os.path.exists(arch_root)
        ) else False
        sep = self._AKEY_SEP

        def build(bucket_ids: list[int]) -> DataFrame:
            cur = (
                self._read_buckets("series", bucket_ids)
                .where(F.col("ts_ms") < horizon_ms)
                .selectExpr(
                    f"concat(sid, '{sep}', metric) AS akey",
                    "ts_ms",
                    "CAST(value AS DOUBLE) AS value",
                )
            )
            if have_arch:
                old = restore_points(
                    self._read_buckets("series_arch", bucket_ids).drop(
                        "sbucket", "hw_ts"
                    ),
                    "akey",
                    "ts_ms",
                    "value",
                )
                cur = cur.unionByName(old)
            hw = cur.groupBy("akey").agg(F.max("ts_ms").alias("hw_ts"))
            blobs = compress_points(cur, "akey", "ts_ms", "value")
            return blobs.join(hw, ["akey"]).withColumn(
                "sbucket",
                sid_bucket(
                    F.substring_index(F.col("akey"), sep, 1),
                    self.wh.n_buckets,
                ),
            )

        self._run_stage(
            "series_arch",
            f"series-arch-{horizon_ms}",
            build,
            ts_col="hw_ts",
        )
        self.retain("series", horizon_ms)
        m = Lineage(arch_root).metrics()
        return {"blobs": m.get("rows", 0), "horizon_ms": horizon_ms}

    def restore_series_archive(self) -> DataFrame:
        """Exact (sid, metric, ts_ms, value float) rows back out of the
        cold archive — shuffle-free (each blob pair decodes alone)."""
        from modelardb_dynamic_spark.operators.rawtier import restore_points

        blobs = self.spark.read.parquet(self.wh.path("series_arch")).drop(
            "sbucket", "hw_ts"
        )
        pts = restore_points(blobs, "akey", "ts_ms", "value")
        sep = self._AKEY_SEP
        return pts.selectExpr(
            f"substring_index(akey, '{sep}', 1) AS sid",
            f"substring_index(akey, '{sep}', -1) AS metric",
            "ts_ms",
            "CAST(value AS FLOAT) AS value",
        )

    # -- maintenance -----------------------------------------------------------

    def compact(
        self,
        table: str,
        target_files: int = 1,
        sort_cols: list[str] | None = None,
        zorder_on: tuple[str, str] | None = None,
    ) -> dict:
        """Small-file compaction for a stage table: rewrite each bucket
        dir holding more than `target_files` parquet files down to
        `target_files` (optionally re-sorted), leaving rows, manifests,
        and resume state untouched. The in-sandbox twin of Iceberg
        `rewrite_data_files` (reference: compaction with crash recovery,
        storage/FileStorage.scala:126-165).

        `zorder_on=(sid_col, ts_col)` re-clusters each rewritten bucket
        on the Morton key while compacting (Iceberg's
        `rewrite_data_files(strategy => 'sort')` with a z-order);
        `sort_cols` is the plain-sort alternative.

        Crash-safe via a rename journal: each swap goes
        dst -> dst.old, tmp -> dst, rm dst.old; a recovery pass at entry
        repairs any interrupted swap (dst missing + dst.old present ->
        restore; both present -> drop the stale .old). A row-count check
        against the bucket's lineage manifest guards the swap: a
        mismatched rewrite is abandoned loudly instead of installed.
        """
        root = self.wh.path(table)
        lineage = Lineage(root)
        # recovery pass for swaps interrupted by a crash
        for name in sorted(os.listdir(root)):
            if not name.endswith(".old"):
                continue
            old, dst = os.path.join(root, name), os.path.join(root, name[:-4])
            if os.path.exists(dst):
                shutil.rmtree(old)  # crashed after install: stale backup
            else:
                os.rename(old, dst)  # crashed mid-swap: restore original
        stats = {"buckets_compacted": 0, "files_before": 0, "files_after": 0,
                 "rows": 0}
        import glob as _glob

        for b in sorted(lineage.completed_buckets()):
            dst = os.path.join(root, f"sbucket={b}")
            files = _glob.glob(os.path.join(dst, "*.parquet"))
            if len(files) <= target_files:
                continue
            m = lineage.get(b)
            df = self.spark.read.parquet(dst)
            if zorder_on is not None:
                from modelardb_dynamic_spark.operators.zorder import zorder_keys

                df = (
                    zorder_keys(df, zorder_on[0], zorder_on[1], bits=10)
                    .coalesce(target_files)
                    .sortWithinPartitions("zval")
                    .drop("zval")
                )
            else:
                df = df.coalesce(target_files)
                if sort_cols:
                    df = df.sortWithinPartitions(*sort_cols)
            tmp = dst + "." + uuid.uuid4().hex[:8] + ".tmp"
            df.write.mode("overwrite").parquet(tmp)
            got = self.spark.read.parquet(tmp).count()
            if m is not None and got != m.rows:
                shutil.rmtree(tmp, ignore_errors=True)
                raise RuntimeError(
                    f"compaction of {table} bucket {b} produced {got} rows, "
                    f"manifest says {m.rows}; rewrite abandoned"
                )
            os.rename(dst, dst + ".old")
            os.rename(tmp, dst)
            shutil.rmtree(dst + ".old")
            stats["buckets_compacted"] += 1
            stats["files_before"] += len(files)
            stats["files_after"] += len(
                _glob.glob(os.path.join(dst, "*.parquet"))
            )
            stats["rows"] += got
        return stats

    # -- views ---------------------------------------------------------------

    def range_agg(self, lo_ms: int, hi_ms: int, bucket_ms: int) -> DataFrame:
        """Answer an arbitrary time-range aggregate from the coarsest exact
        tier cover (plans/planner.py), with each tier's completeness bound
        taken from its OWN lineage manifests. The LAST materialized bucket
        of a tier (high_water_ts is its start) is UNSEALED — the build
        consumed data only part-way through it, and time-ordered appends
        can still land inside it — so the trust bound is that bucket's
        START: it and everything after are re-answered from finer tiers /
        the series table (real-time continuous aggregation). Out-of-order
        rows landing in buckets strictly before the high-water need a tier
        rebuild (new fingerprint), not the planner. Result == aggregating
        the series table directly, pinned by tests/test_pipeline.py and
        the `tiered_agg` oracle row."""
        from modelardb_dynamic_spark.plans.planner import (
            tiered_agg,
            validate_cover,
        )

        series = self.wh.read(self.spark, "series")
        tiers, hw, lw = [], {}, {}
        for tier_name, w in TIERS:
            tiers.append((self.wh.read(self.spark, tier_name), w))
            m = Lineage(self.wh.path(tier_name)).metrics()
            if m.get("high_water_ts") is not None:
                hw[w] = int(m["high_water_ts"])
            rh = self.retention_horizon(tier_name)
            if rh is not None:
                lw[w] = rh
        raw_low = self.retention_horizon("series")
        validate_cover(
            [w for _, w in TIERS], lo_ms, hi_ms, bucket_ms,
            high_water=hw, low_water=lw, raw_low_ms=raw_low,
            grid_ms=self.cfg.sampling_interval_ms,
        )
        return tiered_agg(
            series, tiers, lo_ms, hi_ms, bucket_ms,
            high_water=hw, low_water=lw,
        )

    def _sketch_route_bounds(self, names_widths):
        hw, lw = {}, {}
        for name, w in names_widths:
            m = Lineage(self.wh.path(name)).metrics()
            if m.get("high_water_ts") is not None:
                hw[w] = int(m["high_water_ts"])
            rh = self.retention_horizon(name)
            if rh is not None:
                lw[w] = rh
        return hw, lw

    def _raw_turns(self, bucket_ids: list[int] | None = None) -> DataFrame:
        """The ONE (sid, ts_ms, tokens, text) projection both the sketch
        tier builds and the range sketch queries use — the routed==direct
        equality depends on these staying byte-identical."""
        from modelardb_dynamic_spark.sources.timeseries import to_ms

        if not self._live_buckets("raw", list(range(self.wh.n_buckets))):
            # retention/purge can legitimately empty the whole raw tier;
            # the projection's schema is pinned, so serve it empty
            return self.spark.createDataFrame(
                [], "sid string, ts_ms long, tokens long, text string"
            )
        raw = (
            self.wh.read(self.spark, "raw")
            if bucket_ids is None
            else self._read_buckets("raw", bucket_ids)
        )
        return raw.select(
            F.col("conv_id").alias("sid"),
            to_ms("ts").alias("ts_ms"),
            (1 + F.floor(F.length("text") / 4)).cast("long").alias("tokens"),
            F.col("text"),
        )

    def range_quantiles(
        self, lo_ms: int, hi_ms: int, bucket_ms: int,
        qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    ) -> DataFrame:
        """Per-conversation turn-length quantiles over [lo, hi) per bucket,
        routed through the hist_1h/hist_1d sketch tiers (build them with
        build_sketch_tiers) with lineage high-water + retention low-water,
        raw turns histogrammed on the fly at the edges — range_agg's twin
        for the quantile question."""
        from modelardb_dynamic_spark.operators.sketches import (
            tiered_hist_quantiles,
        )
        from modelardb_dynamic_spark.plans.planner import validate_cover

        names = [("hist_1h", HOUR_MS), ("hist_1d", DAY_MS)]
        hw, lw = self._sketch_route_bounds(names)
        raw_low = self.retention_horizon("raw")
        validate_cover(
            [w for _, w in names], lo_ms, hi_ms, bucket_ms,
            high_water=hw, low_water=lw, raw_low_ms=raw_low,
            grid_ms=self.cfg.sampling_interval_ms,
        )
        tiers = [
            (self.wh.read(self.spark, n).drop("sbucket"), w) for n, w in names
        ]
        return tiered_hist_quantiles(
            self._raw_turns(), ["sid"], "tokens", tiers,
            lo_ms, hi_ms, bucket_ms, high_water=hw, qs=qs, low_water=lw,
        )

    def range_distinct(
        self, lo_ms: int, hi_ms: int, bucket_ms: int
    ) -> DataFrame:
        """Distinct turn contents per conversation over [lo, hi) per
        bucket via the hll_1d sketch tier + raw-edge sketching."""
        from modelardb_dynamic_spark.operators.sketches import (
            tiered_hll_summary,
        )
        from modelardb_dynamic_spark.plans.planner import validate_cover

        names = [("hll_1d", DAY_MS)]
        hw, lw = self._sketch_route_bounds(names)
        raw_low = self.retention_horizon("raw")
        validate_cover(
            [w for _, w in names], lo_ms, hi_ms, bucket_ms,
            high_water=hw, low_water=lw, raw_low_ms=raw_low,
            grid_ms=self.cfg.sampling_interval_ms,
        )
        tiers = [
            (self.wh.read(self.spark, n).drop("sbucket"), w) for n, w in names
        ]
        return tiered_hll_summary(
            self._raw_turns(), ["sid"], "text", tiers,
            lo_ms, hi_ms, bucket_ms, high_water=hw, low_water=lw,
        )

    def range_heavy(
        self, lo_ms: int, hi_ms: int, bucket_ms: int, probes: list[str]
    ) -> DataFrame:
        """Estimated turn counts of specific conversations over [lo, hi)
        per bucket via the cms_1d counter tier + raw-edge sketching —
        range_distinct's twin for the frequency question (hot-conversation
        audit without touching per-conv rows). CMS counters merge by sum,
        so the per-sbucket partial sketches and the routed cover compose
        in the same groupBy."""
        from modelardb_dynamic_spark.operators.sketches import (
            tiered_cms_estimates,
        )
        from modelardb_dynamic_spark.plans.planner import validate_cover

        names = [("cms_1d", DAY_MS)]
        hw, lw = self._sketch_route_bounds(names)
        raw_low = self.retention_horizon("raw")
        validate_cover(
            [w for _, w in names], lo_ms, hi_ms, bucket_ms,
            high_water=hw, low_water=lw, raw_low_ms=raw_low,
            grid_ms=self.cfg.sampling_interval_ms,
        )
        tiers = [
            (self.wh.read(self.spark, n).drop("sbucket"), w) for n, w in names
        ]
        return tiered_cms_estimates(
            self._raw_turns(), [], "sid", probes, tiers,
            lo_ms, hi_ms, bucket_ms, high_water=hw, low_water=lw,
        )

    def overlap_convs(self, day_a_ms: int, day_b_ms: int) -> DataFrame:
        """Estimated active-conversation-set OVERLAP between two days via
        the kmv_1d sketch tier — the set-intersection question hll_1d
        cannot answer (HLL registers union but never intersect):
        est_inter ~= |convs active on day A AND day B|, with the union
        estimate and the exact union-sketch state beside it. A sealed
        day reads <= k rows per sbucket from the tier (re-ranked union
        across sbuckets IS the global bottom-k — sid_bucket partitions
        convs disjointly); an unsealed or retained-away day falls back
        to sketching raw, and raises loudly if retention dropped raw too
        (the validate_cover contract)."""
        from modelardb_dynamic_spark.operators.sketches import (
            K_KMV,
            _kmv_bottomk,
            kmv_overlap,
            kmv_tier,
        )

        hw, lw = self._sketch_route_bounds([("kmv_1d", DAY_MS)])
        hw_ts, lw_ts = hw.get(DAY_MS), lw.get(DAY_MS)
        raw_low = self.retention_horizon("raw")
        tier = self.wh.read(self.spark, "kmv_1d")

        def day_sketch(day_ms: int) -> DataFrame:
            day_ms = (day_ms // DAY_MS) * DAY_MS
            sealed = (
                hw_ts is not None
                and day_ms < hw_ts
                and (lw_ts is None or day_ms >= lw_ts)
            )
            if sealed:
                rows = tier.where(F.col("bucket_ts") == day_ms).select(
                    F.lit(1).alias("g"), "h"
                )
            else:
                if raw_low is not None and day_ms < raw_low:
                    raise ValueError(
                        f"overlap_convs: day {day_ms} is past the kmv_1d "
                        f"cover (high_water={hw_ts}, low_water={lw_ts}) "
                        f"and raw is retained away below {raw_low}"
                    )
                src = self._raw_turns().where(
                    f"ts_ms >= {day_ms} AND ts_ms < {day_ms + DAY_MS}"
                )
                rows = kmv_tier(
                    src.withColumn("g", F.lit(1)), ["g"], "sid",
                    "CAST(0 AS BIGINT)",
                ).drop("bucket_ts")
            return _kmv_bottomk(rows, ["g"], K_KMV)

        out = kmv_overlap(day_sketch(day_a_ms), day_sketch(day_b_ms), ["g"])
        return out.select(
            F.lit((day_a_ms // DAY_MS) * DAY_MS).alias("day_a"),
            F.lit((day_b_ms // DAY_MS) * DAY_MS).alias("day_b"),
            "mu", "h_k_u", "n_both", "est_union", "est_inter",
        )

    def active_convs(self, day_ms: int, probes: list[str]) -> DataFrame:
        """Were these conversations active on `day_ms`? Point membership
        probes against the bloom_1d tier: each probe consults ONLY its
        own sbucket's filter (sid_bucket partitions conversations
        disjointly — probing another bucket's filter would even be
        unsound), so a sealed-day probe touches <= 512 tier rows per
        distinct probe bucket. No false negatives; false positives at
        the tier's (set/m)^k rate (bloom_occupancy). An unsealed or
        retained-away day falls back to an EXACT raw-scan semi-join, and
        raises loudly if retention dropped raw too.

        Returns (probe, day_ts, member, exact) — exact=False rows are
        Bloom answers (member=True may rarely be a false positive),
        exact=True rows come from the raw fallback."""
        from modelardb_dynamic_spark.operators.sketches import bloom_membership

        day_ms = (day_ms // DAY_MS) * DAY_MS
        hw, lw = self._sketch_route_bounds([("bloom_1d", DAY_MS)])
        hw_ts, lw_ts = hw.get(DAY_MS), lw.get(DAY_MS)
        raw_low = self.retention_horizon("raw")
        probes = list(dict.fromkeys(probes))
        sealed = (
            hw_ts is not None
            and day_ms < hw_ts
            and (lw_ts is None or day_ms >= lw_ts)
        )
        if sealed:
            # probe sbuckets via the same JVM hash the stage used
            # (bounded: one tiny job over len(probes) rows)
            pdf = self.spark.createDataFrame(
                [(p,) for p in probes], "probe string"
            ).withColumn(
                "psb", sid_bucket(F.col("probe"), self.wh.n_buckets)
            )
            pmap = {r["probe"]: r["psb"] for r in pdf.collect()}
            tier = self.wh.read(self.spark, "bloom_1d").where(
                F.col("bucket_ts") == day_ms
            )
            mem = bloom_membership(tier, ["sbucket"], probes)
            # keep only each probe's OWN bucket's verdict; absent row
            # (or a row from a foreign bucket) = non-member
            hits = {
                r["probe"]
                for r in mem.collect()
                if r["member"] and pmap[r["probe"]] == r["sbucket"]
            }
            rows = [(p, day_ms, p in hits, False) for p in probes]
        else:
            if raw_low is not None and day_ms < raw_low:
                raise ValueError(
                    f"active_convs: day {day_ms} is past the bloom_1d "
                    f"cover (high_water={hw_ts}, low_water={lw_ts}) "
                    f"and raw is retained away below {raw_low}"
                )
            active = {
                r["sid"]
                for r in self._raw_turns()
                .where(f"ts_ms >= {day_ms} AND ts_ms < {day_ms + DAY_MS}")
                .join(
                    F.broadcast(
                        self.spark.createDataFrame(
                            [(p,) for p in probes], "sid string"
                        )
                    ),
                    "sid",
                    "leftsemi",
                )
                .select("sid")
                .distinct()
                .collect()
            }
            rows = [(p, day_ms, p in active, True) for p in probes]
        return self.spark.createDataFrame(
            rows, "probe string, day_ts long, member boolean, exact boolean"
        )

    def tier(self, name: str, gap_filled: bool = False) -> DataFrame:
        df = self.wh.read(self.spark, name)
        if gap_filled:
            bucket_ms = dict(TIERS)[name]
            df = gap_fill(df.drop("sbucket"), bucket_ms)
        return df


def warehouse_status(root: str) -> dict:
    """Operational status of a warehouse from its lineage manifests and
    retention markers ALONE — pure filesystem, no SparkSession, so an
    operator (or the scheduler deciding whether to resume) can inspect a
    10^12-turn warehouse in milliseconds: per table, committed buckets,
    row totals, cumulative build wall time, event-time high water,
    first/last commit wall-clock, stage name, and the retention horizon
    if one is recorded. The north rule's "per-partition lineage +
    metrics" as a queryable surface (CLI: --status).
    """
    import json as _json

    from modelardb_dynamic_spark.plans.checkpoint import Lineage

    tables = {}
    for name in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        tdir = os.path.join(root, name)
        ldir = os.path.join(tdir, "_lineage")
        if not os.path.isdir(ldir):
            continue
        lin = Lineage(tdir)
        ms = [lin.get(b) for b in lin.completed_buckets()]
        ms = [m for m in ms if m]
        entry = dict(lin.metrics())
        entry["stage"] = ms[0].stage if ms else None
        entry["first_commit_utc"] = (
            min(m.committed_utc for m in ms) if ms else None
        )
        entry["last_commit_utc"] = (
            max(m.committed_utc for m in ms) if ms else None
        )
        marker = os.path.join(tdir, "_retention.json")
        if os.path.exists(marker):
            with open(marker) as f:
                entry["retention_horizon_ms"] = int(
                    _json.load(f)["horizon_ms"]
                )
        tables[name] = entry
    return {"warehouse": root, "tables": tables}
