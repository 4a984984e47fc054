"""Bucketed input tables: the zero-shuffle ingest path.

The north rule's input is an Iceberg table of transcripts partitioned by
``bucket(N, conv_id)`` — the writer co-locates every row of a conversation
into one bucket ONCE, at ingest time, and every downstream compression run
inherits that clustering for free. This module is the plain-parquet
stand-in for that layout (the sandbox ships no Iceberg jar; see
sources/iceberg.py for the real wiring): a Spark V1 bucketed table whose
bucket hash (Murmur3 pmod N) is exactly Iceberg's bucket transform
discipline and exactly the hash `df.repartition(N, col)` uses.

Why it matters at 10^12 turns: the compress stage's only wide dependency
is "all rows of a (conv_id) together, sorted by ts". Against a bucketed
table that clustering is a property of the SCAN, so the stage plan is
    scan (bucketed, one task per bucket) -> sortWithinPartitions -> kernel
with ZERO exchanges — the full-data shuffle (measured 12.2 B/turn after
the round-4 zstd+salt cuts, i.e. ~12 TB moved twice at 10^12 turns) is
gone entirely. On the memory-bandwidth-bound box BENCH.md documents, bytes
not moved are the cheapest bytes.

Where this path wins — and where it doesn't: the exchange it removes is
a NETWORK cost. On a multi-node cluster that cost is real (the dominant
stage's full-data shuffle, twice over at 10^12 turns); on a single JVM a
"shuffle" is an in-memory copy, and a warm quiet-window A/B (18.6M
turns, local[16], BENCH.md round-4) measured the shuffled path FASTER
(24-28 s vs 30-36 s): the fixed one-task-per-bucket scan forfeits AQE's
balanced partitions, and downstream stages inherit n_buckets map
partitions, multiplying per-(map x reduce) zstd shuffle-stream setup
(mitigated but not erased by read_bucketed(coalesce_to=2x cores)).
bench.py therefore defaults to the shuffled path locally and keeps this
one opt-in (MDBS_PIPELINE_BUCKETED=1); both are oracle-identical.

Guard rails: Spark silently falls back to a split-file scan when bucketing
is disabled (or when spark.sql.sources.bucketing.autoBucketedScan.enabled
decides no operator "needs" the clustering — a pure mapInArrow does not
advertise a required distribution, so the optimizer WOULD drop bucketed
reading and break per-conversation grouping). read_bucketed() therefore
pins the session confs and ASSERTS the executed scan is bucketed with the
expected bucket count, failing loudly instead of compressing mis-grouped
rows.

Skew note: one bucket = one task, so a single conversation larger than a
bucket's fair share cannot be split across tasks on this path (the
in-kernel salt still bounds segment length, but not task width). With
conversations ~10^6x smaller than a bucket this is immaterial; for
pathological skew use the repartition path (operators/compress.py), whose
time-range salting splits hot series across tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BUCKETED_CONFS = {
    # bucketed reading on, and never auto-dropped: mapInArrow does not
    # declare a required distribution, so autoBucketedScan would otherwise
    # silently re-split files and break per-conv_id grouping
    "spark.sql.sources.bucketing.enabled": "true",
    "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
}


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 128,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write df as an external V1 bucketed table at `path`.

    The repartition uses the same Murmur3-pmod hash as the bucket spec, so
    each write task holds exactly one bucket's rows and emits exactly one
    file per bucket — no small-file explosion, and the staged layout is
    deterministic in content regardless of the writing session's core
    count (file-internal row order follows the task's input order; readers
    re-sort within the task, so layout order is not load-bearing)."""
    w = (
        df.repartition(n_buckets, bucket_col)
        .write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def register_bucketed(
    spark: SparkSession,
    path: str,
    table: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 128,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Re-register an existing bucketed layout in THIS session's catalog.

    The in-memory catalog does not outlive a session, but the bucket
    membership is durable — it is carried by the data file NAMES
    (part-*_00042 is bucket 42), which is how Spark re-derives bucket ids
    on scan. The schema is read back from the parquet footers so the DDL
    never drifts from the files."""
    if spark.catalog.tableExists(table):
        return
    schema_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields
    )
    sort_clause = (
        "SORTED BY (" + ", ".join(f"`{c}`" for c in sort_cols) + ") "
        if sort_cols
        else ""
    )
    spark.sql(
        f"CREATE TABLE `{table}` ({schema_ddl}) USING PARQUET "
        f"CLUSTERED BY (`{bucket_col}`) {sort_clause}"
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


def read_bucketed(
    spark: SparkSession, table: str, n_buckets: int,
    coalesce_to: int | None = None,
) -> DataFrame:
    """Scan a bucketed table with the clustering guarantee ENFORCED:
    pins the bucketing confs and asserts the physical scan reads bucketed
    (one task per bucket, files never split), because a silent fallback
    would hand the compress kernel partitions that do not contain whole
    conversations.

    coalesce_to: optionally coalesce the scan DOWN to this many
    partitions (must be <= n_buckets; no shuffle — each output partition
    is a union of WHOLE buckets, so per-conv_id grouping survives).
    Bucket counts are fixed at ingest for the table's lifetime, sized for
    the cluster, not for one job; a small job over a many-bucket table
    should coalesce to ~2x its cores instead of paying per-task overhead
    x n_buckets — measured 36 -> 30 s on the 18.6M-turn local[16] bench,
    mostly from downstream stages inheriting 128 map partitions and
    paying per-(map x reduce) zstd shuffle-stream setup."""
    for k, v in BUCKETED_CONFS.items():
        spark.conf.set(k, v)
    df = spark.table(table)
    assert_bucketed_scan(df, n_buckets)
    if coalesce_to is not None and coalesce_to < n_buckets:
        df = df.coalesce(coalesce_to)
    return df


def assert_bucketed_scan(df: DataFrame, n_buckets: int) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Bucketed: true" not in plan:
        raise RuntimeError(
            "bucketed scan was not selected (plan would re-split files and "
            "break per-conversation grouping):\n" + plan[:2000]
        )
    parts = df.rdd.getNumPartitions()
    if parts != n_buckets:
        raise RuntimeError(
            f"bucketed scan produced {parts} partitions, expected {n_buckets}"
        )
