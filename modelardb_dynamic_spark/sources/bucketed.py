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
    spark: SparkSession, table: str, n_buckets: int
) -> DataFrame:
    """Scan a bucketed table with the clustering guarantee ENFORCED:
    pins the bucketing confs and asserts the physical scan reads bucketed
    (one task per bucket, files never split), because a silent fallback
    would hand the compress kernel partitions that do not contain whole
    conversations."""
    for k, v in BUCKETED_CONFS.items():
        spark.conf.set(k, v)
    df = spark.table(table)
    assert_bucketed_scan(df, n_buckets)
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
