"""Series source readers — the reference's TimeSeries* constructors
re-expressed as DataFrame loaders.

Reference surface (SURVEY.md §2.1): TimeSeriesCSV (core/timeseries/
TimeSeriesCSV.java:34-223), TimeSeriesParquet (:34-121), TimeSeriesORC,
AsyncTimeSeriesSocket (socket CSV lines), and glob/dir source expansion
(Main.scala:144-166). Each produced an iterator of (tid, ts, value); here
each returns a DataFrame in the engine's series shape
(sid, metric, ts_ms, value) ready for operators.compress — Spark's readers
already handle projection pushdown, globbing, compression codecs and
distributed splits, so these are thin, declarative mappings, not ports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SERIES_SCHEMA = "sid string, metric string, ts_ms long, value float"


def _normalize(
    df: DataFrame,
    sid,
    ts_col: str,
    value_col: str,
    metric: str,
    ts_format: str | None,
    scaling_factor: float,
) -> DataFrame:
    """Map arbitrary (ts, value) columns onto the series schema.

    ts_format: None = auto (timestamp / epoch-millis / epoch-seconds by
    dtype), 'unix' = epoch seconds, 'java' = epoch millis, else a
    SimpleDateFormat-style pattern (TimeSeriesCSV.java date handling)."""
    ts = F.col(ts_col)
    dtype = dict(df.dtypes).get(ts_col)
    if ts_format == "unix":
        ts_ms = (ts.cast("long") * 1000).cast("long")
    elif ts_format == "java":
        ts_ms = ts.cast("long")
    elif ts_format is not None:
        ts_ms = F.unix_millis(F.to_timestamp(ts, ts_format))
    elif dtype in ("timestamp", "timestamp_ntz", "date"):
        ts_ms = F.unix_millis(ts.cast("timestamp"))
    elif dtype in ("bigint", "int"):
        ts_ms = ts.cast("long")  # assume epoch millis (reference 'java')
    else:
        ts_ms = F.unix_millis(F.to_timestamp(ts))
    sid_col = sid if isinstance(sid, Column) else F.lit(str(sid))
    value = (F.col(value_col).cast("double") / F.lit(scaling_factor)).cast("float")
    return df.select(
        sid_col.alias("sid"),
        F.lit(metric).alias("metric"),
        ts_ms.alias("ts_ms"),
        value.alias("value"),
    )


def series_from_csv(
    spark: SparkSession,
    paths: str | list[str],
    sid="csv",
    ts_col: str = "ts",
    value_col: str = "value",
    metric: str = "value",
    separator: str = ",",
    header: bool = True,
    ts_format: str | None = None,
    scaling_factor: float = 1.0,
    locale_decimal_comma: bool = False,
) -> DataFrame:
    """CSV / CSV.gz source (TimeSeriesCSV parity: separator, header flag,
    timestamp format, scaling factor, locale-aware float parse). Globs are
    expanded by Spark; .gz is decompressed transparently."""
    df = (
        spark.read.option("sep", separator)
        .option("header", str(header).lower())
        .option("inferSchema", "true")
        .csv(paths)
    )
    if not header:
        names = df.columns
        df = df.withColumnsRenamed({names[0]: ts_col, names[1]: value_col})
    if locale_decimal_comma:
        df = df.withColumn(
            value_col, F.regexp_replace(F.col(value_col).cast("string"), ",", ".")
        )
    return _normalize(df, sid, ts_col, value_col, metric, ts_format, scaling_factor)


def series_from_parquet(
    spark: SparkSession,
    paths: str | list[str],
    sid="parquet",
    ts_col: str = "ts",
    value_col: str = "value",
    metric: str = "value",
    scaling_factor: float = 1.0,
) -> DataFrame:
    """Parquet source (TimeSeriesParquet parity); only (ts, value) columns
    are read thanks to Catalyst column pruning."""
    df = spark.read.parquet(*([paths] if isinstance(paths, str) else paths))
    return _normalize(df, sid, ts_col, value_col, metric, None, scaling_factor)


def series_from_orc(
    spark: SparkSession,
    paths: str | list[str],
    sid="orc",
    ts_col: str = "ts",
    value_col: str = "value",
    metric: str = "value",
    scaling_factor: float = 1.0,
) -> DataFrame:
    """ORC source (TimeSeriesORC parity, vectorized by Spark natively)."""
    df = spark.read.orc(*([paths] if isinstance(paths, str) else paths))
    return _normalize(df, sid, ts_col, value_col, metric, None, scaling_factor)


def series_stream_from_socket(
    spark: SparkSession,
    host: str,
    port: int,
    sid="socket",
    metric: str = "value",
    separator: str = ",",
    scaling_factor: float = 1.0,
    ts_format: str = "java",
) -> DataFrame:
    """Unbounded socket source of 'ts,value' CSV lines
    (AsyncTimeSeriesSocket parity) as a STREAMING DataFrame; feed it to
    streaming.ingest.segment_stream. Lines carry epoch-millis timestamps
    by default ('java'); pass 'unix' for epoch seconds or a pattern."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    parts = F.split(F.col("value"), separator)
    df = lines.select(
        parts.getItem(0).alias("ts"), parts.getItem(1).alias("raw_value")
    )
    return _normalize(df, sid, "ts", "raw_value", metric, ts_format, scaling_factor)


def series_from_table(
    df: DataFrame,
    sid_col: str,
    ts_col: str,
    value_col: str,
    metric: str,
    scaling_factor: float = 1.0,
) -> DataFrame:
    """Many series out of one table: sid taken from a column (the engine's
    usual shape — conv_id / user_id keyed tables)."""
    return _normalize(
        df, F.col(sid_col).cast("string"), ts_col, value_col, metric, None,
        scaling_factor,
    )
