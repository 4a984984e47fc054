"""Z-order (Morton-curve) clustered segment layout for two-dimensional
file/row-group pruning.

The tier warehouse's natural sort is (sid, start_ts): parquet min/max
stats then prune perfectly on series but not at all on time once a file
holds many series (and a ts-sorted layout has the converse problem). A
Z-order layout interleaves the bits of a series RANK and a time RANK so
every file/row-group covers a small hypercube in (series, time) space —
min/max stats prune on EITHER dimension, which is exactly what the
mixed query load (per-series range scans + global time-window rollups)
needs at 100 TB. Same idea as Delta Lake's OPTIMIZE ZORDER BY; built
here from plain DataFrame ops so it works on any parquet/Iceberg sink.

Design for scale:
- The series rank comes from ONE aggregation over the catalog-sized
  distinct-sid set + a broadcast join back (series count is orders of
  magnitude below row count; the same assumption the group catalog
  makes). No global sort of the data.
- The time rank is a pure column expression over a [lo, hi) range
  computed in the same single stats pass.
- The layout write is one repartitionByRange(zval) + in-partition sort:
  exactly one shuffle, and range partitioning keeps output files
  balanced even when the curve is skewed.
- `pruning_stats` reads parquet FOOTERS only (pyarrow), so verifying a
  layout never scans data.

Reference anchor: the reference clusters segments per-tid via its
storage key (storage/FileStorage.scala orders by (tid, start_time));
Z-order generalizes that choice to two query dimensions at once — an
addition with no reference counterpart, documented as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _interleave_expr(x: str, y: str, bits: int) -> str:
    """SQL expression interleaving the low `bits` bits of bigint columns
    x (even positions) and y (odd positions) into one Morton code."""
    # every term fully parenthesized: SQL gives << lower precedence
    # than +, so an unwrapped sum would shift by the NEXT term
    terms = []
    for i in range(bits):
        terms.append(f"(((({x}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y}) >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_keys(
    df: DataFrame, sid_col: str, ts_col: str, bits: int = 10
) -> DataFrame:
    """Attach a Morton z-value column `zval` clustering (sid rank, ts
    rank), each quantized to `bits` bits.

    The sid rank is the series' position in the sorted distinct-sid
    list, scaled onto [0, 2^bits): computed with one distinct + one
    window over the CATALOG-sized sid set, then broadcast-joined back.
    The ts rank scales [min_ts, max_ts] onto the same range with a pure
    column expression.
    """
    n = 1 << bits
    sids = df.select(sid_col).distinct()
    wr = Window.orderBy(sid_col)
    # catalog-sized: the single-partition rank window is over distinct
    # sids only, never over data rows
    ranked = sids.withColumn("_r", F.row_number().over(wr) - 1)
    cnt = ranked.count()
    ranked = ranked.withColumn(
        "_sx", (F.col("_r") * n / max(cnt, 1)).cast("long")
    ).drop("_r")
    lo, hi = df.agg(
        F.min(ts_col).cast("long"), F.max(ts_col).cast("long")
    ).collect()[0]
    span = max(int(hi) - int(lo) + 1, 1)
    out = df.join(F.broadcast(ranked), sid_col)
    out = out.withColumn(
        "_ty",
        F.expr(
            f"CAST((CAST({ts_col} AS BIGINT) - {int(lo)}) * {n} "
            f"/ {span} AS BIGINT)"
        ),
    )
    return out.withColumn(
        "zval", F.expr(_interleave_expr("_sx", "_ty", bits))
    ).drop("_sx", "_ty")


def zorder_write(
    df: DataFrame,
    path: str,
    sid_col: str = "sid",
    ts_col: str = "ts_ms",
    bits: int = 10,
    n_files: int = 16,
    small_row_groups: bool = False,
) -> None:
    """Write `df` as a Z-order clustered parquet dataset: one
    repartitionByRange shuffle on zval, in-partition sort, stats-friendly
    row groups. `small_row_groups` shrinks parquet row groups so pruning
    granularity can be asserted at test scale (leave False in production:
    the default 128 MB row group is the right granule at 100 TB)."""
    keyed = zorder_keys(df, sid_col, ts_col, bits=bits)
    w = keyed.repartitionByRange(n_files, "zval").sortWithinPartitions("zval")
    writer = w.drop("zval").write.mode("overwrite")
    if small_row_groups:
        writer = writer.option("parquet.block.size", 4 * 1024).option(
            "parquet.page.size", 1024
        )
    writer.parquet(path)


def pruning_stats(
    path: str,
    sid_col: str,
    ts_col: str,
    sid_eq: str | None = None,
    ts_range: tuple[int, int] | None = None,
) -> dict:
    """Footer-only min/max pruning simulation: how many row groups would
    a stats-based reader (parquet predicate pushdown, Iceberg manifest
    pruning) have to scan for `sid = sid_eq AND ts in [lo, hi)`?

    Returns {"total": n_row_groups, "kept": n_kept, "rows_kept": m}.
    Reads metadata only — no data pages.
    """
    import glob as _glob

    import pyarrow.parquet as pq

    total = kept = rows_kept = 0
    for f in sorted(_glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        si, ti = schema_idx[sid_col], schema_idx[ts_col]
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            total += 1
            s_stat, t_stat = rg.column(si).statistics, rg.column(ti).statistics
            ok = True
            if sid_eq is not None and s_stat is not None:
                ok = s_stat.min <= sid_eq <= s_stat.max
            if ok and ts_range is not None and t_stat is not None:
                lo, hi = ts_range
                ok = not (t_stat.max < lo or t_stat.min >= hi)
            if ok:
                kept += 1
                rows_kept += rg.num_rows
    return {"total": total, "kept": kept, "rows_kept": rows_kept}
