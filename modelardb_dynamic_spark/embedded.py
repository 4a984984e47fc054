"""EmbeddedEngine — a driver-local DuckDB query engine over the same
segment store as the Spark engine.

The reference ships TWO host engines over one storage + model library: Spark
for cluster queries and an embedded H2 for edge/interactive use
(`engines/h2/H2.scala:208-236`; views at `ViewSegment.scala:29-198`,
`ViewDataPoint.scala`; UDAF twins at `H2UDAF.scala:27-427`). This module is
the Python-native analog: DuckDB plays H2's role — an in-process SQL engine
with zero JVM/cluster dependency — over the exact same segment parquet files
(or any Arrow/pandas segment table) that the Spark pipeline writes, decoding
with the same numpy/C model kernels (`operators/reconstruct._grid_batch`).

Parity map (SURVEY.md §2 rows 9 and 43):

- ``Segment`` view  — direct scan of the segment table. With a parquet
  source, DuckDB's own zone-map pruning gives the reference's
  index-condition pushdown (`engines/h2/ViewSegment.scala:69-117`) for
  free on ``start_ts``/``end_ts``/``sid`` predicates.
- ``DataPoint`` view — virtual reconstruction, materialized lazily per
  query with a two-phase prune-then-exact scan: timestamp/sid predicates
  are extracted from the query text by a conservative walk (the reference
  walks H2 expression trees the same way, handling only the comparison
  shapes it recognizes, `H2.scala:318-370`), mapped to segment-overlap
  predicates, and the full WHERE is then re-applied exactly by DuckDB —
  the `unhandledFilters = all` principle (`ViewDataPoint.scala:35`).
- UDAF twins — the reference registers a second, single-buffer
  implementation of every Spark UDAF under the same name for H2
  (`H2UDAF.scala:432-485`). Here each twin is a real registered DuckDB
  macro (COUNT_S/MIN_S/MAX_S/SUM_S/AVG_S over segment summary columns;
  CAL_YEAR..CAL_SECOND bucket extractors over point timestamps), plus the
  same ``#`` textual sugar the interface layer applies for Spark
  (`Interface.scala:140-143`).

Everything here is bounded driver-side work BY DESIGN: the embedded engine
is the reference's answer for small/edge deployments; cluster-scale queries
go through :class:`~modelardb_dynamic_spark.engine.ModelarEngine`.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import duckdb
import pyarrow as pa

from modelardb_dynamic_spark.operators.reconstruct import _OUT_SCHEMA, _grid_batch

_SEGMENT_COLS = "sid, metric, start_ts, end_ts, si, mtid, model, cnt, vmin, vmax, vsum"

# '#' sugar: same textual family as the Spark interface layer, but expanding
# to the registered macros (real functions, like the H2 twins) instead of
# inline SQL.
_UDAF_SUGAR = [
    (re.compile(r"COUNT_S\s*\(\s*#\s*\)", re.I), "COUNT_S(start_ts, end_ts, si)"),
    (re.compile(r"MIN_S\s*\(\s*#\s*\)", re.I), "MIN_S(vmin)"),
    (re.compile(r"MAX_S\s*\(\s*#\s*\)", re.I), "MAX_S(vmax)"),
    (re.compile(r"SUM_S\s*\(\s*#\s*\)", re.I), "SUM_S(vsum)"),
    (re.compile(r"AVG_S\s*\(\s*#\s*\)", re.I), "AVG_S(vsum, cnt)"),
    (re.compile(r"#"), _SEGMENT_COLS),
]

# Aggregate twins (H2UDAF.scala:27-185). DuckDB macros are inlined before
# binding, so aggregates inside them work anywhere an aggregate would.
_SEGMENT_MACROS = [
    "CREATE OR REPLACE MACRO COUNT_S(s, e, si) AS "
    "CAST(SUM((e - s) // si + 1) AS BIGINT)",
    "CREATE OR REPLACE MACRO MIN_S(vmin) AS CAST(MIN(vmin) AS DOUBLE)",
    "CREATE OR REPLACE MACRO MAX_S(vmax) AS CAST(MAX(vmax) AS DOUBLE)",
    "CREATE OR REPLACE MACRO SUM_S(vsum) AS CAST(SUM(vsum) AS DOUBLE)",
    "CREATE OR REPLACE MACRO AVG_S(vsum, cnt) AS SUM(vsum) / SUM(cnt)",
]

# Calendar bucket extractors — the scalar half of the reference's 40
# {AGG}_{YEAR..SECOND} twins (H2UDAF.scala:188-427): SELECT sid,
# CAL_HOUR(ts_ms) AS h, AVG(value) FROM DataPoint GROUP BY 1, 2 is the
# embedded spelling of AVG_HOUR(#). Buckets are computed in UTC like the
# Spark calendar_agg default.
_CAL_FIELDS = ["year", "month", "day", "hour", "minute", "second"]
_CALENDAR_MACROS = [
    f"CREATE OR REPLACE MACRO CAL_{f.upper()}(ts_ms) AS "
    f"CAST(extract({f} FROM to_timestamp(ts_ms / 1000)) AS INT)"
    for f in _CAL_FIELDS
]

_DP_RE = re.compile(r"\bDataPoint\b", re.I)
_OR_RE = re.compile(r"\bOR\b", re.I)
_TS_CMP_RE = re.compile(r"\bts_ms\s*(>=|<=|>|<|=)\s*(-?\d+)")
_TS_BETWEEN_RE = re.compile(r"\bts_ms\s+BETWEEN\s+(-?\d+)\s+AND\s+(-?\d+)", re.I)
_SID_EQ_RE = re.compile(r"\bsid\s*=\s*'([^']*)'")
_SID_IN_RE = re.compile(r"\bsid\s+IN\s*\(([^)]*)\)", re.I)
_METRIC_EQ_RE = re.compile(r"\bmetric\s*=\s*'([^']*)'")
_METRIC_IN_RE = re.compile(r"\bmetric\s+IN\s*\(([^)]*)\)", re.I)
_STR_LIT_RE = re.compile(r"'([^']*)'")


def _extract_point_bounds(query: str):
    """Conservative predicate walk over the query text: returns
    (lo_ms, hi_ms, sids, metrics) that are SAFE to use for segment
    pruning, or all-None when nothing can be claimed. Sound by construction:
    only pure-conjunction queries are walked (any OR disables extraction,
    like the reference bailing on expression shapes it doesn't model,
    H2.scala:318-370), bounds only ever widen the window vs the true
    predicate, and the full WHERE is re-applied exactly afterwards."""
    if _OR_RE.search(query):
        return None, None, None, None
    lo = hi = None
    for op, lit in _TS_CMP_RE.findall(query):
        v = int(lit)
        if op in (">=", ">"):  # prune with >= v: superset of > v
            lo = v if lo is None else max(lo, v)
        elif op in ("<=", "<"):
            hi = v if hi is None else min(hi, v)
        elif op == "=":
            lo = v if lo is None else max(lo, v)
            hi = v if hi is None else min(hi, v)
    for a, b in _TS_BETWEEN_RE.findall(query):
        a, b = int(a), int(b)
        lo = a if lo is None else max(lo, a)
        hi = b if hi is None else min(hi, b)
    def _str_set(eq_re, in_re):
        vals: set[str] | None = None
        for s in eq_re.findall(query):
            vals = {s} if vals is None else (vals & {s})
        for body in in_re.findall(query):
            in_set = set(_STR_LIT_RE.findall(body))
            vals = in_set if vals is None else (vals & in_set)
        return vals

    return (
        lo, hi,
        _str_set(_SID_EQ_RE, _SID_IN_RE),
        _str_set(_METRIC_EQ_RE, _METRIC_IN_RE),
    )


class EmbeddedEngine:
    """In-process SQL engine over a segment store (H2-engine analog).

    ``segments`` is a parquet path/glob (the same files the Spark sinks
    write — shared storage layer, like `storage/ParquetStorage.scala`
    serving both host engines), a ``pyarrow.Table``, or a pandas frame.
    """

    def __init__(self, segments):
        self._con = duckdb.connect()
        if isinstance(segments, str):
            src = segments if segments.endswith(".parquet") else f"{segments}/*.parquet"
            self._con.execute(
                f"CREATE VIEW Segment AS SELECT {_SEGMENT_COLS} "
                f"FROM read_parquet('{src}')"
            )
        else:
            if not isinstance(segments, pa.Table):
                segments = pa.Table.from_pandas(segments)
            self._con.register("_seg_src", segments)
            self._con.execute(
                f"CREATE VIEW Segment AS SELECT {_SEGMENT_COLS} FROM _seg_src"
            )
        for ddl in _SEGMENT_MACROS + _CALENDAR_MACROS:
            self._con.execute(ddl)
        self._dp_cache_key: tuple | None = None

    # -- point reconstruction (two-phase, ViewDataPoint.scala shape) --------

    def datapoints(
        self,
        lo_ms: int | None = None,
        hi_ms: int | None = None,
        sids: Iterable[str] | None = None,
        metrics: Iterable[str] | None = None,
    ) -> pa.Table:
        """Prune segments by overlap (DuckDB pushes this into parquet
        zone maps), grid with the shared numpy/C kernels, re-filter
        points exactly."""
        conds = []
        if lo_ms is not None:
            conds.append(f"end_ts >= {int(lo_ms)}")
        if hi_ms is not None:
            conds.append(f"start_ts <= {int(hi_ms)}")
        params: list = []
        for col, vals in (("sid", sids), ("metric", metrics)):
            if vals is None:
                continue
            val_list = list(vals)
            conds.append(
                f"{col} IN (" + ", ".join("?" for _ in val_list) + ")"
                if val_list
                else "FALSE"
            )
            params += val_list
        where = (" WHERE " + " AND ".join(conds)) if conds else ""
        segs = self._con.execute(
            f"SELECT sid, metric, start_ts, end_ts, si, mtid, model "
            f"FROM Segment{where}",
            params,
        ).arrow()
        batches = [
            _grid_batch(rb) for rb in segs.to_batches() if rb.num_rows
        ]
        pts = (
            pa.Table.from_batches(batches)
            if batches
            else pa.Table.from_batches([], schema=_OUT_SCHEMA)
        )
        self._con.register("_dp_src", pts)
        flt = []
        if lo_ms is not None:
            flt.append(f"ts_ms >= {int(lo_ms)}")
        if hi_ms is not None:
            flt.append(f"ts_ms <= {int(hi_ms)}")
        fw = (" WHERE " + " AND ".join(flt)) if flt else ""
        return self._con.execute(f"SELECT * FROM _dp_src{fw}").arrow()

    def _ensure_datapoint_view(self, query: str) -> None:
        lo, hi, sids, metrics = _extract_point_bounds(query)
        key = (
            lo, hi,
            tuple(sorted(sids)) if sids is not None else None,
            tuple(sorted(metrics)) if metrics is not None else None,
        )
        if key == self._dp_cache_key:
            return
        # Materialize only the pruned window; the query's own WHERE
        # re-filters exactly (pruning is sound, never a substitute).
        pts = self.datapoints(lo_ms=lo, hi_ms=hi, sids=sids, metrics=metrics)
        self._con.register("_dp_view_src", pts)
        self._con.execute(
            "CREATE OR REPLACE VIEW DataPoint AS SELECT * FROM _dp_view_src"
        )
        self._dp_cache_key = key

    # -- query surface (Interface.execute parity) ---------------------------

    def sql(self, query: str) -> pa.Table:
        """'#'-family rewrites, DataPoint pushdown extraction, then DuckDB."""
        for pat, repl in _UDAF_SUGAR:
            query = pat.sub(repl, query)
        if _DP_RE.search(query):
            self._ensure_datapoint_view(query)
        return self._con.execute(query).arrow()

    def calendar(self, field: str, tz: str = "UTC") -> pa.Table:
        """{AGG}_{field} twin family over the reconstruction, one call:
        same output columns as the Spark calendar_agg."""
        if field not in _CAL_FIELDS:
            raise ValueError(f"field must be one of {_CAL_FIELDS}")
        bucket = (
            f"CAST(extract({field} FROM (to_timestamp(ts_ms / 1000) "
            f"AT TIME ZONE '{tz}')) AS INT)"
            if tz != "UTC"
            else f"CAL_{field.upper()}(ts_ms)"
        )
        self._ensure_datapoint_view("")
        return self._con.execute(
            f"SELECT sid, metric, {bucket} AS {field}, COUNT(*) AS cnt, "
            f"CAST(SUM(value) AS DOUBLE) AS vsum, "
            f"CAST(MIN(value) AS DOUBLE) AS vmin, "
            f"CAST(MAX(value) AS DOUBLE) AS vmax, "
            f"AVG(value) AS vavg "
            f"FROM DataPoint GROUP BY 1, 2, 3"
        ).arrow()

    def close(self) -> None:
        self._con.close()
