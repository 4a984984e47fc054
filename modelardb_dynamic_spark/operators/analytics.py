"""Series analytics over the segment store: exact pairwise Pearson
correlation (top-N-restricted) and linear-interpolation resampling.

Both operators consume the reconstructed datapoint view (so they run on
the COMPRESSED store, like every engine query), and both are engineered
for bit-exact replay by a SQL oracle: every aggregate is an exact int64
sum (order-free), and the single floating-point step is one shared
expression tree evaluated identically by Spark and DuckDB (IEEE-754 ops
on exactly-representable integer inputs are deterministic across
engines).

Scale notes (100 TB):
- `correlated_pairs` restricts the quadratic pair space to the N most
  active series FIRST (one linear aggregation + a broadcast semi-join),
  so the self-join carries at most N rows per grid bucket and the
  shuffled pair-aggregation state is bounded by N^2 rows regardless of
  corpus size. For all-pairs discovery at scale, the sketch-based
  correlation GROUPING operator (operators/grouped.py, reference
  Correlation.scala) is the linear-cost path; this operator is the exact
  verifier you run on a candidate set.
- `interpolate_grid` is one partitionBy(sid) window pass over
  observed-points + grid-points; no joins, no quadratic terms, and the
  per-sid state is two running (ts, value) carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modelardb_dynamic_spark.operators.dedup import _materialize

# CASE guard first: a constant series has zero variance -> r undefined.
# The arithmetic below is the shared Spark/DuckDB expression tree; every
# name is an exact int64, each CAST double is exact (inputs < 2^53), and
# *, /, sqrt are correctly-rounded IEEE ops -> bit-identical results.
_PEARSON_EXPR = (
    "CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) * "
    "CAST(n * syy - sy * sy AS DOUBLE) <= 0 THEN NULL "
    "ELSE CAST(n * sxy - sx * sy AS DOUBLE) / "
    "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * "
    "CAST(n * syy - sy * sy AS DOUBLE)) END"
)

# Interpolation tree shared with the oracle: exact when the grid point
# coincides with an observation (t = tp — the factor (t-tp)/(tn-tp) is 0,
# so vn is irrelevant and may even be NULL past the last observation),
# else the canonical v_prev + (v_next-v_prev) * (t-t_prev)/(t_next-t_prev).
_LERP_EXPR = (
    "CASE WHEN t = tp THEN CAST(vp AS DOUBLE) "
    "ELSE CAST(vp AS DOUBLE) + CAST(vn - vp AS DOUBLE) * "
    "(CAST(t - tp AS DOUBLE) / CAST(tn - tp AS DOUBLE)) END"
)


def correlated_pairs(
    points: DataFrame, top_n: int = 40, min_support: int = 30,
    materialize: bool = True,
) -> DataFrame:
    """Exact Pearson correlation for every pair among the `top_n` most
    active series, over the grid buckets where BOTH series have a point.

    points: (sid string, ts_ms long, v long) — v must be an exact
    integer (the engine's count-valued series at error bound 0).
    Returns (sid1, sid2, n, r) for pairs with n >= min_support.

    materialize (default on): `points` feeds THREE subtrees (the activity
    ranking and both sides of the self-join) and Spark re-executes the
    upstream plan per reference — for the engine's usual input (a segment
    decode chain) that tripled the wall. An eager localCheckpoint of the
    compact (sid, ts_ms, v) rows computes it once (the dedup self-join
    pattern, operators/dedup.py _materialize).
    """
    if materialize:
        points = _materialize(points)
    act = points.groupBy("sid").agg(F.sum("v").alias("act"))
    # deterministic top-N: activity desc, sid asc tiebreak
    top = (
        act.orderBy(F.desc("act"), F.asc("sid"))
        .limit(top_n)
        .select("sid")
    )
    b = points.join(F.broadcast(top), "sid")
    a, c = b.alias("a"), b.alias("c")
    pairs = a.join(
        c,
        (F.col("a.ts_ms") == F.col("c.ts_ms"))
        & (F.col("a.sid") < F.col("c.sid")),
    )
    agg = pairs.groupBy(
        F.col("a.sid").alias("sid1"), F.col("c.sid").alias("sid2")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a.v").alias("sx"),
        F.sum("c.v").alias("sy"),
        F.sum(F.col("a.v") * F.col("a.v")).alias("sxx"),
        F.sum(F.col("c.v") * F.col("c.v")).alias("syy"),
        F.sum(F.col("a.v") * F.col("c.v")).alias("sxy"),
    )
    return agg.where(F.col("n") >= min_support).selectExpr(
        "sid1", "sid2", "n", f"{_PEARSON_EXPR} AS r"
    )


def interpolate_grid(
    points: DataFrame, grid_ms: int, materialize: bool = True
) -> DataFrame:
    """Linear-interpolation resample: one value per sid per grid_ms-aligned
    timestamp inside the sid's observed span, interpolated between the
    nearest observations (exact where a grid point hits an observation).

    points: (sid string, ts_ms long, v long). Returns
    (sid, ts_ms, value double).

    materialize (default on): `points` feeds both the span derivation and
    the observation branch of the union — localCheckpoint computes the
    upstream (typically a segment decode) once instead of twice.

    Duplicate (sid, ts_ms) observations are collapsed to max(v) first —
    a deterministic rule; without it the lead()-successor of a tied
    timestamp (and hence the interpolation denominator) would depend on
    sort-tie order. The engine's datapoint view is already unique.
    """
    points = points.groupBy("sid", "ts_ms").agg(F.max("v").alias("v"))
    if materialize:
        points = _materialize(points)
    spans = points.groupBy("sid").agg(
        F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi")
    )
    # integer grid alignment (no float division on the path)
    grid = (
        spans.selectExpr(
            "sid",
            f"((lo + {grid_ms - 1}) DIV {grid_ms}) * {grid_ms} AS glo",
            f"(hi DIV {grid_ms}) * {grid_ms} AS ghi",
        )
        .where(F.col("glo") <= F.col("ghi"))
        .select(
            "sid",
            F.explode(
                F.sequence("glo", "ghi", F.lit(grid_ms).cast("long"))
            ).alias("t"),
        )
    )
    obs = points.select(
        "sid",
        F.col("ts_ms").alias("t"),
        F.col("v"),
        F.lit(0).alias("g"),
    )
    # ONE full-size sort. Each observation first learns its successor via
    # lead() over the (small) observation set alone; the union pass then
    # needs only FORWARD-carrying running lasts on the (t asc, g asc)
    # ordering: a grid row picks up (tp, vp) from the nearest preceding
    # observation and (tn, vn) from that same observation's stored
    # successor — which is exactly the nearest following observation,
    # since no observation lies between them. (A [current, unbounded
    # following] frame would express "next" directly but Spark evaluates
    # that frame shape O(n^2) per partition — measured 10x slower than
    # the original two-sort form, while this carry form halves it.)
    # Coincident grid points (t = tp) take vp exactly; the lerp factor is
    # 0 there, so tn being the successor (or NULL at the series end, a
    # row the filter keeps) never contributes.
    ow = Window.partitionBy("sid").orderBy("t")
    obs2 = obs.withColumn("tn0", F.lead("t").over(ow)).withColumn(
        "vn0", F.lead("v").over(ow)
    )
    u = obs2.unionByName(
        grid.select(
            "sid",
            "t",
            F.lit(None).cast("long").alias("v"),
            F.lit(1).alias("g"),
            F.lit(None).cast("long").alias("tn0"),
            F.lit(None).cast("long").alias("vn0"),
        )
    )
    wp = (
        Window.partitionBy("sid")
        .orderBy(F.asc("t"), F.asc("g"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_t = F.when(F.col("g") == 0, F.col("t"))
    res = (
        u.withColumn("vp", F.last("v", ignorenulls=True).over(wp))
        .withColumn("tp", F.last(obs_t, ignorenulls=True).over(wp))
        .withColumn("vn", F.last("vn0", ignorenulls=True).over(wp))
        .withColumn("tn", F.last("tn0", ignorenulls=True).over(wp))
    )
    return res.where(
        (F.col("g") == 1)
        & F.col("tp").isNotNull()
        & (F.col("tn").isNotNull() | (F.col("t") == F.col("tp")))
    ).selectExpr("sid", "t AS ts_ms", f"{_LERP_EXPR} AS value")
