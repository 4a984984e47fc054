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
    # ONE window pass over the observations alone: each observation learns
    # its successor via lead(), and the half-open interval [t, tn) it
    # brackets then EMITS its own grid points directly
    # (explode(sequence(...))). No grid/observation union, no second sort
    # over obs+grid rows, no carry-forward running window — earlier
    # versions of this operator did all three (a [current, unbounded
    # following] frame was 10x worse still: Spark evaluates that frame
    # shape O(n^2) per partition). Intervals partition the sid's span, so
    # each grid point is generated exactly once; the series' final
    # observation (tn NULL) contributes only a coincident grid point
    # (glo = ghi = t when t is grid-aligned, an empty range otherwise) —
    # the same "exact where the grid hits an observation, defined only
    # inside the observed span" semantics as before. A grid point equal
    # to an observation's t is emitted by the interval STARTING there, so
    # it takes the t = tp exact branch of the shared lerp expression.
    ow = Window.partitionBy("sid").orderBy("ts_ms")
    obs = points.withColumn("tn", F.lead("ts_ms").over(ow)).withColumn(
        "vn", F.lead("v").over(ow)
    )
    glo = f"((ts_ms + {grid_ms - 1}) DIV {grid_ms}) * {grid_ms}"
    ghi = f"coalesce((tn - 1) DIV {grid_ms}, ts_ms DIV {grid_ms}) * {grid_ms}"
    covered = obs.selectExpr(
        "sid",
        "ts_ms AS tp",
        "v AS vp",
        "tn",
        "vn",
        f"CASE WHEN {glo} <= {ghi} THEN "
        f"sequence({glo}, {ghi}, CAST({grid_ms} AS BIGINT)) "
        f"ELSE CAST(array() AS array<bigint>) END AS ts_grid",
    )
    return covered.select(
        "sid", "tp", "vp", "tn", "vn", F.explode("ts_grid").alias("t")
    ).selectExpr("sid", "t AS ts_ms", f"{_LERP_EXPR} AS value")


# z-score via exact integer window sums: mean = s/n, var = (n*ss - s^2)/n^2,
# so z = (v*n - s) / sqrt(n*ss - s^2) — one shared double expression over
# exact int64 inputs (both engines round the division and sqrt identically).
# Zero variance (constant window) -> NULL z, never-anomalous.
_Z_EXPR = (
    "CASE WHEN n_w IS NULL OR n_w < {minp} OR n_w * ss_w - s_w * s_w <= 0 "
    "THEN NULL "
    "ELSE CAST(v * n_w - s_w AS DOUBLE) / "
    "sqrt(CAST(n_w * ss_w - s_w * s_w AS DOUBLE)) END"
)


def rolling_zscore(
    points: DataFrame,
    window_buckets: int = 24,
    min_periods: int = 12,
    k: int = 3,
) -> DataFrame:
    """Rolling z-score anomaly detection over a value series: each point is
    scored against the TRAILING window_buckets points (itself excluded —
    the standard leak-free baseline), flagged when |z| > k.

    points: (sid string, ts_ms long, v long — exact integers). Returns
    (sid, ts_ms, v, n_w, s_w, ss_w, z, is_anomaly). The window state is
    three exact int64 sums, so the whole operator (including the flag —
    (v*n - s)^2 > k^2 * (n*ss - s^2), pure integer comparison) replays
    bit-identically in the DuckDB oracle.

    VALUE-MAGNITUDE BOUND (the price of int64-exact algebra): the flag
    products need k^2 * n^2 * max(v)^2 < 2^63, i.e. |v| <= ~3e7 at the
    defaults (k=3, window 24) — beyond that Spark's ANSI mode aborts
    with ARITHMETIC_OVERFLOW rather than corrupt. The z-score is
    scale-invariant, so large-magnitude series (ns latencies, byte
    counts) should be integer-pre-scaled (v DIV 1000) — same flags,
    same z up to the quantization.

    Scale notes: one partitionBy(sid) window pass, bounded ROWS frame —
    no joins, linear state, whole-stage codegen end to end.
    """
    w = (
        Window.partitionBy("sid")
        .orderBy("ts_ms")
        .rowsBetween(-window_buckets, -1)
    )
    z = _Z_EXPR.format(minp=min_periods)
    flag = (
        f"CASE WHEN n_w IS NULL OR n_w < {min_periods} THEN FALSE "
        f"WHEN n_w * ss_w - s_w * s_w <= 0 THEN FALSE "
        f"ELSE (v * n_w - s_w) * (v * n_w - s_w) > "
        f"{k * k} * (n_w * ss_w - s_w * s_w) END"
    )
    return (
        points.withColumn("n_w", F.count("v").over(w))
        .withColumn("s_w", F.sum("v").over(w))
        .withColumn("ss_w", F.sum(F.col("v") * F.col("v")).over(w))
        .selectExpr(
            "sid", "ts_ms", "v", "n_w", "s_w", "ss_w",
            f"{z} AS z", f"{flag} AS is_anomaly",
        )
    )


def counter_rate(
    points: DataFrame, range_ms: int
) -> DataFrame:
    """PromQL-style rate() over a monotone counter with resets: adjacent
    increase = v - lag(v) when non-negative, else v (the counter
    restarted from ~0 — credit the post-reset level, Prometheus's rule);
    per range_ms-aligned bucket, sum of increases and the per-second rate.

    points: (sid string, ts_ms long, v long). Returns (sid, bucket_ts,
    increase long, rate double). Increases are exact integers; the rate
    is one shared division. First point of a series has no predecessor
    and contributes no increase (lag NULL).

    Scale notes: one lag window + one groupBy — both keyed on sid, so
    AQE coalesces them into a single exchange.
    """
    w = Window.partitionBy("sid").orderBy("ts_ms")
    inc = (
        "CASE WHEN v_prev IS NULL THEN NULL "
        "WHEN v >= v_prev THEN v - v_prev ELSE v END"
    )
    return (
        points.withColumn("v_prev", F.lag("v").over(w))
        .selectExpr(
            "sid",
            f"((ts_ms) DIV {range_ms}) * {range_ms} AS bucket_ts",
            f"{inc} AS inc",
        )
        .where("inc IS NOT NULL")
        .groupBy("sid", "bucket_ts")
        .agg(F.sum("inc").alias("increase"))
        .selectExpr(
            "sid", "bucket_ts", "increase",
            f"CAST(increase AS DOUBLE) / {range_ms / 1000.0!r} AS rate",
        )
    )


def ewma_levels(
    points: DataFrame, bucket_ms: int, alpha: float = 0.3
) -> DataFrame:
    """Per-bucket exponentially-weighted level + one-step forecast
    backtest: within each (sid, bucket) the values fold IN TIMESTAMP
    ORDER through s <- alpha*v + (1-alpha)*s (seeded by the bucket's
    first value); the previous bucket's level is the next bucket's
    forecast, scored as absolute error against the bucket mean.

    points: (sid string, ts_ms long, v long). Returns (sid, bucket_ts,
    n, level, forecast, abs_err). Determinism: the fold is a fixed
    sequence of IEEE double ops over a sort_array-ordered list (ties
    impossible — the engine grid is unique per sid), so DuckDB's
    list_reduce replays it bit-identically (the rolling-fingerprint
    oracle precedent); mean and abs_err are single shared expressions.

    Scale notes: one groupBy collecting each bucket's values (bounded by
    points-per-bucket, e.g. <=1440 for a day bucket on the minute grid)
    + one lag window over bucket rows. The fold itself is JVM-side
    higher-order SQL, no Python.
    """
    a = repr(float(alpha))
    one_m = repr(1.0 - float(alpha))
    g = points.groupBy(
        "sid", F.expr(f"((ts_ms) DIV {bucket_ms}) * {bucket_ms}").alias("bucket_ts")
    ).agg(
        F.expr("sort_array(collect_list(struct(ts_ms, v)))").alias("pts"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
    )
    lvl = (
        f"aggregate(slice(pts, 2, size(pts) - 1), "
        f"CAST(pts[0].v AS DOUBLE), "
        f"(acc, x) -> CAST({a} AS DOUBLE) * CAST(x.v AS DOUBLE) + "
        f"CAST({one_m} AS DOUBLE) * acc)"
    )
    w = Window.partitionBy("sid").orderBy("bucket_ts")
    return (
        g.selectExpr("sid", "bucket_ts", "n", "s", f"{lvl} AS level")
        .withColumn("forecast", F.lag("level").over(w))
        .selectExpr(
            "sid", "bucket_ts", "n", "level", "forecast",
            "CASE WHEN forecast IS NULL THEN NULL "
            "ELSE abs(CAST(s AS DOUBLE) / n - forecast) END AS abs_err",
        )
    )


def m4_downsample(points: DataFrame, bucket_ms: int) -> DataFrame:
    """M4 visualization downsampling (Jugel et al., "M4: A
    Visualization-Oriented Time Series Data Aggregation", VLDB 2014):
    per (sid, pixel-column bucket) keep exactly the rows that realize
    the bucket's min/max TIME and min/max VALUE — the four points that
    make a width-w line rendering of the reduction pixel-identical to
    rendering the full series. The relational form (the paper's own
    point: M4 is a groupBy + the extreme-matching filter) beats LTTB for
    an engine like this because it is pure column algebra — no
    sequential fold, no Python.

    points: (sid, ts_ms, v). Returns (sid, bucket_ts, ts_ms, v) with the
    per-bucket extreme rows; value ties keep every achieving row (the
    relational-join semantics of the paper, replayed identically by the
    oracle). The engine grid makes ts_ms unique per sid, so first/last
    never duplicate.

    Scale: ONE window pass partitioned by (sid, bucket) — the same
    hash(sid)-dominated shuffle every tier build uses — then a
    selective filter; output is <=4 rows per bucket regardless of input
    density. For 100 TB, run it on the coarsest tier that still has
    >=n_px points per window (the planner's cover), not on raw.
    """
    b = F.expr(f"(ts_ms DIV {bucket_ms}) * {bucket_ms}")
    w = Window.partitionBy("sid", "bucket_ts")
    p = points.select("sid", b.alias("bucket_ts"), "ts_ms", "v")
    p = (
        p.withColumn("ts_lo", F.min("ts_ms").over(w))
        .withColumn("ts_hi", F.max("ts_ms").over(w))
        .withColumn("v_lo", F.min("v").over(w))
        .withColumn("v_hi", F.max("v").over(w))
    )
    return p.where(
        (F.col("ts_ms") == F.col("ts_lo"))
        | (F.col("ts_ms") == F.col("ts_hi"))
        | (F.col("v") == F.col("v_lo"))
        | (F.col("v") == F.col("v_hi"))
    ).select("sid", "bucket_ts", "ts_ms", "v")


def gap_audit(segs: DataFrame) -> DataFrame:
    """Data-quality gap audit computed from the SEGMENT TABLE ALONE — no
    decode: per sid, observed point count (sum of segment cnt), grid
    span, expected-vs-missing points, and the number/total/longest of
    interior gaps from adjacent-segment discontinuities (a gap exists
    iff next.start_ts > prev.end_ts + si; segments tile runs exactly, so
    this equals the point-level answer — the segment-native shape the
    whole engine favors, cf. the COUNT_S family SparkUDAF.scala:35-56).

    Returns (sid, observed_pts, first_ts, last_ts, expected_pts,
    missing_pts, n_gaps, gap_ms_sum, longest_gap_ms). All exact int64.

    Scale: one window pass + two groupBys, all keyed on sid (the
    engine's universal partitioning); input is segment rows (hundreds of
    times below point rows), so this audits a 100 TB store by scanning
    only its metadata-sized summary columns.
    """
    w = Window.partitionBy("sid").orderBy("start_ts")
    s = segs.select("sid", "start_ts", "end_ts", "si").withColumn(
        "prev_end", F.lag("end_ts").over(w)
    )
    gaps = s.where(
        F.col("prev_end").isNotNull()
        & (F.col("start_ts") > F.col("prev_end") + F.col("si"))
    ).select(
        "sid",
        (F.col("start_ts") - F.col("prev_end") - F.col("si")).alias("gap_ms"),
    )
    gstats = gaps.groupBy("sid").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_ms").alias("gap_ms_sum"),
        F.max("gap_ms").alias("longest_gap_ms"),
    )
    base = segs.groupBy("sid").agg(
        F.sum("cnt").alias("observed_pts"),
        F.min("start_ts").alias("first_ts"),
        F.max("end_ts").alias("last_ts"),
        F.first("si").alias("si"),
    )
    return (
        base.join(gstats, "sid", "left")
        .selectExpr(
            "sid", "observed_pts", "first_ts", "last_ts",
            "(last_ts - first_ts) DIV si + 1 AS expected_pts",
            "(last_ts - first_ts) DIV si + 1 - observed_pts AS missing_pts",
            "coalesce(n_gaps, CAST(0 AS BIGINT)) AS n_gaps",
            "coalesce(gap_ms_sum, CAST(0 AS BIGINT)) AS gap_ms_sum",
            "coalesce(longest_gap_ms, CAST(0 AS BIGINT)) AS longest_gap_ms",
        )
    )


# ACF tree shared with the oracle (same discipline as _PEARSON_EXPR):
# every aggregate is an exact int64 sum, mu = s/n is the single shared
# division, and the final expression is evaluated identically by Spark
# and DuckDB on exactly-representable inputs. Rows where the series is
# constant (q*n == s*s, an EXACT integer predicate) are excluded before
# the division so neither engine ever divides by zero.
_ACF_EXPR = (
    "(CAST(sab AS DOUBLE) - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
    "* CAST(sa + sb AS DOUBLE) "
    "+ CAST(n_pairs AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
    "* (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) "
    "/ (CAST(q AS DOUBLE) - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
    "* CAST(s AS DOUBLE))"
)


def acf_lags(
    points: DataFrame, max_lag: int, si_ms: int, materialize: bool = True
) -> DataFrame:
    """Autocorrelation function of a regular-grid integer series at lags
    1..max_lag, over the OBSERVED grid buckets: pairs are the buckets
    where both t and t+k*si exist; the series mean and energy are over
    all observed buckets (the sparse-ACF convention — gaps contribute no
    pairs rather than zeros, matching the engine's gap semantics where a
    missing bucket is absence, not 0).

    points: (sid string, ts_ms long, v long) — v exact integer (the
    engine's count-valued series at error bound 0).
    Returns (sid, lag, n_pairs, acf) for non-constant series with at
    least one pair at that lag; acf = sum((x_t-mu)(x_{t+k}-mu)) /
    sum((x_t-mu)^2), both moments expanded to exact int64 sums with mu
    applied once in a shared IEEE-754 expression tree (value-gatable).

    Scale: the lag join is an equi-join on (sid, ts) — the engine's
    universal co-partitioning key — carrying max_lag probe rows per
    point (max_lag is small and fixed); per-series moments are one
    map-side-combinable aggregation. No window over data rows, no
    quadratic term: seasonality detection at 100 TB is max_lag
    linear passes that AQE fuses into one shuffle each side.
    """
    if materialize:
        points = _materialize(points)
    spark = points.sparkSession
    base = points.groupBy("sid").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    lag_df = spark.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    a = points.alias("a")
    b = points.select(
        F.col("sid"), F.col("ts_ms").alias("ts_b"), F.col("v").alias("v_b")
    ).alias("b")
    probes = a.join(F.broadcast(lag_df))
    pairs = probes.join(
        b,
        (F.col("a.sid") == F.col("b.sid"))
        & (F.col("ts_b") == F.col("a.ts_ms") + F.col("lag") * F.lit(si_ms)),
    )
    agg = pairs.groupBy(F.col("a.sid").alias("sid"), "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("a.v").alias("sa"),
        F.sum("v_b").alias("sb"),
        F.sum(F.col("a.v") * F.col("v_b")).alias("sab"),
    )
    return (
        agg.join(base, "sid")
        .where(F.expr("q * n != s * s"))
        .selectExpr("sid", "lag", "n_pairs", f"{_ACF_EXPR} AS acf")
    )


def xcorr_leadlag(
    points: DataFrame,
    si_ms: int,
    top_n: int = 20,
    max_lag: int = 3,
    min_support: int = 10,
    materialize: bool = True,
) -> DataFrame:
    """Lead-lag cross-correlation: for every pair among the `top_n` most
    active series, the Pearson r of (a at t, b at t + lag*si) is computed
    for every lag in -max_lag..max_lag over the buckets where both sides
    have a point, and the pair's BEST lag is returned — "does series b
    follow series a, and by how many buckets?" (the classic lead-lag
    screen; `correlated_pairs` is the lag=0 column of this operator).

    points: (sid string, ts_ms long, v long) — v exact integer.
    Returns (sid1, sid2, lag, n, r): sid1 < sid2; positive lag means
    sid2's series at t + lag*si correlates with sid1's at t (sid1 LEADS
    sid2 by `lag` buckets); the winner per pair is max |r|, ties broken
    by lag ASC (deterministic: r is the shared bit-exact IEEE tree of
    _PEARSON_EXPR, so both engines rank identically). Pairs keep only
    lags with n >= min_support and defined r (zero-variance windows are
    excluded by the CASE guard before ranking).

    Scale: the quadratic pair space is top_n-bounded exactly as in
    `correlated_pairs` (the all-pairs path at catalog scale is the
    sketch-signature grouping operator, operators/grouped.py); the lag
    dimension is a broadcast of 2*max_lag+1 rows carried through ONE
    ts-equality shuffle join, one map-side-combinable moment
    aggregation, and a window over <= 2*max_lag+1 rows per pair — the
    lag sweep adds no extra shuffles over the lag-0 operator.
    """
    if materialize:
        points = _materialize(points)
    spark = points.sparkSession
    act = points.groupBy("sid").agg(F.sum("v").alias("act"))
    top = (
        act.orderBy(F.desc("act"), F.asc("sid")).limit(top_n).select("sid")
    )
    b = points.join(F.broadcast(top), "sid")
    lag_df = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").alias("lag")
    )
    a = b.join(F.broadcast(lag_df)).select(
        F.col("sid").alias("sid1"),
        (F.col("ts_ms") + F.col("lag") * F.lit(si_ms)).alias("ts_j"),
        F.col("v").alias("va"),
        "lag",
    )
    c = b.select(
        F.col("sid").alias("sid2"),
        F.col("ts_ms").alias("ts_j"),
        F.col("v").alias("vb"),
    )
    pairs = a.join(c, ["ts_j"]).where(F.col("sid1") < F.col("sid2"))
    agg = pairs.groupBy("sid1", "sid2", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("va").alias("sx"),
        F.sum("vb").alias("sy"),
        F.sum(F.col("va") * F.col("va")).alias("sxx"),
        F.sum(F.col("vb") * F.col("vb")).alias("syy"),
        F.sum(F.col("va") * F.col("vb")).alias("sxy"),
    )
    scored = (
        agg.where(F.col("n") >= min_support)
        .selectExpr("sid1", "sid2", "lag", "n", f"{_PEARSON_EXPR} AS r")
        .where(F.col("r").isNotNull())
    )
    w = Window.partitionBy("sid1", "sid2").orderBy(
        F.abs(F.col("r")).desc(), F.col("lag").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .drop("rk")
    )


def holt_winters_levels(
    points: DataFrame,
    bucket_ms: int,
    period_buckets: int,
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Holt-Winters-style seasonal forecast backtest — the seasonal
    upgrade of holt_levels, completing the classical triad (EWMA ->
    Holt -> seasonal Holt): the series is DESEASONALIZED by an additive
    per-phase offset (classical decomposition), the bit-exact Holt
    two-state fold runs over the adjusted values, and the offset is
    added back to the forecast:

        off(sid, phase) = sum_phase/n_phase - sum_all/n_all   (exact
                          int64 moments, ONE shared double tree)
        fold input       v - off                (per point, one subtract)
        forecast(t)      lag(level + trend) + off(phase(t))
        abs_err          |s/n - forecast|

    A daily-rhythm series that plain Holt chases phase-by-phase (its
    trend term whipsaws on every peak/trough) is tracked by the offset
    table, and the Holt state only has to follow the residual drift.

    Determinism: the offsets are exact int64 sums with one shared
    division tree; the fold is the holt_levels fixed IEEE op sequence
    with `(v - off)` substituted for `v` on BOTH engines; everything
    downstream is a shared expression. period_buckets must tile the
    bucket grid (phase = (bucket_ts DIV bucket_ms) % period).

    Returns (sid, bucket_ts, phase, n, level, trend, forecast, abs_err)
    with forecast/abs_err NULL on each series' first bucket.

    Scale: one extra map-side-combinable groupBy for the (sid, phase)
    profile (period_buckets rows per series, broadcast back) on top of
    holt_levels' one groupBy + one lag window. No Python, no state
    across rows outside the in-bucket fold.
    """
    a = repr(float(alpha))
    one_a = repr(1.0 - float(alpha))
    b = repr(float(beta))
    one_b = repr(1.0 - float(beta))
    ph = f"((ts_ms DIV {bucket_ms}) % {period_buckets})"
    prof = (
        points.groupBy("sid", F.expr(f"{ph}").alias("phase"))
        .agg(F.count(F.lit(1)).alias("n_g"), F.sum("v").alias("s_g"))
    )
    tot = points.groupBy("sid").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("v").alias("s_all")
    )
    off = prof.join(tot, "sid").selectExpr(
        "sid",
        "phase",
        "CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) - "
        "CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE) AS off",
    )
    g = points.groupBy(
        "sid",
        F.expr(f"(ts_ms DIV {bucket_ms}) * {bucket_ms}").alias(
            "bucket_ts"
        ),
    ).agg(
        F.expr("sort_array(collect_list(struct(ts_ms, v)))").alias("pts"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
    )
    g = g.withColumn(
        "phase",
        F.expr(f"(bucket_ts DIV {bucket_ms}) % {period_buckets}"),
    ).join(F.broadcast(off), ["sid", "phase"])
    adj = "(CAST(x.v AS DOUBLE) - off)"
    newl = (
        f"(CAST({a} AS DOUBLE) * {adj} + "
        f"CAST({one_a} AS DOUBLE) * (acc.l + acc.b))"
    )
    fold = (
        f"aggregate(slice(pts, 2, size(pts) - 1), "
        f"named_struct('l', (CAST(pts[0].v AS DOUBLE) - off), "
        f"'b', CAST(0.0 AS DOUBLE)), "
        f"(acc, x) -> named_struct("
        f"'l', {newl}, "
        f"'b', CAST({b} AS DOUBLE) * ({newl} - acc.l) + "
        f"CAST({one_b} AS DOUBLE) * acc.b))"
    )
    w = Window.partitionBy("sid").orderBy("bucket_ts")
    return (
        g.selectExpr(
            "sid", "bucket_ts", "phase", "n", "s", "off", f"{fold} AS hb"
        )
        .selectExpr(
            "sid", "bucket_ts", "phase", "n", "s", "off",
            "hb.l AS level", "hb.b AS trend",
        )
        .withColumn(
            "fc0", F.lag(F.col("level") + F.col("trend")).over(w)
        )
        .selectExpr(
            "sid", "bucket_ts", "phase", "n", "level", "trend",
            "CASE WHEN fc0 IS NULL THEN NULL ELSE fc0 + off END "
            "AS forecast",
            "CASE WHEN fc0 IS NULL THEN NULL "
            "ELSE abs(CAST(s AS DOUBLE) / n - (fc0 + off)) END AS abs_err",
        )
    )


def theil_sen(
    points: DataFrame, unit_ms: int, max_points: int = 5000
) -> DataFrame:
    """Per-series Theil–Sen robust trend: the MEDIAN of all pairwise
    slopes (y_j - y_i)/(x_j - x_i) over x_i < x_j — the
    breakdown-point-29% complement to trend_ols (one outlier bucket can
    drag an OLS slope arbitrarily; it moves the slope median by at most
    one rank).

    Exactness: x is rebased integer buckets and y exact int64 (the
    trend_ols discipline), every pairwise slope is ONE double division
    of exact integers, and the median is replayed by RANK SELECTION, not
    an engine median() (whose even-count interpolation is
    implementation-defined): rank over slope value alone — bit-equal
    ties make the value at any rank order-independent — select ranks
    (m+1)//2 and (m+2)//2, and average them with a shared
    (lo + hi)/2 tree ((x + x)/2 == x exactly for odd m).

    Returns (sid, n, m_pairs, slope) for series with n >= 3 points;
    slope is value units per unit_ms.

    Scale: the pair space is quadratic PER SERIES — this is a
    coarse-tier operator by design (n = buckets in range, e.g. daily
    tier: a year is 365 points -> 66k pairs per series, all generated
    map-side from one co-partitioned self-join on sid and reduced by
    one rank window; the sid-local quadratic never crosses series).
    ENFORCED, not documented (the _validate_tz_exact precedent): any
    series above `max_points` raises before the self-join is built —
    feed a coarser tier or raise the cap deliberately.
    """
    first = points.groupBy("sid").agg(F.min("ts_ms").alias("first_ts"))
    if max_points is not None:
        worst = (
            points.groupBy("sid")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"))
            .limit(1)
            .collect()
        )
        if worst and worst[0]["n"] > max_points:
            raise ValueError(
                f"theil_sen: series {worst[0]['sid']!r} has "
                f"{worst[0]['n']} points (> max_points={max_points}); "
                f"the pairwise-slope space is quadratic per series — "
                f"feed a coarser tier (daily instead of hourly) or "
                f"raise max_points deliberately"
            )
    p = points.join(first, "sid").select(
        "sid",
        ((F.col("ts_ms") - F.col("first_ts")) / F.lit(unit_ms))
        .cast("long")
        .alias("x"),
        F.col("v").cast("long").alias("y"),
    )
    n_pts = p.groupBy("sid").agg(F.count(F.lit(1)).alias("n"))
    a = p.select("sid", F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = p.select("sid", F.col("x").alias("xb"), F.col("y").alias("yb"))
    pr = (
        a.join(b, "sid")
        .where(F.col("xa") < F.col("xb"))
        .select(
            "sid",
            (
                (F.col("yb") - F.col("ya")).cast("double")
                / (F.col("xb") - F.col("xa")).cast("double")
            ).alias("s"),
        )
    )
    cnt = pr.groupBy("sid").agg(F.count(F.lit(1)).alias("m_pairs"))
    w = Window.partitionBy("sid").orderBy("s")
    sel = (
        pr.withColumn("r", F.row_number().over(w))
        .join(F.broadcast(cnt), "sid")
        .where(F.expr("r = (m_pairs + 1) DIV 2 OR r = (m_pairs + 2) DIV 2"))
    )
    med = sel.groupBy("sid", "m_pairs").agg(
        F.min("s").alias("lo"), F.max("s").alias("hi")
    )
    return (
        med.join(n_pts, "sid")
        .where(F.col("n") >= 3)
        .selectExpr(
            "sid", "n", "m_pairs", "(lo + hi) / CAST(2 AS DOUBLE) AS slope"
        )
    )


def seasonal_envelope(
    points: DataFrame, bucket_ms: int, period_buckets: int
) -> DataFrame:
    """Per-(series, phase) seasonal percentile ENVELOPE: exact p10 /
    p50 / p90 bands of the bucket values at each phase of the cycle
    (e.g. hour-of-day) — the "normal band" a dashboard draws and an
    alert compares against; seasonal_anomaly scores points against a
    phase MEAN, this is the order-statistics version that a heavy tail
    cannot drag.

    Built on the shared distributed-selection core (textstats
    gap_percentiles): per (sid, phase) value-count table, cumulative
    counts, ceil-index selection in pure integer arithmetic — never a
    per-key sort of raw rows, so a phase with 10^9 observations costs
    one map-side-combinable count plus a window over DISTINCT values.

    Returns (sid, phase, n, vsum, vavg, vmin, p10, p50, p90, vmax);
    vavg is the single shared double division.
    """
    from modelardb_dynamic_spark.operators.textstats import (
        gap_percentiles,
    )

    g = points.select(
        "sid",
        F.expr(
            f"((ts_ms DIV {bucket_ms}) % {period_buckets})"
        ).alias("phase"),
        F.col("v").alias("gap_ms"),
    )
    env = gap_percentiles(
        g,
        ["sid", "phase"],
        picks=(("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)),
    )
    return env.selectExpr(
        "sid", "phase", "n",
        "gap_sum_ms AS vsum", "avg_gap_ms AS vavg",
        "min_ms AS vmin", "p10", "p50", "p90", "max_ms AS vmax",
    )


def mad_outliers(points: DataFrame, k: float = 5.0) -> DataFrame:
    """Robust per-series outlier detection by median absolute deviation:
    flag buckets where |v - median(v)| > k * MAD. The mean/std detector
    (rolling_zscore) masks its own outliers — a spike inflates the std
    that judges it; the median/MAD pair has 50% breakdown, so the
    detector the spike cannot corrupt.

    Both medians are rank selections (the theil_sen discipline — never
    an engine median(), whose even-count interpolation is
    implementation-defined): median(v) over exact int64 values with the
    shared (lo + hi)/2 tree; MAD over the |v - med| doubles the first
    pass defines. Every comparison is on bit-identical doubles, so the
    flagged set is value-gatable.

    Returns EVERY bucket row (sid, ts_ms, v, med, mad, dev, is_outlier)
    with is_outlier = (mad > 0 AND dev > k * mad) — the rolling_zscore
    output discipline: a sparse corpus with no outliers still gates the
    med/mad/dev algebra, and a constant series (MAD 0, any deviation
    "infinite") is explicitly never flagged.

    Scale: two rank windows per sid + one broadcast-sized join of the
    per-sid (med, mad) table back to the buckets. A window per sid is
    the engine's natural partition; no quadratic term anywhere.
    """
    n_w = Window.partitionBy("sid")
    r_w = Window.partitionBy("sid").orderBy("v")
    med = (
        points.withColumn("r", F.row_number().over(r_w))
        .withColumn("n", F.count(F.lit(1)).over(n_w))
        .where(F.expr("r = (n + 1) DIV 2 OR r = (n + 2) DIV 2"))
        .groupBy("sid")
        .agg(
            F.expr(
                "(CAST(min(v) AS DOUBLE) + CAST(max(v) AS DOUBLE))"
                " / CAST(2 AS DOUBLE)"
            ).alias("med")
        )
    )
    dev = points.join(F.broadcast(med), "sid").withColumn(
        "dev", F.expr("abs(CAST(v AS DOUBLE) - med)")
    )
    d_w = Window.partitionBy("sid").orderBy("dev")
    mad = (
        dev.withColumn("r", F.row_number().over(d_w))
        .withColumn("n", F.count(F.lit(1)).over(n_w))
        .where(F.expr("r = (n + 1) DIV 2 OR r = (n + 2) DIV 2"))
        .groupBy("sid")
        .agg(
            F.expr("(min(dev) + max(dev)) / CAST(2 AS DOUBLE)").alias(
                "mad"
            )
        )
    )
    kk = repr(float(k))
    return dev.join(F.broadcast(mad), "sid").select(
        "sid",
        "ts_ms",
        "v",
        "med",
        "mad",
        "dev",
        F.expr(f"mad > 0 AND dev > CAST({kk} AS DOUBLE) * mad").alias(
            "is_outlier"
        ),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    chunk_ms: int,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Distributed interval-overlap join: every (left, right) pair of
    half-open intervals [lo, hi) that overlap, with the overlap length.
    Spark has no native range join, and the naive inequality join is a
    cartesian product; this is the standard time-chunking strategy —
    each interval is exploded onto the `chunk_ms` grid cells it covers,
    pairs meet in an EQUI-join on the cell, and each overlapping pair is
    emitted exactly once by keeping only the cell that contains the
    overlap's START (max(lo_l, lo_r) DIV chunk — both sides cover that
    cell by construction, so no pair is lost and none duplicates).

    left/right: (id long/string, lo long, hi long) with lo < hi; extra
    columns are carried through with the given suffixes on collisions.
    Returns left columns + right columns + overlap_ms (exact int64).

    Scale: shuffle keys are grid cells, so co-partitioning is by time —
    the same axis the tier store already buckets on; cost is
    O(span/chunk_ms) rows per interval (pick chunk_ms near the median
    interval length: each side then ships ~2 rows per interval), and a
    long interval fans out linearly, never quadratically. A hot cell
    (many concurrent intervals both sides) is the true O(k*m) output —
    AQE's skew-join split handles the cell-level imbalance.
    """
    lcols = left.columns
    rcols = right.columns
    ren_r = {
        c: c + suffixes[1] if c in lcols else c for c in rcols
    }
    ren_l = {
        c: c + suffixes[0] if c in rcols else c for c in lcols
    }
    lo_l, hi_l = ren_l["lo"], ren_l["hi"]
    lo_r, hi_r = ren_r["lo"], ren_r["hi"]
    l = left.select(
        *[F.col(c).alias(ren_l[c]) for c in lcols],
        F.explode(
            F.sequence(
                F.expr(f"lo DIV {chunk_ms}"),
                F.expr(f"(hi - 1) DIV {chunk_ms}"),
            )
        ).alias("cell"),
    )
    r = right.select(
        *[F.col(c).alias(ren_r[c]) for c in rcols],
        F.explode(
            F.sequence(
                F.expr(f"lo DIV {chunk_ms}"),
                F.expr(f"(hi - 1) DIV {chunk_ms}"),
            )
        ).alias("cell"),
    )
    j = l.join(r, "cell").where(
        (F.col(lo_l) < F.col(hi_r))
        & (F.col(lo_r) < F.col(hi_l))
        & (
            F.col("cell")
            == F.expr(f"greatest({lo_l}, {lo_r}) DIV {chunk_ms}")
        )
    )
    return j.select(
        *[F.col(ren_l[c]) for c in lcols],
        *[F.col(ren_r[c]) for c in rcols],
        (
            F.least(F.col(hi_l), F.col(hi_r))
            - F.greatest(F.col(lo_l), F.col(lo_r))
        ).alias("overlap_ms"),
    )


def sax_words(
    points: DataFrame,
    paa_ms: int,
    word_positions: int,
    alphabet: int = 8,
) -> DataFrame:
    """SAX-style symbolic words over an integer-valued series: PAA
    buckets of `paa_ms` (each summarized by its exact integer SUM —
    equal-width windows make the sum order-equivalent to the mean),
    quantized per series onto an `alphabet`-letter equal-width scale
    between the series' own min/max PAA sums, then concatenated into one
    word per (sid, window of `word_positions` consecutive PAA buckets).

    Everything before the letter lookup is exact integer algebra —
    symbol = (paa_sum - lo) * alphabet DIV (hi - lo + 1), which lands in
    [0, alphabet) with no float rounding at bin edges (the classic
    z-normalized-Gaussian-breakpoint SAX puts bin edges on irrational
    numbers; the equal-width integer variant trades that for exact
    replayability, which is what a value-gated store query needs).
    Missing PAA buckets are simply absent from the word (gap semantics),
    so word length encodes coverage.

    Returns (sid, word_ts, word). alphabet <= 26.

    Scale: two map-side-combinable aggregations keyed on (sid, bucket)
    and one catalog-sized min/max per sid broadcast back; the word
    concat sorts only within each (sid, window) group via array_sort of
    collected (pos, sym) structs — group size is word_positions, a
    constant.
    """
    if not 2 <= alphabet <= 26:
        raise ValueError("alphabet must be in [2, 26]")
    letters = "abcdefghijklmnopqrstuvwxyz"[:alphabet]
    word_ms = paa_ms * word_positions
    paa = points.groupBy(
        "sid", F.expr(f"(ts_ms DIV {paa_ms}) * {paa_ms}").alias("h")
    ).agg(F.sum("v").alias("paa_sum"))
    rng = paa.groupBy("sid").agg(
        F.min("paa_sum").alias("lo"), F.max("paa_sum").alias("hi")
    )
    sym = paa.join(F.broadcast(rng), "sid").withColumn(
        "sym",
        F.expr(f"CAST((paa_sum - lo) * {alphabet} DIV (hi - lo + 1) AS INT)"),
    )
    return sym.groupBy(
        "sid", F.expr(f"(h DIV {word_ms}) * {word_ms}").alias("word_ts")
    ).agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(h, sym))), "
            f"p -> substring('{letters}', p.sym + 1, 1)), '')"
        ).alias("word")
    )


def burst_episodes(
    points: DataFrame, threshold: int, si_ms: int, min_len: int = 1
) -> DataFrame:
    """Burst-episode detection over an integer-valued grid series: maximal
    runs of GRID-ADJACENT buckets with v >= threshold (gaps-and-islands:
    island id = grid index minus the per-sid row_number over qualifying
    buckets — two monotone integers whose difference is constant exactly
    while the run is unbroken, so a missing or sub-threshold bucket ends
    the episode). Each episode reports start/end, length, peak, and
    total volume; episodes shorter than `min_len` buckets are dropped.

    The complement of rolling_zscore: that flags single anomalous
    buckets against a trailing baseline; this materializes sustained
    load as first-class (start, end, peak) rows — "which conversations
    sustained >= T turns/min, for how long, and how hot did they get".

    All-integer algebra, so every output column is exact.
    Returns (sid, start_ts, end_ts, n_buckets, peak_v, total_v).

    Scale: one filter (pushed to the scan), ONE window pass partitioned
    by sid ordered by ts over only the above-threshold rows, one
    map-side-combinable groupBy on (sid, island) — no joins, state per
    task bounded by its rows.
    """
    w = Window.partitionBy("sid").orderBy("ts_ms")
    hot = points.where(F.col("v") >= threshold).withColumn(
        "island",
        F.expr(f"ts_ms DIV {si_ms}") - F.row_number().over(w),
    )
    return (
        hot.groupBy("sid", "island")
        .agg(
            F.min("ts_ms").alias("start_ts"),
            F.max("ts_ms").alias("end_ts"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("v").alias("peak_v"),
            F.sum("v").alias("total_v"),
        )
        .where(F.col("n_buckets") >= min_len)
        .drop("island")
    )


# Burstiness tree shared with the oracle: exact int64 moment sums, the
# Goh-Barabási coefficient B = (sigma - mu) / (sigma + mu) evaluated as
# one shared IEEE expression (sigma the POPULATION std of inter-arrival
# gaps). B -> -1 periodic, 0 Poisson-like, -> 1 extremely bursty.
_BURSTINESS_EXPR = (
    "(sqrt(CAST(n * qq - ss * ss AS DOUBLE)) - CAST(ss AS DOUBLE)) / "
    "(sqrt(CAST(n * qq - ss * ss AS DOUBLE)) + CAST(ss AS DOUBLE))"
)


def interarrival_stats(points: DataFrame, unit_ms: int = 1) -> DataFrame:
    """Inter-arrival analysis per series over OBSERVED buckets: gap count
    and exact sum/sum-of-squares, mean gap, coefficient of variation and
    the Goh-Barabási burstiness B = (sigma-mu)/(sigma+mu) — the standard
    "is this traffic periodic, Poisson, or bursty" classifier, applied
    to when conversations are active rather than how much they say.

    The gaps are consecutive-observation deltas (lag over the sid
    window) measured in `unit_ms` units (floor division — EXACT when
    observations lie on a unit_ms grid, e.g. unit_ms = the sampling
    interval; both cv and burstiness are scale-invariant so the unit
    only rescales gap_sum/mean). The unit also guards the int64 budget:
    millisecond gap squares of multi-day gaps would overflow the n*qq
    term, grid-step gaps never do. The moments are exact int64 sums and
    mean/cv/burstiness are shared IEEE expressions over them, so every
    row value-gates. Series with fewer than 2 gaps or zero gap variance
    are excluded by exact integer predicates (n >= 2 AND n*qq != ss*ss)
    rather than emitting engine-dependent NaN/inf.

    Returns (sid, n, gap_sum, gap_sq_sum, mean_units, cv, burstiness).

    Scale: one window pass + one map-side-combinable groupBy, both
    keyed on sid — the engine's universal partitioning.
    """
    w = Window.partitionBy("sid").orderBy("ts_ms")
    g = (
        points.withColumn("prev", F.lag("ts_ms").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "sid",
            F.expr(f"(ts_ms - prev) DIV {int(unit_ms)}").alias("gap"),
        )
    )
    m = g.groupBy("sid").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("ss"),
        F.sum(F.col("gap") * F.col("gap")).alias("qq"),
    )
    return m.where(F.expr("n >= 2 AND n * qq != ss * ss")).selectExpr(
        "sid", "n", "ss AS gap_sum", "qq AS gap_sq_sum",
        "CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS mean_units",
        "sqrt(CAST(n * qq - ss * ss AS DOUBLE)) / CAST(ss AS DOUBLE) AS cv",
        f"{_BURSTINESS_EXPR} AS burstiness",
    )


def time_weighted_avg(
    points: DataFrame, lo_ms: int | None = None, hi_ms: int | None = None
) -> DataFrame:
    """Time-weighted average per series over [lo_ms, hi_ms] with linear
    interpolation between observations (the TimescaleDB time_weight
    'linear' aggregate): for irregular arrivals, the plain AVG
    over-weights chatty stretches; the trapezoid integral weights each
    value by how long it was in force.

    Exactness: the trapezoid integral's only division is by 2, so the
    operator carries 2x the integral as an exact int64 column
    (sum of (t2-t1)*(v1+v2) over consecutive observed pairs — int64-safe
    while value-sums x the series' time span stay below 2^63, which
    count-valued transcript series never approach) and applies ONE
    shared double division twa = twice_integral / (2 * (last - first)).
    Series with fewer than two observations in the window are excluded
    by an exact predicate (no elapsed time to weight over).

    Returns (sid, n_pts, first_ts, last_ts, twice_integral, twa).

    Scale: one predicate-pushed scan, one lag window + one groupBy, both
    keyed on sid.
    """
    if lo_ms is not None:
        points = points.where(F.col("ts_ms") >= lo_ms)
    if hi_ms is not None:
        points = points.where(F.col("ts_ms") <= hi_ms)
    w = Window.partitionBy("sid").orderBy("ts_ms")
    p = (
        points.select("sid", "ts_ms", "v")
        .withColumn("pt", F.lag("ts_ms").over(w))
        .withColumn("pv", F.lag("v").over(w))
    )
    agg = p.groupBy("sid").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.min("ts_ms").alias("first_ts"),
        F.max("ts_ms").alias("last_ts"),
        F.sum(F.expr("(ts_ms - pt) * (v + pv)")).alias("twice_integral"),
    )
    return agg.where(F.col("n_pts") >= 2).selectExpr(
        "sid", "n_pts", "first_ts", "last_ts", "twice_integral",
        "CAST(twice_integral AS DOUBLE) / "
        "CAST(2 * (last_ts - first_ts) AS DOUBLE) AS twa",
    )


def sliding_agg(
    tier: DataFrame, bucket_ms: int, window_buckets: int
) -> DataFrame:
    """Trailing-window (hopping) continuous aggregate FROM a tier table:
    at every existing bucket, the sum/count/min/max over the trailing
    `window_buckets` buckets (inclusive) — "activity in the last 24h,
    updated hourly" straight off the 1h tier, the window shape the
    tumbling tier covers (plans/planner.py) cannot express because its
    windows overlap.

    Input: (sid, bucket_ts, cnt, vsum, ...) tier rows (rollup output).
    A RANGE frame over the integer bucket index makes the trailing
    window TIME-defined, not row-defined: missing buckets contribute
    nothing but also don't stretch the window (gap semantics — a
    rows-frame would silently widen across gaps). All exact integer
    algebra when vsum carries count-valued sums.

    Returns (sid, bucket_ts, w_cnt, w_sum, w_min, w_max).

    Scale: ONE window pass partitioned by sid, frame state bounded by
    window_buckets; no joins, no re-shuffle of raw points (the tier is
    already hundreds of times smaller).
    """
    w = (
        Window.partitionBy("sid")
        .orderBy(F.expr(f"bucket_ts DIV {bucket_ms}"))
        .rangeBetween(-(window_buckets - 1), 0)
    )
    return tier.select(
        "sid",
        "bucket_ts",
        F.sum("cnt").over(w).alias("w_cnt"),
        F.sum("vsum").over(w).alias("w_sum"),
        F.min("vmin").over(w).alias("w_min"),
        F.max("vmax").over(w).alias("w_max"),
    )


def cusum_changepoints(points: DataFrame, h_mult: int = 2) -> DataFrame:
    """Two-sided CUSUM level-shift detection (Page 1954) over an
    integer-valued grid series, in EXACT integer algebra end to end.

    The textbook recursion s_t = max(0, s_{t-1} + (v_t - mean)) is
    sequential, but it has a closed relational form: with the drift
    scaled by n to stay integral, d_t = n*v_t - S (S = series sum, so
    sum(d) = 0 and mean(d) = 0 exactly), and c_t its running sum,

        up_t = c_t - min(0, min_{j<=t} c_j)      (upward CUSUM * n)
        dn_t = max(0, max_{j<=t} c_j) - c_t      (downward CUSUM * n)

    — running cumsum minus running extremum, TWO stacked window
    expressions over one sid-partitioned ordering instead of a fold. An
    alarm fires while up_t > H (or dn_t > H) with H = h_mult * S, i.e.
    the unscaled CUSUM has accumulated more than h_mult times the series
    MEAN of sustained deviation; distinct excursions are counted by their
    entry rows (lag on the alarm flag).

    Returns one row per sid: (sid, n_buckets, vsum, max_up, max_dn,
    n_up_shifts, n_dn_shifts, first_up_ts, first_dn_ts) — every column
    exact (timestamps of the FIRST alarmed bucket per direction, NULL
    when that direction never alarms).

    int64 budget: |c_t| <= n^2 * vmax; at 5e5 buckets/series and 1e7
    peak bucket value that is ~2.5e18 < 2^63 — document larger grids by
    pre-aggregating to a coarser tier first.

    Scale: one shuffle on sid (the window), then a map-side-combinable
    groupBy; no joins, no Python.
    """
    order = Window.partitionBy("sid").orderBy("ts_ms")
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    per = Window.partitionBy("sid")
    p = points.select(
        "sid", "ts_ms", F.col("v").cast("long").alias("v")
    ).select(
        "sid",
        "ts_ms",
        "v",
        F.count("v").over(per).alias("n"),
        F.sum("v").over(per).alias("s"),
    )
    p = p.withColumn(
        "c", F.sum(F.col("n") * F.col("v") - F.col("s")).over(run)
    )
    p = p.select(
        "sid",
        "ts_ms",
        "n",
        "s",
        (F.col("c") - F.least(F.lit(0), F.min("c").over(run))).alias("up"),
        (F.greatest(F.lit(0), F.max("c").over(run)) - F.col("c")).alias("dn"),
    )
    h = F.col("s") * h_mult
    p = p.select(
        "sid",
        "ts_ms",
        "n",
        "s",
        "up",
        "dn",
        (F.col("up") > h).alias("up_a"),
        (F.col("dn") > h).alias("dn_a"),
    )
    p = p.select(
        "sid",
        "ts_ms",
        "n",
        "s",
        "up",
        "dn",
        "up_a",
        "dn_a",
        (
            F.col("up_a")
            & ~F.coalesce(F.lag("up_a").over(order), F.lit(False))
        ).alias("up_start"),
        (
            F.col("dn_a")
            & ~F.coalesce(F.lag("dn_a").over(order), F.lit(False))
        ).alias("dn_start"),
    )
    return p.groupBy("sid").agg(
        F.first("n").alias("n_buckets"),
        F.first("s").alias("vsum"),
        F.max("up").alias("max_up"),
        F.max("dn").alias("max_dn"),
        F.sum(F.col("up_start").cast("long")).alias("n_up_shifts"),
        F.sum(F.col("dn_start").cast("long")).alias("n_dn_shifts"),
        F.min(F.when(F.col("up_a"), F.col("ts_ms"))).alias("first_up_ts"),
        F.min(F.when(F.col("dn_a"), F.col("ts_ms"))).alias("first_dn_ts"),
    )


_TREND_DET = "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
_TREND_SLOPE = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (" + _TREND_DET + ")"
)
_TREND_ICEPT = (
    "(CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) / (" + _TREND_DET + ")"
)
_TREND_R2 = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
    " / ((" + _TREND_DET + ")"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


def trend_ols(points: DataFrame, unit_ms: int) -> DataFrame:
    """Per-series OLS linear trend (drift detection): slope, intercept,
    and R^2 of v ~ time for every series, with time measured in exact
    integer `unit_ms` steps from the series' own first observation.

    Exactness discipline (the _ACF_EXPR / _PEARSON_EXPR house rule): the
    five moments n, Sx, Sy, Sxx, Sxy, Syy are exact int64 sums — x is
    (ts_ms - first_ts) / unit_ms, an exact integer on any tier grid whose
    step divides unit_ms — and slope/intercept/R^2 are each ONE shared
    IEEE-754 expression tree over those moments, so DuckDB replays them
    bit-identically. Rebasing x at the series' first observation keeps
    the int64 budget honest: with B = span/unit_ms buckets and vmax the
    peak value, Sxx <= B^3 and Sxy <= B^2 * vmax — at 5e5 buckets and
    1e7 peak that is 1.25e17 and 2.5e18, both < 2^63 (absolute epoch
    timestamps would overflow Sxx ~ n * 3e24 immediately).

    Constant series (n*Syy == Sy^2, exact integer predicate) and series
    with < 3 observations are excluded: their R^2 is 0/0 and a 2-point
    "trend" is noise. Degenerate-x (all same bucket) cannot survive the
    n >= 3 filter on a grid.

    Returns (sid, n, first_ts, last_ts, slope, intercept, r2) — slope in
    value units per unit_ms, intercept the fitted value at first_ts.

    Scale: one map-side-combinable groupBy for first_ts, one equi-join
    back on sid (both sides already partitioned by the engine's
    universal key), one final groupBy. No windows over data rows.
    """
    first = points.groupBy("sid").agg(
        F.min("ts_ms").alias("first_ts")
    )
    p = points.join(first, "sid").select(
        "sid",
        "first_ts",
        "ts_ms",
        ((F.col("ts_ms") - F.col("first_ts")) / F.lit(unit_ms))
        .cast("long")
        .alias("x"),
        F.col("v").cast("long").alias("y"),
    )
    agg = p.groupBy("sid").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("first_ts").alias("first_ts"),
        F.max("ts_ms").alias("last_ts"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return agg.where(
        (F.col("n") >= 3) & F.expr("n * syy != sy * sy")
    ).selectExpr(
        "sid",
        "n",
        "first_ts",
        "last_ts",
        f"{_TREND_SLOPE} AS slope",
        f"{_TREND_ICEPT} AS intercept",
        f"{_TREND_R2} AS r2",
    )


def seasonal_anomaly(
    points: DataFrame,
    bucket_ms: int,
    period_buckets: int,
    min_periods: int = 4,
    k: int = 3,
) -> DataFrame:
    """Seasonal-profile anomaly detection: each bucket is scored against
    the OTHER observations at the same phase of the cycle (e.g. the same
    hour-of-week across all weeks, bucket_ms=3600_000 and
    period_buckets=168) — "is this Tuesday 9am unusual for a Tuesday
    9am", the shape rolling_zscore's trailing window cannot see because a
    weekly rhythm IS the trailing baseline.

    Leak-free leave-one-out: the phase profile (n, s, q exact int64 sums
    per (sid, phase)) is computed once, then each bucket's own
    contribution is subtracted exactly (n-1, s-v, q-v*v), so a gross
    outlier never inflates its own baseline. z = (n'v - s') /
    sqrt(n'q' - s'^2) — the single shared IEEE tree (sqrt is
    correctly-rounded by IEEE 754, the _Z_EXPR precedent), and the
    anomaly flag (n'v - s')^2 > k^2 (n'q' - s'^2) is a PURE INTEGER
    predicate. int64 budget (the rolling_zscore discipline, with n the
    per-phase observation count instead of the window width): the flag
    products need k^2 * n^2 * max|v|^2 < 2^63, i.e. |v| <= ~1e9/n at
    k=3 — 3e7 at n~24 weekly cycles, 1e6 at n~1000; pre-scale
    larger-magnitude series (v DIV 1000 — z is scale-invariant).

    Only anomalous buckets are returned: (sid, ts_ms, phase, v, n_p,
    s_p, q_p, z) with n_p/s_p/q_p the leave-one-out profile — result
    rows are rare by construction, the corpus is touched by one groupBy
    and one (sid, phase) equi-join, both map-side-combinable /
    co-partitioned. Phases with < min_periods+1 observations or zero
    leave-one-out variance produce no rows.
    """
    p = points.select(
        "sid",
        "ts_ms",
        F.col("v").cast("long").alias("v"),
        ((F.col("ts_ms") / F.lit(bucket_ms)).cast("long")
         % F.lit(period_buckets)).alias("phase"),
    )
    prof = p.groupBy("sid", "phase").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("v").alias("s_g"),
        F.sum(F.col("v") * F.col("v")).alias("q_g"),
    )
    j = p.join(prof, ["sid", "phase"]).selectExpr(
        "sid", "ts_ms", "phase", "v",
        "n_g - 1 AS n_p",
        "s_g - v AS s_p",
        "q_g - v * v AS q_p",
    )
    flagged = j.where(
        F.expr(
            f"n_p >= {min_periods} AND n_p * q_p - s_p * s_p > 0 "
            f"AND (n_p * v - s_p) * (n_p * v - s_p) > "
            f"{k * k} * (n_p * q_p - s_p * s_p)"
        )
    )
    return flagged.selectExpr(
        "sid", "ts_ms", "phase", "v", "n_p", "s_p", "q_p",
        "CAST(n_p * v - s_p AS DOUBLE) / "
        "sqrt(CAST(n_p * q_p - s_p * s_p AS DOUBLE)) AS z",
    )


def holt_levels(
    points: DataFrame,
    bucket_ms: int,
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing + one-step forecast
    backtest — the trend-aware upgrade of ewma_levels: within each
    (sid, bucket) the values fold IN TIMESTAMP ORDER through

        l' = alpha*v + (1-alpha)*(l + b)
        b' = beta*(l' - l) + (1-beta)*b        (seeded l=first value, b=0)

    and the previous bucket's (level + trend) is the next bucket's
    forecast — a drifting series that EWMA perpetually lags is tracked
    by the trend term (forecast extrapolates the drift).

    Determinism (the ewma_levels discipline, extended to TWO-state
    folds): the fold is a fixed sequence of IEEE double ops over a
    sort_array-ordered list, carried as a struct('l','b') accumulator in
    Spark and a [l, b] list accumulator in DuckDB's list_reduce — the
    arithmetic expression trees are written identically on both sides
    (l' recomputed inside b' from the same subexpression), so the replay
    is bit-identical. Mean and abs_err are single shared expressions.

    Returns (sid, bucket_ts, n, level, trend, forecast, abs_err) with
    forecast/abs_err NULL on each series' first bucket.

    Scale notes: one groupBy collecting each bucket's values (bounded by
    points-per-bucket) + one lag window over bucket rows; the fold is
    JVM-side higher-order SQL, no Python.
    """
    a = repr(float(alpha))
    one_a = repr(1.0 - float(alpha))
    b = repr(float(beta))
    one_b = repr(1.0 - float(beta))
    g = points.groupBy(
        "sid",
        F.expr(f"((ts_ms) DIV {bucket_ms}) * {bucket_ms}").alias(
            "bucket_ts"
        ),
    ).agg(
        F.expr("sort_array(collect_list(struct(ts_ms, v)))").alias("pts"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
    )
    newl = (
        f"(CAST({a} AS DOUBLE) * CAST(x.v AS DOUBLE) + "
        f"CAST({one_a} AS DOUBLE) * (acc.l + acc.b))"
    )
    fold = (
        f"aggregate(slice(pts, 2, size(pts) - 1), "
        f"named_struct('l', CAST(pts[0].v AS DOUBLE), "
        f"'b', CAST(0.0 AS DOUBLE)), "
        f"(acc, x) -> named_struct("
        f"'l', {newl}, "
        f"'b', CAST({b} AS DOUBLE) * ({newl} - acc.l) + "
        f"CAST({one_b} AS DOUBLE) * acc.b))"
    )
    w = Window.partitionBy("sid").orderBy("bucket_ts")
    return (
        g.selectExpr("sid", "bucket_ts", "n", "s", f"{fold} AS hb")
        .selectExpr(
            "sid", "bucket_ts", "n", "s",
            "hb.l AS level", "hb.b AS trend",
        )
        .withColumn(
            "forecast", F.lag(F.col("level") + F.col("trend")).over(w)
        )
        .selectExpr(
            "sid", "bucket_ts", "n", "level", "trend", "forecast",
            "CASE WHEN forecast IS NULL THEN NULL "
            "ELSE abs(CAST(s AS DOUBLE) / n - forecast) END AS abs_err",
        )
    )


def sax_similar_pairs(
    words: DataFrame,
    theta_num: int = 1,
    theta_den: int = 4,
    max_df: int | None = None,
) -> DataFrame:
    """Series shape-similarity search over the SAX symbolic layer — the
    iSAX candidate-generation idea (Shieh & Keogh): two series whose
    windows quantize to many of the SAME symbolic words moved the same
    way, without ever comparing raw points. Input is sax_words output
    (sid, word_ts, word); similarity is Jaccard over each series' set of
    DISTINCT words, pairs kept by the EXACT integer predicate
    theta_den * |A∩B| >= theta_num * |A∪B| (the turn_echo discipline: no
    float threshold), with jaccard emitted as one shared division and
    deterministic sid1 < sid2 orientation.

    Scale: the classic inverted-index self-join — one row per DISTINCT
    (sid, word), pairs generated ONLY for series sharing a word (never a
    cross join of series); `max_df` drops words shared by more than
    max_df series first (stop-shape removal — a word half the corpus
    emits pairs quadratically and carries no discriminative signal; the
    same df-cap every inverted-index join uses). Intersections are one
    map-side-combinable groupBy on the pair; set sizes join back from a
    catalog-sized per-sid count.
    """
    distinct_w = words.select("sid", "word").distinct()
    if max_df is not None:
        df_t = distinct_w.groupBy("word").agg(
            F.count(F.lit(1)).alias("df")
        )
        distinct_w = distinct_w.join(
            df_t.where(F.col("df") <= max_df).select("word"), ["word"]
        )
    sizes = distinct_w.groupBy("sid").agg(F.count(F.lit(1)).alias("n_w"))
    a = distinct_w.selectExpr("word", "sid AS sid1")
    b = distinct_w.selectExpr("word", "sid AS sid2")
    inter = (
        a.join(b, ["word"])
        .where(F.col("sid1") < F.col("sid2"))
        .groupBy("sid1", "sid2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    j = (
        inter.join(sizes.selectExpr("sid AS sid1", "n_w AS n1"), ["sid1"])
        .join(sizes.selectExpr("sid AS sid2", "n_w AS n2"), ["sid2"])
        .selectExpr(
            "sid1", "sid2", "n_inter",
            "n1 + n2 - n_inter AS n_union",
        )
        .where(
            F.expr(f"{theta_den} * n_inter >= {theta_num} * (n_union)")
        )
    )
    return j.selectExpr(
        "sid1", "sid2",
        "CAST(n_inter AS BIGINT) AS n_inter",
        "CAST(n_union AS BIGINT) AS n_union",
        "CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard",
    )


def km_survival(
    lifetimes: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kaplan-Meier survival curve over right-censored lifetimes.

    Input: one row per subject with `t` (positive int64 lifetime, e.g.
    conversation length in turns) and `observed` (1 = the end of life was
    seen, 0 = right-censored: the subject was still alive at the
    observation cutoff). Output: one row per distinct lifetime value t
    (per group) with the risk-set size, event/censor counts, and the
    product-limit survival estimate

        S(t) = prod_{u <= t} (n_u - d_u) / n_u

    where n_u = subjects with T >= u and d_u = observed events at u.
    Censored subjects leave the risk set without contributing a factor —
    the reason KM, not the naive empirical CDF, is the right estimator
    when some conversations are still in flight at snapshot time.

    Bit-exact replay: d/c/n are exact int64 window sums; each factor is
    ONE IEEE division of exactly-representable ints; S(t) is a
    left-to-right fold of correctly-rounded double multiplies in
    ascending-t order (sort_array on a (t, factor) struct list here,
    frame-ordered list(factor) + list_reduce in DuckDB) — the repo's
    standard sorted-fold contract, so both engines emit identical bits.

    Scale notes (100 TB): lifetimes are one linear groupBy upstream; this
    operator then runs entirely on the DISTINCT-lifetime table, bounded
    by max(T) rows per group (conversation turn counts — hundreds), so
    the O(k^2) window fold is on a catalog-sized frame, never raw rows.
    No reference counterpart (survival analysis is an addition); the
    segment store supplies lifetimes via one scan of the series catalog.
    """
    groups = list(group_cols or [])
    per_t = (
        lifetimes.selectExpr(
            *groups,
            "CAST(t AS BIGINT) AS t",
            "CAST(observed AS BIGINT) AS obs",
        )
        .groupBy(*groups, "t")
        .agg(
            F.sum("obs").alias("d_events"),
            F.sum(F.lit(1) - F.col("obs")).alias("c_censored"),
        )
    )
    w_desc = (
        Window.partitionBy(*groups)
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = per_t.withColumn(
        "n_at_risk",
        F.sum(F.col("d_events") + F.col("c_censored")).over(w_desc),
    ).withColumn(
        "factor",
        (F.col("n_at_risk") - F.col("d_events")).cast("double")
        / F.col("n_at_risk").cast("double"),
    )
    w_asc = (
        Window.partitionBy(*groups)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lst = F.sort_array(
        F.collect_list(F.struct(F.col("t"), F.col("factor"))).over(w_asc)
    )
    return at_risk.withColumn(
        "surv", F.aggregate(lst, F.lit(1.0), lambda a, s: a * s["factor"])
    ).select(
        *groups,
        "t",
        "n_at_risk",
        "d_events",
        "c_censored",
        "surv",
    )


def _dlit(v: float) -> str:
    """Exact shared double literal: repr() round-trips the IEEE value and
    the E-suffix forces both Spark and DuckDB to parse it directly as
    DOUBLE (correctly rounded), bypassing DuckDB's DECIMAL literal path
    whose DOUBLE conversion can be 1 ulp off."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "e0"


def _wilson_expr(n: str, k: str, z: float, sign: str) -> str:
    """One shared Spark/DuckDB expression tree for the Wilson score
    interval bound: (p + z^2/2n +- z*sqrt((p(1-p) + z^2/4n)/n)) / (1 + z^2/n).
    Inputs are exact int64 counts; every op is a correctly-rounded IEEE
    +,-,*,/ or sqrt on doubles, so both engines emit identical bits for
    the identical tree. z and z^2 are injected via _dlit (E-notation
    double literals): a plain decimal literal parses as DECIMAL in both
    engines, and DuckDB's DECIMAL->DOUBLE conversion is NOT correctly
    rounded (observed 1 ulp off on 3.8415999999999997), whereas
    E-notation hits the native correctly-rounded string->double path in
    both engines."""
    zl, z2 = _dlit(float(z)), _dlit(float(z) * float(z))
    p = f"(CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE))"
    nf = f"CAST({n} AS DOUBLE)"
    return (
        f"(({p} + {z2} / (2 * {nf}) {sign} {zl} * "
        f"sqrt(({p} * (1 - {p}) + {z2} / (4 * {nf})) / {nf})) "
        f"/ (1 + {z2} / {nf}))"
    )


def wilson_intervals(
    counts: DataFrame,
    key_cols: list[str],
    n_col: str = "n_trials",
    k_col: str = "k_hits",
    z: float = 1.96,
) -> DataFrame:
    """Wilson score confidence interval per key over exact trial/hit
    counts — the statistic behind "rank by lower bound": a key with 2/2
    hits must NOT outrank one with 95/100, and the Wilson lower bound is
    the standard small-n-safe ordering (Agresti & Coull 1998; the
    reddit/Evan Miller comment-ranking formula). Output per key:
    n_trials, k_hits, p_hat, wilson_lb, wilson_ub.

    Bit-exact replay: counts are exact int64 aggregates (order-free);
    both bounds are ONE shared IEEE tree (_wilson_expr) evaluated
    identically by Spark and DuckDB. Scale notes (100 TB): one linear
    map-side-combined groupBy; the interval math is per-row expression
    on the key-sized result — no joins, no windows, no Python."""
    agg = counts.groupBy(*key_cols).agg(
        F.sum(F.col(n_col).cast("long")).alias("n_trials"),
        F.sum(F.col(k_col).cast("long")).alias("k_hits"),
    )
    return agg.selectExpr(
        *key_cols,
        "n_trials",
        "k_hits",
        "CAST(k_hits AS DOUBLE) / CAST(n_trials AS DOUBLE) AS p_hat",
        _wilson_expr("n_trials", "k_hits", z, "-") + " AS wilson_lb",
        _wilson_expr("n_trials", "k_hits", z, "+") + " AS wilson_ub",
    )


def lttb_downsample(points: DataFrame, n_out: int) -> DataFrame:
    """Largest-Triangle-Three-Buckets visual downsampling (Steinarsson
    2013) to <= n_out points per series — the shape-preserving
    counterpart of m4_downsample (which pins pixel extremes; LTTB pins
    perceived line shape). First/last points always kept; the n-2
    interior points split into n_out-2 count-equal buckets (interior
    index j -> bucket 1 + ((j-1)*(n_out-2)) // (n-2), the floor-inverse
    both engines share); each bucket keeps the point maximizing the
    triangle area against the PREVIOUS selection and the NEXT bucket's
    average point. Series with n <= n_out pass through whole.

    Exactness: ts is rebased per series (x = ts - first_ts) so the
    doubled-and-next-count-scaled area
        |(xa*nn - sx)*(yb - ya) - (xa - xb)*(sv - ya*nn)|
    is EXACT int64 (no float averages, no rounding): argmax + smallest-
    index tie-break is therefore bit-reproducible, and the DuckDB oracle
    replays the identical recurrence as a recursive CTE with the same
    integer algebra. Requires x_span * bucket_count * v_span < 2^63 —
    holds for ms grids spanning years at int32 values.

    Scale notes (100 TB): one shuffle on sid (applyInPandas); per series
    the loop is over n_out buckets with vectorized numpy argmax inside —
    O(n) work, n_out-bounded state. Selection is inherently sequential
    per series (each pick conditions the next), so per-series is the
    natural parallel grain; cross-series parallelism is the scale axis.
    No reference counterpart (visualization family addition, like M4).
    """
    if n_out < 3:
        raise ValueError("lttb_downsample needs n_out >= 3")
    import numpy as np
    import pandas as pd

    B = int(n_out)

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_ms", kind="mergesort")
        ts = pdf["ts_ms"].to_numpy(np.int64)
        v = pdf["v"].to_numpy(np.int64)
        n = len(ts)
        if n <= B:
            return pdf[["sid", "ts_ms", "v"]]
        x = ts - ts[0]
        M, K = n - 2, B - 2
        j = np.arange(M, dtype=np.int64)  # interior j = i-1
        k = 1 + (j * K) // M  # bucket label per interior point, 1..K
        # bounds[b] = first j-position of bucket b+1 (len K+1, last = M)
        starts = np.searchsorted(k, np.arange(1, K + 1))
        bounds = np.append(starts, M)
        sel = [0]
        xa, ya = int(x[0]), int(v[0])
        for kk in range(1, K + 1):
            lo, hi = int(bounds[kk - 1]), int(bounds[kk])
            if kk < K:
                nlo, nhi = hi, int(bounds[kk + 1])
                nn = nhi - nlo
                sx = int(x[nlo + 1 : nhi + 1].sum())
                sv = int(v[nlo + 1 : nhi + 1].sum())
            else:
                nn, sx, sv = 1, int(x[n - 1]), int(v[n - 1])
            cx = x[lo + 1 : hi + 1]
            cv = v[lo + 1 : hi + 1]
            area = np.abs(
                (xa * nn - sx) * (cv - ya) - (xa - cx) * (sv - ya * nn)
            )
            pick = lo + 1 + int(np.argmax(area))
            sel.append(pick)
            xa, ya = int(x[pick]), int(v[pick])
        sel.append(n - 1)
        return pdf.iloc[sel][["sid", "ts_ms", "v"]]

    return (
        points.select("sid", "ts_ms", "v")
        .groupBy("sid")
        .applyInPandas(_one, "sid string, ts_ms long, v long")
    )


def _kalman_steps(
    acc_l: str, acc_p: str, acc_s: str, x: str, q: str, r: str
) -> tuple[str, str, str]:
    """One Kalman local-level update as three engine-neutral expression
    strings (new level, new variance, new innovation-SSE). Built from
    accessor fragments so the Spark fold and the DuckDB oracle replay
    the IDENTICAL IEEE tree: P_pred = P + Q; K = P_pred / (P_pred + R);
    l' = l + K * (y - l); P' = (1 - K) * P_pred; s' = s + (y - l)^2."""
    pp = f"({acc_p} + {q})"
    k = f"({pp} / ({pp} + {r}))"
    innov = f"({x} - {acc_l})"
    return (
        f"({acc_l} + {k} * {innov})",
        f"((CAST(1 AS DOUBLE) - {k}) * {pp})",
        f"({acc_s} + {innov} * {innov})",
    )


def kalman_level(
    points: DataFrame,
    q_var: float = 1.0,
    r_var: float = 4.0,
    p0: float = 1.0,
) -> DataFrame:
    """Kalman filter, local-level model (state-space twin of the EWMA/
    Holt family): x_k = x_{k-1} + w (Q), y_k = x_k + v (R). Per series,
    the filter folds over the time-ordered values and reports the final
    filtered level, its posterior variance, the innovation SSE, and the
    one-step-ahead RMSE — the model-fit number you compare against
    ewma_backtest/holt_backtest to pick a smoother. Unlike fixed-alpha
    EWMA, the Kalman gain ADAPTS (large early, converging to the
    steady-state Q/R balance), which is the practical reason to own it.

    Bit-exact replay: the fold is a fixed IEEE double sequence
    (init l = first value, P = p0, SSE = 0) whose per-step tree
    (_kalman_steps) both engines evaluate verbatim; Q/R/p0 are _dlit
    literals; rmse = sqrt(SSE/(n-1)) is the one closing shared tree.

    Scale notes (100 TB): one shuffle (groupBy sid) collecting each
    series' values in time order — per-series sequential state is the
    model's nature; the array is retention-bounded (a month of minutes
    = 43k doubles). The fold itself is JVM higher-order SQL, no Python.
    """
    ql, rl, p0l = _dlit(q_var), _dlit(r_var), _dlit(p0)
    newl, newp, news = _kalman_steps(
        "acc.l", "acc.p", "acc.s", "x", ql, rl
    )
    fold = (
        f"aggregate(slice(vs, 2, size(vs) - 1), "
        f"named_struct('l', vs[0], 'p', {p0l}, 's', CAST(0 AS DOUBLE)), "
        f"(acc, x) -> named_struct("
        f"'l', {newl}, 'p', {newp}, 's', {news}))"
    )
    g = points.groupBy("sid").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(ts_ms, v))), "
            "s -> CAST(s.v AS DOUBLE))"
        ).alias("vs"),
        F.count(F.lit(1)).alias("n_pts"),
    )
    return g.selectExpr(
        "sid",
        "CAST(n_pts AS BIGINT) AS n_pts",
        f"{fold} AS kf",
    ).selectExpr(
        "sid",
        "n_pts",
        "kf.l AS level",
        "kf.p AS p_var",
        "kf.s AS sse",
        "CASE WHEN n_pts >= 2 THEN "
        "sqrt(kf.s / CAST(n_pts - 1 AS DOUBLE)) END AS rmse",
    )


def sax_discords(words: DataFrame, top_k: int = 1) -> DataFrame:
    """Discord candidates off the symbolic layer — HOT SAX's ordering
    heuristic made the answer: a series' most anomalous windows are the
    ones whose SAX word is RAREST corpus-wide (Keogh's discord search
    visits windows in ascending word frequency precisely because the
    true discord is almost always there). Per series, the top_k windows
    by (corpus word frequency ASC, word_ts ASC) — exact integer counts,
    deterministic ties, no distance computations at all, so the whole
    operator is value-replayable and runs on the compressed store's
    word table. Returns (sid, word_ts, word, word_freq, rnk).

    Scale notes (100 TB): word frequencies are one map-side-combinable
    groupBy over the word table (already PAA-compressed, ~1/480th of
    raw minutes at the 8h word); the join is vocabulary-sized and
    broadcastable; the per-series window ranks word-table rows only."""
    cf = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("word_freq")
    )
    w = Window.partitionBy("sid").orderBy(
        F.asc("word_freq"), F.asc("word_ts")
    )
    return (
        words.join(F.broadcast(cf), ["word"])
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= top_k)
        .select("sid", "word_ts", "word", "word_freq", "rnk")
    )


def croston(
    points: DataFrame,
    si_ms: int,
    alpha: float = 0.1,
) -> DataFrame:
    """Croston's method for INTERMITTENT series (+ the Syntetos-Boylan
    bias correction) — the forecaster built for exactly what sparse
    conversation activity looks like: most grid periods empty, demand
    arriving in bursts, where plain EWMA systematically overshoots
    right after each arrival. Two coupled exponential smoothers run
    only on demand events: size zhat' = a*z + (1-a)*zhat and
    inter-arrival phat' = a*g + (1-a)*phat (g in grid periods);
    forecast per period = zhat/phat, SBA = (1 - a/2) * (zhat/phat).

    Init: zhat = first demand size; phat = 1 (the first observation
    defines the grid origin, so its waiting time is one period by
    convention — phat then converges to the true mean interval as
    demands arrive); the fold starts at the second demand. points are
    the engine's sparse minute buckets —
    ABSENT rows are the zero periods, so no densification is needed.

    Bit-exact replay: gaps/positions are exact int64 window algebra;
    the fold is the repo's padded-list pattern with _dlit alpha
    literals; both forecasts are shared closing trees. Scale notes:
    one lag window + one groupBy(sid) collecting DEMAND events only
    (the series' sparsity is the state bound — zero periods cost
    nothing, the whole point of Croston over dense smoothers)."""
    a, one_a = _dlit(alpha), _dlit(1.0 - alpha)
    w = Window.partitionBy("sid").orderBy("ts_ms")
    ev = (
        points.withColumn(
            "pos", ((F.col("ts_ms") - F.min("ts_ms").over(
                Window.partitionBy("sid"))) / si_ms).cast("long") + 1
        )
        .withColumn("gap", F.coalesce(
            F.col("pos") - F.lag("pos").over(w), F.col("pos")
        ))
        .selectExpr("sid", "pos", "gap", "CAST(v AS LONG) AS z")
    )
    newz = f"({a} * CAST(x.z AS DOUBLE) + {one_a} * acc.zh)"
    newp = f"({a} * CAST(x.gap AS DOUBLE) + {one_a} * acc.ph)"
    fold = (
        f"aggregate(slice(es, 2, size(es) - 1), "
        f"named_struct('zh', CAST(es[0].z AS DOUBLE), "
        f"'ph', CAST(es[0].gap AS DOUBLE)), "
        f"(acc, x) -> named_struct('zh', {newz}, 'ph', {newp}))"
    )
    g = ev.groupBy("sid").agg(
        F.expr("sort_array(collect_list(struct(pos, gap, z)))").alias("es"),
        F.count(F.lit(1)).alias("n_demands"),
        F.max("pos").alias("n_periods"),
    )
    return g.selectExpr(
        "sid",
        "CAST(n_demands AS BIGINT) AS n_demands",
        "CAST(n_periods AS BIGINT) AS n_periods",
        f"{fold} AS cr",
    ).selectExpr(
        "sid",
        "n_demands",
        "n_periods",
        "cr.zh AS zhat",
        "cr.ph AS phat",
        "cr.zh / cr.ph AS croston_fcst",
        f"{_dlit(1.0 - alpha / 2.0)} * (cr.zh / cr.ph) AS sba_fcst",
    )


def dispersion_index(
    points: DataFrame,
    bucket_ms: int,
) -> DataFrame:
    """Index of dispersion (Fano factor) per series: sample variance /
    mean of the per-bucket counts — the one-number burstiness verdict
    (Poisson arrivals give ~1; > 1 bursty/clumped, < 1 regular/paced).
    Complements burst_episodes (which finds the bursts) with the
    series-level statistic you THRESHOLD to decide who needs burst
    analysis at all.

    Exactness: bucket counts and both moments are exact int64; the
    index is ONE shared division
        D = (n * sum(x^2) - sum(x)^2) / ((n - 1) * sum(x))
    (sample variance over mean, algebraically cleared), NULL when n < 2
    or sum(x) = 0. Scale notes: two map-side-combinable groupBys
    (bucket counts, then per-series moments); no windows, no joins."""
    b = points.groupBy(
        "sid",
        F.expr(f"(ts_ms DIV {bucket_ms}) * {bucket_ms}").alias("b"),
    ).agg(F.sum("v").cast("long").alias("x"))
    m = b.groupBy("sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return m.selectExpr(
        "sid",
        "n_buckets",
        "sx AS total",
        "CASE WHEN n_buckets >= 2 AND sx > 0 THEN "
        "CAST(n_buckets * sxx - sx * sx AS DOUBLE) / "
        "CAST((n_buckets - 1) * sx AS DOUBLE) END AS dispersion",
    )


def peak_concurrency(
    sessions: DataFrame,
    bucket_ms: int,
    start_col: str = "start_ms",
    end_col: str = "end_ms",
) -> DataFrame:
    """Sweep-line peak concurrency: per time bucket, the maximum number
    of sessions simultaneously active at any within-bucket boundary
    instant, and the first instant attaining it. A session covers the
    closed interval [start_ms, end_ms]. Capacity planning's first
    question ("how many at once, and when"), exact — no sampling grid.

    Semantics: concurrency is evaluated at interval BOUNDARIES (starts
    and ends+1), where every change happens; a bucket containing no
    boundary carries a constant level from before and is omitted (its
    level is readable from the previous bucket's step function).

    Exactness: all integer (counts, epoch ms); ties at one instant
    collapse into a net delta before the running sum, so ordering
    within an instant can't matter.

    Scale notes: the +1/-1 deltas are groupBy-collapsed to one row per
    DISTINCT boundary instant (map-side combinable) before the running
    sum, so the global-order window carries |distinct boundaries| rows,
    not |sessions| — with ms granularity that is bounded by the time
    span, not the corpus. At 100 TB replace the single window with the
    standard two-pass range-partitioned prefix sum (per-partition
    subtotals broadcast as offsets); the bucket max/argmax stage is
    unchanged."""
    ends = sessions.select(
        (F.col(end_col) + 1).alias("t"), F.lit(-1).alias("d")
    )
    starts = sessions.select(F.col(start_col).alias("t"), F.lit(1).alias("d"))
    net = starts.unionByName(ends).groupBy("t").agg(F.sum("d").alias("d"))
    run = net.withColumn(
        "c",
        F.sum("d").over(
            Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("b", F.expr(f"(t DIV {bucket_ms}) * {bucket_ms}"))
    w = Window.partitionBy("b").orderBy(F.desc("c"), F.asc("t"))
    return (
        run.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("b").alias("bucket_ts"),
            F.col("c").cast("long").alias("peak"),
            F.col("t").alias("peak_at_ms"),
        )
    )


def flatline_runs(points: DataFrame, si_ms: int) -> DataFrame:
    """Longest flatline per series: the maximal run of consecutive
    grid points (spacing exactly si_ms — a gap breaks the run) holding
    the SAME value. The stuck-sensor / dead-counter detector: a healthy
    busy series flatlines for minutes, a wedged one for days.

    Gaps-and-islands, all integer: within (sid, v), consecutive grid
    indices minus their per-partition row_number are constant per run;
    a timestamp gap jumps the index and splits the island. Returns one
    row per sid: longest run (points), its value, and its start ts
    (ties: earliest run wins, deterministic).

    Scale notes: two window passes partitioned by sid (the storage
    partitioning, so no extra shuffle after the datapoint view) and one
    map-side-combinable groupBy; state per row is O(1)."""
    idx = points.select(
        "sid", "v", (F.col("ts_ms") / si_ms).cast("long").alias("i")
    )
    wv = Window.partitionBy("sid", "v").orderBy("i")
    isl = idx.withColumn("g", F.col("i") - F.row_number().over(wv))
    runs = isl.groupBy("sid", "v", "g").agg(
        F.count(F.lit(1)).cast("long").alias("run_len"),
        (F.min("i") * si_ms).alias("run_start_ms"),
    )
    wr = Window.partitionBy("sid").orderBy(
        F.desc("run_len"), F.asc("run_start_ms"), F.asc("v")
    )
    return (
        runs.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("sid", "run_len", F.col("v").alias("run_value"), "run_start_ms")
    )


# Benford first-digit probabilities log10(1 + 1/d), emitted once as
# E-notation double literals so Spark and DuckDB evaluate the identical
# constants (the shared-literal trick used throughout this module).
import math as _math

BENFORD_P = [_math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def benford_audit(events: DataFrame, value_col: str = "value") -> DataFrame:
    """First-significant-digit audit per event_type: observed digit-1
    share and the chi-square statistic against Benford's law. Fabricated
    or unit-mangled value streams jump out (chi2 explodes); organically
    spread magnitudes conform. Values are read at cent precision
    (round(v*100)), non-positive cents skipped.

    Exactness: digit extraction is integer string math on the exact
    cents; expected shares are shared double literals; the chi-square
    fold runs digit-ascending over all 9 digits (absent digits count
    obs=0) so the 9-term float sum has ONE evaluation order in both
    engines.

    Scale notes: one map-side-combinable groupBy to |types| x 9 cells,
    then a per-type fold over <= 9 elements — driver-free, join-free
    (the digit frame is a 9-row broadcast)."""
    cents = events.select(
        "event_type",
        F.expr(f"CAST(round({value_col} * 100) AS BIGINT)").alias("cents"),
    ).where(F.col("cents") > 0)
    dig = cents.withColumn(
        "digit", F.expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)")
    )
    obs = dig.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    spark = events.sparkSession
    frame = (
        obs.select("event_type").distinct()
        .crossJoin(F.broadcast(spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))))
    )
    full = frame.join(obs, ["event_type", "digit"], "left").fillna(0, ["obs"])
    n = full.groupBy("event_type").agg(F.sum("obs").alias("n"))
    p_case = "CASE digit " + " ".join(
        f"WHEN {d + 1} THEN {_dlit(p)}" for d, p in enumerate(BENFORD_P)
    ) + " END"
    terms = full.join(n, "event_type").selectExpr(
        "event_type",
        "n",
        "digit",
        "CASE WHEN digit = 1 THEN CAST(obs AS DOUBLE) / CAST(n AS DOUBLE) END"
        " AS d1",
        f"(CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * ({p_case}))"
        f" * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * ({p_case}))"
        f" / (CAST(n AS DOUBLE) * ({p_case})) AS term",
    )
    return (
        terms.groupBy("event_type", "n")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(digit, term))), "
                "CAST(0 AS DOUBLE), (a, x) -> a + x.term)"
            ).alias("chi2"),
            F.max("d1").alias("digit1_share"),
        )
        .select("event_type", "n", "digit1_share", "chi2")
    )


def decayed_counts(
    events: DataFrame,
    half_life_days: int = 7,
    horizon_days: int = 31,
    ts_col: str = "ts",
    id_col: str = "user_id",
) -> DataFrame:
    """Recency-weighted activity score per user: each event weighs
    2^-(age_days // half_life_days), age measured in whole UTC days
    back from the newest event day in the table; events older than
    horizon_days weigh 0. The "who is active NOW" ranking that a plain
    count gets wrong.

    Exactness: the weight ladder is integer — an event contributes
    2^(31 - age//h) to an int64 sum, and the score is that sum divided
    by the double literal 2^31 (one exact division; every power of two
    here is exactly representable), so NO float accumulation order
    exists at all.

    Scale notes: per-(user, age-step) counts collapse map-side; the
    anchor day is one broadcast scalar; the weighted sum is a second
    map-side-combinable groupBy. Overflow headroom: 2^31 * count —
    safe below ~4e9 events per user within the horizon."""
    day = F.expr(f"unix_millis(CAST({ts_col} AS TIMESTAMP)) DIV {86_400_000}")
    anchor = events.agg(F.max(day).alias("anchor_d"))
    aged = (
        events.select(F.col(id_col), day.alias("d"))
        .crossJoin(F.broadcast(anchor))
        .where(F.col("anchor_d") - F.col("d") <= horizon_days)
        .selectExpr(
            id_col,
            f"(anchor_d - d) DIV {half_life_days} AS step",
        )
    )
    return (
        aged.groupBy(id_col, "step")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .selectExpr(
            id_col,
            "cnt * shiftleft(CAST(1 AS BIGINT), CAST(31 - step AS INT)) AS wsum",
            "cnt",
        )
        .groupBy(id_col)
        .agg(
            F.expr(f"CAST(sum(wsum) AS DOUBLE) / {_dlit(float(2**31))}").alias(
                "decayed_score"
            ),
            F.sum("cnt").cast("long").alias("n_window"),
        )
    )


def mann_kendall(points: DataFrame, bucket_ms: int) -> DataFrame:
    """Mann-Kendall nonparametric trend test per series: S = sum over
    bucket pairs i<j of sign(x_j - x_i), tie-corrected variance, and
    the standardized Z. The "is it trending" verdict that OLS slope
    (trend_ols) gets wrong under outliers and Theil-Sen only answers
    with a magnitude — M-K gives the significance.

    Exactness: S, n, and the tie term sum_t t(t-1)(2t+5) are exact
    int64; Z is ONE shared IEEE tree over them:
        var = (n(n-1)(2n+5) - T) / 18
        Z   = (S -+ 1) / sqrt(var)   (continuity-corrected, 0 at S=0)

    Scale notes: the pair join is quadratic in BUCKETS per series —
    bounded by the time span / bucket width (e.g. 720 pairs at 30 daily
    buckets), independent of raw corpus size; it shuffles once on sid
    (the storage partitioning). Tie and count terms are map-side
    combinable groupBys on the same bucketed table."""
    b = points.groupBy(
        "sid", F.expr(f"(ts_ms DIV {bucket_ms}) * {bucket_ms}").alias("b")
    ).agg(F.sum("v").cast("long").alias("x"))
    pairs = (
        b.alias("l")
        .join(b.alias("r"), ["sid"])
        .where(F.expr("l.b < r.b"))
        .groupBy("sid")
        .agg(F.sum(F.signum(F.expr("r.x - l.x"))).cast("long").alias("s"))
    )
    ties = (
        b.groupBy("sid", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("sid")
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).cast("long").alias("tt"),
            # n = sum of tie-group sizes (= bucket count), NOT the number
            # of tie groups — a seeded scalar-differential fuzz caught the
            # count(*) version, which the mirrored oracle couldn't.
            F.sum("t").cast("long").alias("n_buckets"),
        )
    )
    return pairs.join(ties, "sid").selectExpr(
        "sid",
        "n_buckets",
        "s",
        "CASE WHEN n_buckets >= 2 AND "
        "     CAST(n_buckets * (n_buckets - 1) * (2 * n_buckets + 5) - tt"
        "          AS DOUBLE) / CAST(18 AS DOUBLE) > 0 THEN "
        "  CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) ELSE "
        "       CASE WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) "
        "            ELSE CAST(0 AS DOUBLE) END END "
        "  / sqrt(CAST(n_buckets * (n_buckets - 1) * (2 * n_buckets + 5) - tt"
        "              AS DOUBLE) / CAST(18 AS DOUBLE)) "
        "END AS z",
    )


def slo_burn(
    events: DataFrame,
    slo: float = 0.99,
    short_buckets: int = 1,
    long_buckets: int = 6,
    bucket_ms: int = 3_600_000,
    short_threshold: float = 14.4,
    long_threshold: float = 6.0,
    error_type: str = "error",
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the SRE-workbook pager
    rule): per bucket, error share over the trailing short and long
    windows divided by the error budget (1 - slo); page when BOTH
    windows burn above their thresholds (fast-burn confirmation +
    slow-burn persistence, immune to single-bucket blips).

    Exactness: error/total counts are exact int64 range-window sums on
    the integer bucket index; each burn rate is one shared division by
    the _dlit budget literal; threshold comparisons are on those exact
    doubles. Scale notes: one groupBy to |buckets| rows, then two
    integer-frame range windows over that tiny table."""
    budget = 1.0 - slo
    hb = events.groupBy(
        F.expr(f"unix_millis(CAST(ts AS TIMESTAMP)) DIV {bucket_ms}").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("tot"),
        F.sum(F.expr(f"CASE WHEN event_type = '{error_type}' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("err"),
    )
    ws = Window.orderBy("h").rangeBetween(-(short_buckets - 1), 0)
    wl = Window.orderBy("h").rangeBetween(-(long_buckets - 1), 0)
    agg = hb.select(
        "h",
        F.sum("err").over(ws).cast("long").alias("err_s"),
        F.sum("tot").over(ws).cast("long").alias("tot_s"),
        F.sum("err").over(wl).cast("long").alias("err_l"),
        F.sum("tot").over(wl).cast("long").alias("tot_l"),
    )
    return agg.selectExpr(
        f"h * {bucket_ms} AS bucket_ts",
        "err_s",
        "tot_s",
        "err_l",
        "tot_l",
        f"CAST(err_s AS DOUBLE) / CAST(tot_s AS DOUBLE) / {_dlit(budget)}"
        " AS burn_short",
        f"CAST(err_l AS DOUBLE) / CAST(tot_l AS DOUBLE) / {_dlit(budget)}"
        " AS burn_long",
        f"CAST(err_s AS DOUBLE) / CAST(tot_s AS DOUBLE) / {_dlit(budget)}"
        f" > {_dlit(short_threshold)} AND "
        f"CAST(err_l AS DOUBLE) / CAST(tot_l AS DOUBLE) / {_dlit(budget)}"
        f" > {_dlit(long_threshold)} AS page",
    )


# Durbin-Levinson closed forms for PACF lags 2 and 3 over the pivoted
# ACF columns r1/r2/r3: ONE textual expression tree evaluated verbatim
# by Spark and DuckDB (the shared-tree contract; r_k themselves come
# from acf_lags' already-gated exact-moment algebra). a21 is the
# order-2 AR coefficient phi_{2,1} = phi_{1,1} - phi_{22}*phi_{1,1}.
_PACF_P2 = "((r2 - r1 * r1) / (CAST(1 AS DOUBLE) - r1 * r1))"
_PACF_A21 = f"(r1 - {_PACF_P2} * r1)"
_PACF_P3 = (
    f"((r3 - {_PACF_A21} * r2 - {_PACF_P2} * r1) / "
    f"(CAST(1 AS DOUBLE) - {_PACF_A21} * r1 - {_PACF_P2} * r2))"
)


def pacf3(points: DataFrame, si_ms: int) -> DataFrame:
    """Partial autocorrelation at lags 1..3 per series — the AR-order
    diagnostic ACF can't give (ACF of an AR(1) decays forever; its PACF
    cuts off after lag 1). phi1 = r1; phi2 and phi3 by the
    Durbin-Levinson recursion unrolled into a fixed expression tree.

    Exactness: r1..r3 are acf_lags' shared-tree values (exact int64
    moments, one IEEE closing tree); the DL recursion is the SAME text
    in both engines, so every intermediate rounds identically. Series
    missing any of the three lags (too short / gap-broken) return NULL
    for the affected orders.

    Scale notes: inherits acf_lags' shape (equi-join on the (sid, ts)
    co-partitioning key, 3 probe rows per point, map-side-combinable
    moments); the pivot is a |series| x 3 groupBy."""
    a = acf_lags(points, 3, si_ms)
    piv = a.groupBy("sid").agg(
        F.expr("max(CASE WHEN lag = 1 THEN acf END)").alias("r1"),
        F.expr("max(CASE WHEN lag = 2 THEN acf END)").alias("r2"),
        F.expr("max(CASE WHEN lag = 3 THEN acf END)").alias("r3"),
        F.expr("max(CASE WHEN lag = 1 THEN n_pairs END)").alias("n_pairs_1"),
    )
    return piv.selectExpr(
        "sid",
        "n_pairs_1",
        "r1 AS phi1",
        f"CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN {_PACF_P2} END"
        " AS phi2",
        "CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL AND r3 IS NOT NULL "
        f"THEN {_PACF_P3} END AS phi3",
    )


def temporal_entropy(points: DataFrame, bucket_ms: int = 3_600_000,
                     n_phases: int = 24) -> DataFrame:
    """Shannon entropy (bits) of each series' activity distribution
    across the `n_phases` phases of the daily cycle — the one-number
    answer to "is this usage round-the-clock or spiky at one hour?"
    (0 bits = all mass in one hour; log2 24 ~ 4.58 = uniform). The
    scheduling complement of dispersion_index (which scores burstiness
    in TIME; this scores concentration in PHASE).

    H = log2(N) - (sum_i c_i * log2 c_i) / N over exact int64 phase
    counts c_i (empty phases contribute 0 by the 0*log 0 = 0 limit and
    are naturally absent). Every log2 comes from the shared
    log2_int_stages IEEE tree (no engine transcendental); the <=
    n_phases term sum folds phase-ascending so both engines add in ONE
    order.

    Scale notes: one map-side-combinable groupBy to |series| x n_phases
    cells, staged column math per cell, one |series|-sized fold."""
    from modelardb_dynamic_spark.operators.textstats import log2_int_stages

    ph = points.groupBy(
        "sid",
        F.expr(f"(ts_ms DIV {bucket_ms}) % {n_phases}").alias("hb"),
    ).agg(F.sum("v").cast("long").alias("c"))
    for name, expr in log2_int_stages("c", "l2c"):
        ph = ph.selectExpr("*", f"{expr} AS {name}")
    folded = (
        ph.selectExpr("sid", "hb", "CAST(c AS DOUBLE) * l2c AS term", "c")
        .groupBy("sid")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(hb, term))), "
                "CAST(0 AS DOUBLE), (a, x) -> a + x.term)"
            ).alias("tsum"),
            F.sum("c").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_phases_used"),
        )
    )
    for name, expr in log2_int_stages("n", "l2n"):
        folded = folded.selectExpr("*", f"{expr} AS {name}")
    return folded.selectExpr(
        "sid",
        "n",
        "n_phases_used",
        "l2n - tsum / CAST(n AS DOUBLE) AS h_bits",
    )


def concurrency_occupancy(
    sessions: DataFrame,
    start_col: str = "start_ms",
    end_col: str = "end_ms",
) -> DataFrame:
    """Occupancy histogram of the concurrency gauge: for each level c,
    the total milliseconds the system spent with exactly c sessions
    active — the duration-weighted complement of peak_concurrency (a
    peak says how bad the worst instant was; occupancy says how LONG it
    was that bad, which is what capacity planning actually bills).

    Sweep-line: net deltas per distinct boundary instant, running sum,
    each level holds for [t, next_t) (the final boundary closes the last
    interval at level 0 and emits nothing). All integer; share is one
    shared division by the total span.

    Scale notes: same shape as peak_concurrency — the running-sum window
    carries one row per distinct boundary instant (span-bounded); the
    occupancy groupBy is map-side-combinable onto |levels| rows."""
    ends = sessions.select((F.col(end_col) + 1).alias("t"), F.lit(-1).alias("d"))
    starts = sessions.select(F.col(start_col).alias("t"), F.lit(1).alias("d"))
    net = starts.unionByName(ends).groupBy("t").agg(F.sum("d").alias("d"))
    w = Window.orderBy("t")
    run = net.select(
        "t",
        F.sum("d").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("c"),
        F.lead("t").over(w).alias("t_next"),
    ).where(F.col("t_next").isNotNull())
    occ = run.groupBy(F.col("c").cast("long").alias("level")).agg(
        F.sum(F.col("t_next") - F.col("t")).cast("long").alias("ms")
    )
    total = occ.agg(F.sum("ms").cast("long").alias("total_ms"))
    return (
        occ.crossJoin(F.broadcast(total))
        .selectExpr(
            "level",
            "ms",
            "CAST(ms AS DOUBLE) / CAST(total_ms AS DOUBLE) AS share",
        )
    )


def seasonal_strength(
    points: DataFrame, bucket_ms: int = 3_600_000, n_phases: int = 24
) -> DataFrame:
    """One-way-ANOVA seasonality strength per series: eta^2 = the share
    of bucket-count variance explained by the daily phase (hour-of-day)
    — 0 = the hour tells you nothing, 1 = the hour determines the load.
    The effect-SIZE companion to acf/pacf (which detect periodicity but
    don't say how much it explains) and temporal_entropy (which scores
    the marginal, not the variance split).

    eta^2 = SS_between / SS_total with
        SS_between = sum_p S_p^2/n_p - S^2/n
        SS_total   = Q - S^2/n
    over exact int64 phase sums (S_p, n_p) and totals (S, n, Q = sum
    v^2). The <= n_phases S_p^2/n_p terms fold phase-ascending, and
    S^2/n, the subtraction, and the final division are one shared tree
    — deterministic in both engines. NULL when SS_total = 0 (constant
    series).

    Scale notes: two map-side-combinable groupBys (|series| x n_phases,
    then |series|) + one bounded fold; no windows, no joins."""
    b = points.groupBy(
        "sid",
        F.expr(f"ts_ms DIV {bucket_ms}").alias("hb"),
    ).agg(F.sum("v").cast("long").alias("x"))
    ph = b.groupBy(
        "sid", F.expr(f"hb % {n_phases}").alias("p")
    ).agg(
        F.sum("x").cast("long").alias("sp"),
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("qp"),
    )
    return (
        ph.groupBy("sid")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(p, "
                "CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(np AS DOUBLE)"
                " AS t))), CAST(0 AS DOUBLE), (a, x) -> a + x.t)"
            ).alias("between_raw"),
            F.sum("sp").cast("long").alias("s"),
            F.sum("np").cast("long").alias("n"),
            F.sum("qp").cast("long").alias("q"),
            F.count(F.lit(1)).cast("long").alias("n_phases_used"),
        )
        .selectExpr(
            "sid",
            "n",
            "n_phases_used",
            "CASE WHEN CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
            " / CAST(n AS DOUBLE) > 0 THEN "
            "(between_raw - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
            " / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
            " / CAST(n AS DOUBLE)) END AS eta2",
        )
    )


def independence_chi2(
    df: DataFrame, row_expr: str, col_expr: str
) -> DataFrame:
    """Chi-square test of independence between two categorical
    factorings of the same events (e.g. event_type x hour-of-day) plus
    Cramer's V effect size — "does WHAT happens depend on WHEN" as one
    auditable number, the contingency-table generalization of
    benford_audit's one-dimensional fit.

    chi2 = sum over the FULL R x C frame (absent cells count O = 0) of
    (O - E)^2 / E with E = r_tot * c_tot / n; the cell terms fold in
    (row, col)-ascending order so the float sum has ONE evaluation
    order; V = sqrt(chi2 / (n * min(R-1, C-1))) is a shared tree on the
    folded value (sqrt is correctly rounded). All counts exact int64.

    Scale notes: one map-side-combinable groupBy to R x C cells, two
    marginal re-aggregations, a broadcast R x C frame, one bounded
    fold to a single row."""
    cells = df.selectExpr(
        f"({row_expr}) AS r", f"({col_expr}) AS c"
    ).groupBy("r", "c").agg(F.count(F.lit(1)).cast("long").alias("o"))
    rt = cells.groupBy("r").agg(F.sum("o").cast("long").alias("r_tot"))
    ct = cells.groupBy("c").agg(F.sum("o").cast("long").alias("c_tot"))
    frame = rt.crossJoin(F.broadcast(ct))
    full = frame.join(cells, ["r", "c"], "left").fillna(0, ["o"])
    n = df.count()
    term = (
        f"(CAST(o AS DOUBLE) - CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE)"
        f" / CAST({n} AS DOUBLE))"
    )
    e = (
        f"(CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE)"
        f" / CAST({n} AS DOUBLE))"
    )
    return (
        full.selectExpr("r", "c", f"{term} * {term} / {e} AS t")
        .groupBy()
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(r, c, t))), "
                "CAST(0 AS DOUBLE), (a, x) -> a + x.t)"
            ).alias("chi2"),
            F.countDistinct("r").cast("long").alias("n_rows"),
            F.countDistinct("c").cast("long").alias("n_cols"),
        )
        .selectExpr(
            f"CAST({n} AS BIGINT) AS n",
            "n_rows",
            "n_cols",
            "chi2",
            "(n_rows - 1) * (n_cols - 1) AS dof",
            "CASE WHEN least(n_rows, n_cols) >= 2 THEN "
            f"sqrt(chi2 / (CAST({n} AS DOUBLE) * "
            "CAST(least(n_rows - 1, n_cols - 1) AS DOUBLE))) END AS cramers_v",
        )
    )


def rate_shift_z(
    events: DataFrame,
    split_ms: int,
    flag_expr: str = "event_type = 'error'",
    key_col: str = "event_type",
) -> DataFrame:
    """Two-proportion z-test for a rate shift at a split point: per key,
    did the flagged-event share change significantly between the before
    and after windows? z = (p2 - p1) / sqrt(p*(1-p)*(1/n1 + 1/n2)) with
    the pooled p — the significance layer on top of slo_burn's
    thresholds (a burn says the rate is high; z says the CHANGE is not
    noise).

    key_col partitions the events; flag_expr is a boolean over any
    columns (e.g. key = event_type, flag = value > x), so each key's
    own flag share is tested across the split. All counts exact int64; p1/p2/pooled p and z are ONE shared tree (+ - *
    / sqrt, correctly rounded); NULL when either window is empty or the
    pooled variance is 0.

    Scale notes: one map-side-combinable groupBy to |keys| x 2 cells,
    then per-key column algebra — no windows, no joins."""
    g = events.selectExpr(
        f"{key_col} AS k",
        f"CASE WHEN ts_ms < {split_ms} THEN 0 ELSE 1 END AS w",
        f"CASE WHEN {flag_expr} THEN 1 ELSE 0 END AS f",
    ).groupBy("k").agg(
        F.sum(F.expr("CASE WHEN w = 0 THEN 1 ELSE 0 END")).cast("long").alias("n1"),
        F.sum(F.expr("CASE WHEN w = 0 THEN f ELSE 0 END")).cast("long").alias("x1"),
        F.sum(F.expr("CASE WHEN w = 1 THEN 1 ELSE 0 END")).cast("long").alias("n2"),
        F.sum(F.expr("CASE WHEN w = 1 THEN f ELSE 0 END")).cast("long").alias("x2"),
    )
    pooled = (
        "(CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    )
    var = (
        f"({pooled} * (CAST(1 AS DOUBLE) - {pooled})"
        " * (CAST(1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " + CAST(1 AS DOUBLE) / CAST(n2 AS DOUBLE)))"
    )
    return g.selectExpr(
        "k",
        "n1",
        "x1",
        "n2",
        "x2",
        "CASE WHEN n1 > 0 THEN CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS p1",
        "CASE WHEN n2 > 0 THEN CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) END AS p2",
        f"CASE WHEN n1 > 0 AND n2 > 0 AND {var} > 0 THEN "
        "(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)"
        " - CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
        f" / sqrt({var}) END AS z",
    )


def hill_tail(
    df: DataFrame,
    key_col: str,
    value_expr: str,
    order_col: str,
    k: int = 100,
) -> DataFrame:
    """Hill estimator of the heavy-tail index per key: over the k
    largest values, H = mean(ln X_(i)) - ln X_(k+1), alpha = 1/H — the
    "how heavy is the tail" number behind every capacity rule of thumb
    (alpha < 2: variance is infinite, percentile SLOs are the only
    honest summary; this operator tells you WHICH regime each key's
    value distribution is in).

    Exactness: values are exact positive int64 (value_expr); the top
    k+1 per key are ranked deterministically (value DESC, order_col
    ASC); every ln comes from the shared log2_int_stages tree times the
    ln2 literal; the k log terms fold rank-ascending. NULL when a key
    has fewer than k+1 positive values.

    Scale notes: one window rank per key pruned to k+1 rows
    immediately (rank <= k+1 filter pushes into the window's sort),
    then a bounded fold — no full sort survives the plan."""
    from modelardb_dynamic_spark.operators.textstats import log2_int_stages
    import math as _m

    w = Window.partitionBy("k_").orderBy(
        F.desc("v_"), F.asc("o_")
    )
    ranked = (
        df.selectExpr(
            f"{key_col} AS k_",
            f"CAST({value_expr} AS BIGINT) AS v_",
            f"{order_col} AS o_",
        )
        .where(F.col("v_") > 0)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k + 1)
    )
    for name, expr in log2_int_stages("v_", "l2v"):
        ranked = ranked.selectExpr("*", f"{expr} AS {name}")
    ln2 = _dlit(_m.log(2.0))
    return (
        ranked.groupBy("k_")
        .agg(
            F.expr(
                f"aggregate(array_sort(collect_list(CASE WHEN rnk <= {k} "
                "THEN struct(rnk, l2v) END)), CAST(0 AS DOUBLE), "
                "(a, x) -> a + x.l2v)"
            ).alias("l2sum"),
            F.expr(
                f"max(CASE WHEN rnk = {k + 1} THEN l2v END)"
            ).alias("l2_tail"),
            F.count(F.lit(1)).cast("long").alias("n_ranked"),
        )
        .selectExpr(
            "k_ AS " + key_col,
            "n_ranked",
            f"CASE WHEN n_ranked >= {k + 1} THEN "
            f"(l2sum / CAST({k} AS DOUBLE) - l2_tail) * {ln2} END AS hill_h",
            f"CASE WHEN n_ranked >= {k + 1} AND "
            f"(l2sum / CAST({k} AS DOUBLE) - l2_tail) * {ln2} > 0 THEN "
            f"CAST(1 AS DOUBLE) / ((l2sum / CAST({k} AS DOUBLE) - l2_tail)"
            f" * {ln2}) END AS alpha",
        )
    )


def ljung_box(points: DataFrame, max_lag: int = 4, si_ms: int = 3_600_000) -> DataFrame:
    """Ljung-Box portmanteau whiteness test per series: is there ANY
    autocorrelation in the first max_lag lags, as one audited number —
    the sanity gate in front of acf/pacf model-order reading (if Q
    cannot reject white noise, a fitted AR order is noise-chasing).

        Q = n (n + 2) * sum_{k=1..max_lag} r_k^2 / (n - k)

    r_k comes from acf_lags (sparse-ACF convention, exact int64
    moments, the shared _ACF_EXPR tree — already value-gated by the
    acf_turnrate oracle), n is the series' observed bucket count. The
    max_lag squared-correlation terms fold lag-ascending and the
    n(n+2) closing product is one shared tree, so Q is bit-identical
    in both engines. reject_white compares Q against the chi-square
    0.95 critical literal for max_lag dof (exact-double compare).
    Series missing any of the max_lag lags (too short / too sparse for
    a pair at some k) are excluded — the statistic is undefined there.

    Scale notes: acf_lags' bounded lag joins + two map-side-combinable
    groupBys; the fold is over max_lag elements per series.
    """
    # chi-square 0.95 critical values per dof (scipy.stats.chi2.ppf)
    crit = {
        1: 3.841458820694124,
        2: 5.991464547107979,
        3: 7.814727903251179,
        4: 9.487729036781154,
        5: 11.070497693516351,
        6: 12.591587243743977,
    }[max_lag]
    pts = _materialize(points)
    acf = acf_lags(pts, max_lag=max_lag, si_ms=si_ms, materialize=False)
    base = pts.groupBy("sid").agg(F.count(F.lit(1)).cast("long").alias("n"))
    terms = acf.join(base, "sid").selectExpr(
        "sid",
        "n",
        "lag",
        "(acf * acf) / CAST(n - lag AS DOUBLE) AS t",
    )
    return (
        terms.groupBy("sid")
        .agg(
            F.first("n").alias("n"),
            F.count(F.lit(1)).cast("long").alias("m_got"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(lag, t))), "
                "CAST(0 AS DOUBLE), (a, x) -> a + x.t)"
            ).alias("acc"),
        )
        .where(F.col("m_got") == max_lag)
        .selectExpr(
            "sid",
            "n",
            "CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * acc AS q_lb",
            f"CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * acc"
            f" > {_dlit(crit)} AS reject_white",
        )
    )


def _twiddle_case(col: str, n_phases: int, fn) -> str:
    """CASE expression mapping an integer phase column to the literal
    twiddle double fn(2*pi*p/n_phases) — the SAME text is rendered into
    the Spark expression and the DuckDB oracle, so both engines parse
    identical correctly-rounded literals instead of calling their own
    libm (whose cos/sin may differ by an ulp)."""
    import math as _m

    arms = " ".join(
        f"WHEN {p} THEN {_dlit(fn(2.0 * _m.pi * p / n_phases))}"
        for p in range(n_phases)
    )
    return f"(CASE {col} {arms} END)"


def spectral_daily(
    points: DataFrame, bucket_ms: int = 3_600_000, n_phases: int = 24
) -> DataFrame:
    """First-harmonic DFT of the daily cycle per series: the amplitude
    AND phase of the 24-hour fundamental — the directional complement
    of seasonal_strength (eta^2 says how much the hour explains;
    this says the shape: one daily peak, where, how big).

        X_1 = sum_p S_p e^(-2*pi*i*p/24)  over hour-of-day phase sums

    S_p are exact int64 phase sums over observed buckets (absent
    phases contribute no term — the engine's gap semantics). The
    twiddles are 24 shared correctly-rounded literals (_twiddle_case),
    the real/imaginary folds run phase-ascending, and amp/rel_amp
    close in one shared sqrt/divide tree — bit-identical cross-engine.
    peak_phase is the exact integer argmax phase (smallest phase wins
    ties), computed by integer max + min, no floats.

    Returns (sid, n, n_phases_used, a1, b1, amp, rel_amp, peak_phase);
    rel_amp = amp / total mass, NULL on zero-mass series.

    Scale notes: two map-side-combinable groupBys to |series| x 24,
    then bounded folds and a broadcast-sized self-join for the argmax.
    """
    cos_case = _twiddle_case("p", n_phases, __import__("math").cos)
    sin_case = _twiddle_case("p", n_phases, __import__("math").sin)
    b = points.groupBy(
        "sid", F.expr(f"ts_ms DIV {bucket_ms}").alias("hb")
    ).agg(F.sum("v").cast("long").alias("x"))
    ph = b.groupBy("sid", F.expr(f"hb % {n_phases}").alias("p")).agg(
        F.sum("x").cast("long").alias("sp"),
        F.count(F.lit(1)).cast("long").alias("np"),
    )
    ph = _materialize(ph)
    mx = ph.groupBy("sid").agg(F.max("sp").alias("mx"))
    peak = (
        ph.join(mx, "sid")
        .where(F.col("sp") == F.col("mx"))
        .groupBy("sid")
        .agg(F.min("p").cast("long").alias("peak_phase"))
    )
    agg = ph.groupBy("sid").agg(
        F.sum("np").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_phases_used"),
        F.sum("sp").cast("long").alias("s"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(p, "
            f"CAST(sp AS DOUBLE) * {cos_case} AS t))), "
            "CAST(0 AS DOUBLE), (a, x) -> a + x.t)"
        ).alias("a1"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(p, "
            f"CAST(sp AS DOUBLE) * {sin_case} AS t))), "
            "CAST(0 AS DOUBLE), (a, x) -> a + x.t)"
        ).alias("nb1"),
    )
    return agg.join(peak, "sid").selectExpr(
        "sid",
        "n",
        "n_phases_used",
        "a1",
        "-nb1 AS b1",
        "sqrt(a1 * a1 + nb1 * nb1) AS amp",
        "CASE WHEN s != 0 THEN sqrt(a1 * a1 + nb1 * nb1)"
        " / CAST(s AS DOUBLE) END AS rel_amp",
        "peak_phase",
    )


_LEAGUE_WINNER = (
    "CASE WHEN sse_hw < CASE WHEN sse_holt < sse_ewma THEN sse_holt"
    " ELSE sse_ewma END THEN 'hw'"
    " WHEN sse_holt < sse_ewma THEN 'holt' ELSE 'ewma' END"
)
_LEAGUE_BEST = (
    "CASE WHEN sse_hw < CASE WHEN sse_holt < sse_ewma THEN sse_holt"
    " ELSE sse_ewma END THEN sse_hw"
    " WHEN sse_holt < sse_ewma THEN sse_holt ELSE sse_ewma END"
)


def forecast_league(
    points: DataFrame,
    bucket_ms: int,
    period_buckets: int = 24,
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Which forecaster earns each series: the EWMA / Holt /
    Holt-Winters one-step backtests raced per sid on squared forecast
    error — the model-selection layer on top of the smoother family
    (a flat series should NOT pay for a trend term; a diurnal one
    should). The operator that answers "which model do we materialize
    for this series' continuous aggregate".

    SSE per model folds abs_err^2 bucket-ascending over the scored
    buckets (first bucket has no forecast and is skipped identically
    everywhere); the winner is a fixed-precedence nested CASE on the
    exact doubles (ties prefer the simpler model: ewma, then holt,
    then hw) — every double in the verdict replayed bit-identically
    by the oracle because the three backtests are themselves
    value-gated folds.

    Returns (sid, n_scored, sse_ewma, sse_holt, sse_hw, winner,
    best_sse). Scale: three window+groupBy passes over bucket rows
    (each |series| x |buckets|-sized), then |series|-sized joins.
    """
    pts = _materialize(points)

    def _sse(df: DataFrame, name: str) -> DataFrame:
        return (
            df.where(F.col("abs_err").isNotNull())
            .groupBy("sid")
            .agg(
                F.count(F.lit(1)).cast("long").alias(f"n_scored_{name}"),
                F.expr(
                    "aggregate(array_sort(collect_list(struct(bucket_ts, "
                    "abs_err * abs_err AS t))), CAST(0 AS DOUBLE), "
                    "(a, x) -> a + x.t)"
                ).alias(f"sse_{name}"),
            )
        )

    se = _sse(ewma_levels(pts, bucket_ms, alpha=alpha), "ewma")
    sh = _sse(holt_levels(pts, bucket_ms, alpha=alpha, beta=beta), "holt")
    sw = _sse(
        holt_winters_levels(
            pts, bucket_ms, period_buckets=period_buckets,
            alpha=alpha, beta=beta,
        ),
        "hw",
    )
    return (
        se.join(sh, "sid")
        .join(sw, "sid")
        .selectExpr(
            "sid",
            "n_scored_ewma AS n_scored",
            "sse_ewma",
            "sse_holt",
            "sse_hw",
            f"{_LEAGUE_WINNER} AS winner",
            f"{_LEAGUE_BEST} AS best_sse",
        )
    )


def ohlc_bars(points: DataFrame, bucket_ms: int) -> DataFrame:
    """Candlestick (OHLC) bars per (sid, bucket): open/close = the
    values at the bucket's first/last timestamps, plus min/max/count/
    sum — the render-ready reduction a live dashboard draws, and the
    batch contract streaming/ohlc.stream_ohlc must equal at the
    frontier. The engine grid makes ts_ms unique per sid, so
    open/close are deterministic without tie rules; every column is
    exact int64 (no floats anywhere).

    Scale: ONE map-side-combinable groupBy on (sid, bucket) — min_by/
    max_by carry (ts, v) through the partial aggregation, so this is
    the same shuffle shape as the tier build, never a window.
    """
    return points.groupBy(
        "sid", F.expr(f"(ts_ms DIV {bucket_ms}) * {bucket_ms}").alias("bucket_ts")
    ).agg(
        F.min("ts_ms").alias("ts_first"),
        F.max("ts_ms").alias("ts_last"),
        F.expr("min_by(v, ts_ms)").cast("long").alias("v_open"),
        F.expr("max_by(v, ts_ms)").cast("long").alias("v_close"),
        F.min("v").cast("long").alias("v_min"),
        F.max("v").cast("long").alias("v_max"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("vsum"),
    )


def anomaly_consensus(
    points: DataFrame,
    window_buckets: int = 24,
    min_periods: int = 12,
    zk: int = 3,
    mad_k: float = 5.0,
    h_mult: int = 2,
) -> DataFrame:
    """Anomaly-detector ensemble verdict per series: the alert-fatigue
    layer. rolling_zscore (trailing-window spikes), mad_outliers
    (corpus-median spikes the spike itself cannot corrupt) and
    cusum_changepoints (sustained level shifts) each answer a different
    question; paging on any single one over-fires. This operator counts
    each detector's firings per series and issues one verdict:
    'alert' when >= 2 independent detectors fired, 'watch' on exactly
    one, 'ok' on none.

    Every input to the verdict is an exact integer (the z and MAD flags
    are integer predicates; CUSUM is integer end-to-end), so the
    composition is value-gatable with no new float algebra — the CASE
    on counts is the only logic this layer adds.

    Returns (sid, n_buckets, n_z, n_mad, n_shifts, n_detectors,
    verdict). Scale: the three detectors' own shapes (bounded windows,
    rank selections, one sid window) + |series|-sized joins.
    """
    pts = _materialize(points)
    z = (
        rolling_zscore(pts, window_buckets, min_periods, zk)
        .groupBy("sid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum(F.col("is_anomaly").cast("long")).cast("long").alias("n_z"),
        )
    )
    m = (
        mad_outliers(pts, mad_k)
        .groupBy("sid")
        .agg(
            F.sum(F.col("is_outlier").cast("long")).cast("long").alias("n_mad")
        )
    )
    c = cusum_changepoints(pts, h_mult).selectExpr(
        "sid", "n_up_shifts + n_dn_shifts AS n_shifts"
    )
    return (
        z.join(m, "sid")
        .join(c, "sid")
        .selectExpr(
            "sid",
            "n_buckets",
            "n_z",
            "n_mad",
            "n_shifts",
            "CAST(n_z > 0 AS BIGINT) + CAST(n_mad > 0 AS BIGINT)"
            " + CAST(n_shifts > 0 AS BIGINT) AS n_detectors",
            "CASE WHEN CAST(n_z > 0 AS BIGINT) + CAST(n_mad > 0 AS BIGINT)"
            " + CAST(n_shifts > 0 AS BIGINT) >= 2 THEN 'alert'"
            " WHEN CAST(n_z > 0 AS BIGINT) + CAST(n_mad > 0 AS BIGINT)"
            " + CAST(n_shifts > 0 AS BIGINT) = 1 THEN 'watch'"
            " ELSE 'ok' END AS verdict",
        )
    )


def binseg_split(points: DataFrame, min_seg: int = 2) -> DataFrame:
    """Single-changepoint LOCALIZATION per series (binary segmentation,
    first step of PELT-style pipelines): the split instant that
    maximizes the between-segment variance reduction — the WHERE to
    cusum_changepoints' WHETHER. Emits the best split, the exact
    integer moments of both sides, and the share of total variance the
    split explains (r2_split, the effect size).

    cost(t) = n * (S_l*n - S*n_l)^2 / (n_l * n_r) maximized over
    prefix positions with min_seg points on each side; S_l/n_l are
    exact int64 prefix sums off ONE ordered window pass. The argmax is
    taken on the cost DOUBLE via a deterministic (cost DESC, ts ASC)
    rank — both engines compute the identical IEEE double from the
    identical exact integers, so the winner (and every emitted column)
    is value-gatable. int64 budget: |S_l*n - S*n_l| <= n^2*vmax, the
    cusum_changepoints bound (documented there).

    Returns (sid, n, split_ts, n_left, mean_left, mean_right,
    r2_split) for series with >= 2*min_seg points and nonzero total
    variance; mean/r2 close in shared division trees.

    Scale: one sid-ordered window pass + one rank — no joins, no
    quadratic term (the classic O(n) scan per series, distributed by
    the engine's universal sid partitioning).
    """
    order = Window.partitionBy("sid").orderBy("ts_ms")
    run = order.rowsBetween(Window.unboundedPreceding, 0)
    per = Window.partitionBy("sid")
    p = points.select(
        "sid", "ts_ms", F.col("v").cast("long").alias("v")
    ).select(
        "sid",
        "ts_ms",
        F.count("v").over(per).alias("n"),
        F.sum("v").over(per).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(per).alias("q"),
        F.sum("v").over(run).alias("sl"),
        F.count("v").over(run).alias("nl"),
    )
    p = p.where(
        (F.col("nl") >= min_seg) & (F.col("n") - F.col("nl") >= min_seg)
    ).selectExpr(
        "sid",
        "ts_ms",
        "n",
        "s",
        "q",
        "sl",
        "nl",
        "(CAST(sl * n - s * nl AS DOUBLE) * CAST(sl * n - s * nl AS DOUBLE))"
        " / CAST(nl * (n - nl) AS DOUBLE) AS cost",
    )
    r = Window.partitionBy("sid").orderBy(F.desc("cost"), F.asc("ts_ms"))
    best = p.withColumn("rk", F.row_number().over(r)).where("rk = 1")
    return best.where(F.expr("q * n != s * s")).selectExpr(
        "sid",
        "n",
        "ts_ms AS split_ts",
        "nl AS n_left",
        "CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS mean_left",
        "CAST(s - sl AS DOUBLE) / CAST(n - nl AS DOUBLE) AS mean_right",
        "(cost / CAST(n AS DOUBLE))"
        " / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
        " / CAST(n AS DOUBLE)) AS r2_split",
    )


def percentile_bands(
    points: DataFrame, coarse_ms: int = 86_400_000
) -> DataFrame:
    """Per-series daily percentile envelope — the "normal range" band a
    dashboard shades behind the live line: exact-ceil P10/P50/P90 of
    the bucket values inside each coarse bucket (day), through the
    shared distributed-selection core (value-count table + integer
    ceil-index picks — never a per-key sort of raw rows; the
    reply_latency / order_percentiles discipline).

    points: (sid, ts_ms, v long). Returns (sid, day_ts, n, gap_sum_ms,
    avg_gap_ms, min_ms, p10_ms, p50_ms, p90_ms, max_ms) — column names
    come from the selection core (gap_* is its value naming); all
    integers exact, the mean one shared division.

    Scale: one groupBy to the value-count table per (sid, day) + one
    bounded rank window — the selection core's 10^12-row shape.
    """
    from modelardb_dynamic_spark.operators.textstats import (
        gap_percentiles,
    )

    g = points.select(
        "sid",
        F.expr(f"(ts_ms DIV {coarse_ms}) * {coarse_ms}").alias("day_ts"),
        F.col("v").cast("long").alias("gap_ms"),
    )
    return gap_percentiles(
        g,
        ["sid", "day_ts"],
        picks=(("p10_ms", 1, 10), ("p50_ms", 1, 2), ("p90_ms", 9, 10)),
    )


def locf_fill(
    points: DataFrame, si_ms: int, chunk_buckets: int = 8192
) -> DataFrame:
    """Last-observation-carried-forward gap fill per series — the
    gauge-semantics fill (a thermostat reading holds until the next
    one) beside gap_fill's count-semantics zeros and interpolate_grid's
    linear blend. Emits EVERY grid bucket in [first, last] per series
    with the carried value, a filled flag, and the staleness (buckets
    since the last real observation — the "how stale is this gauge"
    column an SLO on data freshness reads).

    All integer algebra: the grid is exact (two-level chunked explode,
    the gap_fill discipline — no single giant sequence() row at
    decade x minute scale), the carry is last(ignorenulls) over one
    sid-ordered window, staleness an exact integer division.

    Returns (sid, ts_ms, v long, filled boolean, staleness long).

    Scale: one |series|-sized span aggregate, the bounded explode, one
    left join on the engine's (sid, ts) co-partitioning, one window.
    """
    spans = points.groupBy("sid").agg(
        F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi")
    )
    span_ms = int(si_ms) * int(chunk_buckets)
    chunks = spans.select(
        "sid",
        "hi",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(span_ms))
        ).alias("cstart"),
    )
    grid = chunks.select(
        "sid",
        F.explode(
            F.sequence(
                F.col("cstart"),
                F.least(
                    F.col("cstart") + (span_ms - int(si_ms)), F.col("hi")
                ),
                F.lit(int(si_ms)),
            )
        ).alias("ts_ms"),
    )
    j = grid.join(
        points.select("sid", "ts_ms", F.col("v").cast("long").alias("v_obs")),
        ["sid", "ts_ms"],
        "left",
    )
    w = (
        Window.partitionBy("sid")
        .orderBy("ts_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "sid",
        "ts_ms",
        F.last("v_obs", ignorenulls=True).over(w).alias("v"),
        F.col("v_obs").isNull().alias("filled"),
        (
            (
                F.col("ts_ms")
                - F.last(
                    F.when(F.col("v_obs").isNotNull(), F.col("ts_ms")),
                    ignorenulls=True,
                ).over(w)
            )
            / F.lit(int(si_ms))
        )
        .cast("long")
        .alias("staleness"),
    )
