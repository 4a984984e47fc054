"""Graph centrality over key-bounded interaction graphs (tool-call
transition graphs, role flows): weighted PageRank by power iteration,
engineered for bit-exact DuckDB replay.

PageRank here is the standard damped random surfer over the
row-normalized weighted adjacency, with dangling mass redistributed
uniformly via a per-iteration SCALAR aggregate folded into the base
term (never materializing |dangling| x |nodes| completion edges):

    dm_k     = sum over dangling u of r_k(u)        (one scalar)
    r_{k+1}(v) = (1-d)/N + d*(dm_k/N) + d * sum_{u->v} r_k(u) * w(u,v)

Bit-exactness discipline (the repo's sorted-fold contract):
- edge weights w = n_pairs / out_total and the initial rank 1/N are
  single IEEE divisions of exact int64s;
- each node's incoming sum folds in ascending-src order (sort_array of
  a (src, contrib) struct here, list(c ORDER BY src) + list_reduce in
  DuckDB); the dangling-mass scalar folds the dangling nodes' ranks in
  ascending-node order the same way;
- damping literals go through _dlit (E-notation doubles — bare decimal
  literals parse as DECIMAL in both engines and DuckDB's
  DECIMAL->DOUBLE conversion is not correctly rounded), and the
  dangling-mass scalar re-enters the per-node expression as a _dlit
  literal (repr round-trips the IEEE double exactly).

Scale notes (100 TB): the corpus-sized work is whatever builds the edge
list (one groupBy in tool_sequences); the iteration runs on the
node/edge tables, which the operator's premise bounds (tools, roles —
catalogs, not corpora). Each step is one broadcastable join + one
fold-aggregation + one scalar aggregate over the dangling subset — the
dangling completion is O(|dangling|) per step, never an
|dangling| x |nodes| join, so a dangling-heavy web graph costs the same
per step as a dense one. localCheckpoint keeps the loop's plan flat.
For web-scale graphs you would swap the fold for float-tolerant
summation and drop the oracle — the exact fold is the price of the
value gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modelardb_dynamic_spark.operators.analytics import _dlit

_FOLD = (
    "aggregate(sort_array(collect_list(struct(src, c))), "
    "CAST(0 AS DOUBLE), (a, s) -> a + s.c)"
)


def pagerank(
    edges: DataFrame,
    iters: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """edges: (src string, dst string, n_pairs long) multigraph counts.
    Returns (node, r) after `iters` power steps from the uniform
    start. Node set = union of srcs and dsts; dangling nodes' mass is
    redistributed uniformly via a per-step scalar aggregate (identical
    to completing them with uniform out-edges, without the
    |dangling| x |nodes| edge materialization)."""
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_tot = edges.groupBy("src").agg(
        F.sum(F.col("n_pairs").cast("long")).alias("out_n")
    )
    e = edges.join(out_tot, ["src"]).selectExpr(
        "src",
        "dst",
        "CAST(n_pairs AS DOUBLE) / CAST(out_n AS DOUBLE) AS w",
    ).localCheckpoint()
    dang = nodes.join(
        out_tot.selectExpr("src AS node"), ["node"], "left_anti"
    ).localCheckpoint()

    ranks = nodes.selectExpr(
        "node", f"CAST(1 AS DOUBLE) / CAST({n} AS DOUBLE) AS r"
    ).localCheckpoint()
    base = f"{_dlit(1.0 - damping)} / CAST({n} AS DOUBLE)"
    dm_fold = (
        "COALESCE(aggregate(sort_array(collect_list(struct(node, r))), "
        "CAST(0 AS DOUBLE), (a, s) -> a + s.r), CAST(0 AS DOUBLE))"
    )
    for _ in range(int(iters)):
        # scalar dangling mass, folded in ascending-node order so the
        # oracle's list(r ORDER BY node) fold replays the same bits
        dm = (
            ranks.join(dang, ["node"], "left_semi")
            .agg(F.expr(dm_fold).alias("dm"))
            .collect()[0]["dm"]
        )
        s = (
            ranks.join(e, ranks["node"] == e["src"])
            .selectExpr("dst", "src", "r * w AS c")
            .groupBy("dst")
            .agg(F.expr(_FOLD).alias("s"))
        )
        ranks = (
            nodes.join(s, nodes["node"] == s["dst"], "left_outer")
            .selectExpr(
                "node",
                f"{base} + {_dlit(damping)} * "
                f"({_dlit(dm)} / CAST({n} AS DOUBLE)) + "
                f"{_dlit(damping)} * "
                "COALESCE(s, CAST(0 AS DOUBLE)) AS r",
            )
            .localCheckpoint()
        )
    return ranks


def triangle_census(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Exact per-node triangle count and local clustering coefficient
    over an undirected edge list (one row per edge, a < b) — the
    community-structure verdict PageRank can't give: a high-degree tool
    whose neighbors never co-occur (a pure hub, clustering ~ 0) versus a
    clique member (clustering ~ 1).

    Ordered-wedge join: triangles a < b < c are found once each by
    joining (a,b)x(b,c) wedges against the (a,c) edge; each triangle
    then credits its three corners. All counts exact int64; clustering
    = 2*T / (deg*(deg-1)) is one shared division, NULL for deg < 2.

    Scale notes: the wedge join keys on the shared endpoint and the
    closing join on the (a,c) pair — both plain hash joins, no
    cartesian; with edges ordered a < b every wedge is generated once
    (no factor-6 duplication). Cost is sum of deg(v)^2 over the
    LOW-ordered endpoint — the standard ordered-triangle bound; on
    key-bounded graphs (tools, sources) the whole thing is broadcast-
    sized."""
    e = edges.selectExpr(f"{a_col} AS a", f"{b_col} AS b")
    w1 = e.selectExpr("a AS x", "b AS y")
    w2 = e.selectExpr("a AS y", "b AS z")
    tri = (
        w1.join(w2, ["y"])
        .join(
            e.selectExpr("a AS x", "b AS z", "CAST(1 AS INT) AS hit"),
            ["x", "z"],
        )
        .select("x", "y", "z")
    )
    corners = (
        tri.selectExpr("x AS node")
        .unionByName(tri.selectExpr("y AS node"))
        .unionByName(tri.selectExpr("z AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    deg = (
        e.selectExpr("a AS node")
        .unionByName(e.selectExpr("b AS node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return (
        deg.join(corners, ["node"], "left")
        .fillna(0, ["n_triangles"])
        .selectExpr(
            "node",
            "degree",
            "n_triangles",
            "CASE WHEN degree >= 2 THEN CAST(2 * n_triangles AS DOUBLE)"
            " / CAST(degree * (degree - 1) AS DOUBLE) END AS clustering",
        )
    )
