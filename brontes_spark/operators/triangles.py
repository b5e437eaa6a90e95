"""Distributed triangle counting — the graph-analytics primitive behind
community detection, spam/bot-graph screening, and clustering-coefficient
features over web/link graphs (the same graph regime as the dedup
connected-components pass in graph_cc.py; reference analogue: the pool
graph in /root/reference/crates/brontes-pricing/src/graphs/, which walks
cycles on a driver-side dim — this operator is the DISTRIBUTED shape for
graphs that do not fit a driver).

Algorithm: degree-ordered wedge closing (Schank & Wagner 2005 "forward";
the MapReduce formulation is Suri & Vassilvitskii 2011, WWW). Each
undirected edge is oriented from its lower endpoint to its higher
endpoint in the total order (degree, node) — so every triangle {x,y,z}
has EXACTLY one "apex" a whose two out-edges reach the other two
vertices, and is counted once when the wedge (a->b, a->c) finds its
closing edge (b->c).

Why this is THE 100 TB shape: under degree orientation no vertex has
out-degree above ~sqrt(2m) (a vertex keeps an out-edge only toward
HIGHER-degree neighbors, and there can be at most sqrt(2m) vertices of
degree >= sqrt(2m)), so the wedge relation — the only super-linear
intermediate — is bounded by sum_v C(outdeg(v), 2) = O(m^1.5) instead of
the naive sum C(deg(v), 2), which a single celebrity vertex of degree
10^7 would blow to 10^14 wedges. The hot key a star graph hands a naive
neighbor-join is exactly what the orientation dismantles: every edge at
the star center points INTO it (the leaves all have lower degree), so
the center's out-degree — and its wedge contribution — is zero.

Plan shape: degree = one explode + hash agg; orientation = two hash
joins of the edge list against the degree dim (shuffles keyed by node);
wedges = one self-join of the oriented list on the apex; closing = one
join on the (b, c) pair. Every join is an equi-join Catalyst shuffles on
its own key — no crossJoin, no driver collection, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list normalized to (u, v) with u < v, self-loops
    dropped, duplicates (including reversed duplicates) collapsed."""
    return (
        df.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _oriented(edges: DataFrame) -> DataFrame:
    """(a, b): each canonical edge oriented by the (degree, node) total
    order — a is the endpoint with the smaller (deg, id) pair."""
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        edges.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )


def triangles(df: DataFrame, src: str, dst: str) -> DataFrame:
    """(x, y, z) with x < y < z: every triangle in the undirected graph,
    exactly once. Input edges may be directed/duplicated/self-looped —
    canonicalization handles it."""
    o = _oriented(canonical_edges(df, src, dst)).cache()
    l, r = o.alias("l"), o.alias("r")
    # rank_b < rank_c in the SAME (deg, id) order the orientation used,
    # so the closing edge — if present — is oriented exactly b -> c
    wedges = l.join(
        r,
        (F.col("l.a") == F.col("r.a"))
        & (
            (F.col("l.db") < F.col("r.db"))
            | ((F.col("l.db") == F.col("r.db")) & (F.col("l.b") < F.col("r.b")))
        ),
    ).select(F.col("l.a").alias("apex"), F.col("l.b").alias("p"), F.col("r.b").alias("q"))
    closed = wedges.join(
        o.select(F.col("a").alias("p"), F.col("b").alias("q")), ["p", "q"]
    )
    return closed.select(
        F.least("apex", "p", "q").alias("x"),
        F.when(
            (F.col("apex") > F.least("apex", "p", "q"))
            & (F.col("apex") < F.greatest("apex", "p", "q")),
            F.col("apex"),
        )
        .when(
            (F.col("p") > F.least("apex", "p", "q"))
            & (F.col("p") < F.greatest("apex", "p", "q")),
            F.col("p"),
        )
        .otherwise(F.col("q"))
        .alias("y"),
        F.greatest("apex", "p", "q").alias("z"),
    )


def triangle_counts(df: DataFrame, src: str, dst: str) -> DataFrame:
    """(node, n_triangles): per-vertex triangle participation — the
    numerator of the local clustering coefficient. Nodes in no triangle
    are absent (join against the vertex set to densify)."""
    tri = triangles(df, src, dst)
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def triangle_total(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Single row (n_triangles, n_edges, n_wedges_closed_rate ... ) kept
    minimal: global triangle and canonical-edge counts."""
    edges = canonical_edges(df, src, dst)
    tri = triangles(df, src, dst)
    t = tri.agg(F.count(F.lit(1)).alias("n_triangles")).withColumn("j", F.lit(1))
    e = edges.agg(F.count(F.lit(1)).alias("n_edges")).withColumn("j", F.lit(1))
    return t.join(e, "j").drop("j")
