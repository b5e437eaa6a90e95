"""Neighborhood-overlap link-prediction scores over a distributed edge
list — the classic unsupervised candidate generators for graph-based
dedup/entity-resolution review queues and recommender cold-start:
common neighbors, Jaccard overlap, and the resource-allocation index
(Zhou, Lü & Zhang 2009), scored for every node pair at distance 2.

Resource allocation (RA = sum over shared neighbors z of 1/deg(z))
deliberately replaces Adamic-Adar here: AA's 1/ln(deg) terms are
transcendental doubles whose cross-engine SUM is partial-aggregation-
order dependent, while RA quantizes exactly — each term is the integer
floor(1e12 / deg(z)) and the score is an order-independent int64 sum
(the suite's ANOVA/chi2 quantization discipline; deg >= 1 always, and
1e12-scaled units keep 53-bit-exactness irrelevant since the sum stays
integer end-to-end). Jaccard ships as the exact rational (cn, du + dv -
cn) plus ONE correctly-rounded double division.

Scale shape: wedge enumeration is ONE self-join of the oriented
adjacency list on the CENTER node (the g8 triangle shape) — shuffle on
z, never corpus x corpus. Hub centers fan out deg(z)^2 wedges; the
``max_center_degree`` cap drops centers above it (a z with huge degree
contributes at most 1e12/deg ~ 0 to RA anyway, and capping is the
standard hub-suppression in production link prediction — documented,
deterministic, and part of the operator's definition, mirroring how the
SNM/LSH dedup paths bound their blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RA_SCALE = 1_000_000_000_000  # 1e12: RA term = floor(RA_SCALE / deg(z))


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_center_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """(u, v, common_neighbors, ra_12, jaccard_num, jaccard_den, jaccard)
    for every non-adjacent-or-adjacent pair u < v sharing >= min_common
    neighbors. ra_12 is the RA index in 1e-12 units (exact int64).

    Self-loops dropped; parallel/bidirectional duplicates collapse to one
    undirected edge before degrees are counted.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # cache-pin the shared relations (the g8 triangle discipline): deg is
    # consumed three times (adjacency + both endpoint joins) and adj twice
    # (both wedge sides) — uncached, every branch re-runs the canonical
    # distinct and its exchange (measured: 17 exchanges -> 6)
    deg = (
        und.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .cache()
    )
    # adjacency oriented center -> endpoint, center degree attached once
    adj = und.select(F.col("a").alias("z"), F.col("b").alias("n")).join(
        deg.select(F.col("node").alias("z"), F.col("deg").alias("deg_z")), "z"
    )
    if max_center_degree is not None:
        adj = adj.filter(F.col("deg_z") <= max_center_degree)
    adj = adj.cache()
    l = adj.select("z", F.col("n").alias("u"), "deg_z")
    r = adj.select("z", F.col("n").alias("v"))
    wedges = l.join(r, "z").filter(F.col("u") < F.col("v"))
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        # exact integer division (Spark `div` == DuckDB `//` on bigints);
        # a float division + cast could round up across the engines
        F.sum(F.expr(f"CAST({RA_SCALE} AS BIGINT) div deg_z")).alias("ra_12"),
    ).filter(F.col("common_neighbors") >= min_common)
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    out = scored.join(du, "u").join(dv, "v")
    jac_den = F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors")
    return out.select(
        "u",
        "v",
        "common_neighbors",
        "ra_12",
        F.col("common_neighbors").alias("jaccard_num"),
        jac_den.alias("jaccard_den"),
        (F.col("common_neighbors").cast("double") / jac_den.cast("double")).alias(
            "jaccard"
        ),
    )
