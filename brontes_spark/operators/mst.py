"""Distributed minimum spanning forest — Boruvka rounds, completing the
iterative graph family (CC, PageRank, BFS, SSSP, k-core, label-prop,
triangles, HITS, PPR).

The training-data uses are the same ones that motivate the dedup/CC
stack: an MST over a similarity graph is the classic single-linkage
clustering backbone (cut its heaviest edges to get HAC clusters at any
threshold), and a spanning forest of the near-dup pair graph is the
minimal evidence set that certifies every cluster's connectivity —
O(V) edges retained out of O(V^2) candidate pairs.

Algorithm (Boruvka 1926, the naturally-parallel MST): every round, each
component selects its minimum incident CROSS-component edge under the
TOTAL order (weight, min_end, max_end) — duplicate weights therefore
cannot make the forest ambiguous, and the output is a pure function of
the edge multiset — then all selected edges join the forest and the
touched components merge. Components at least halve per round, so
ceil(log2 V) rounds suffice; rounds are bounded by the caller like the
rest of the family (bounded rounds + per-round localCheckpoint lineage
cuts).

Scale shape per round: one edges x labels hash join (re-label both
endpoints), one per-component min_by aggregate (map-side combinable),
one edge-identity dedup, and the component merge — which reuses
operators/graph_cc.connected_components on the SELECTED-edge graph
only: that graph has at most one edge per component (<= V/2^round rows,
shrinking geometrically), never the full edge list. No driver-side
structure scales with the graph: the loop carries DataFrames only.

Self-loops and duplicate/parallel edges are handled (loops dropped,
parallel edges collapse under the total order). Disconnected inputs
yield a spanning FOREST (n_components > 1 at convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph_cc import connected_components


def minimum_spanning_forest(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    rounds: int = 10,
) -> DataFrame:
    """The spanning forest's edges: (u, v, weight) with u < v, one row per
    forest edge, deterministic under the (weight, u, v) total order.

    ``rounds`` bounds the Boruvka iterations (components at least halve
    per round, so 10 covers 1024-component graphs; pass ceil(log2 V) for
    bigger graphs). Converged inputs stop early (no cross-component edge
    left).
    """
    # canonicalize: undirected edge identity is (u=min, v=max); parallel
    # edges and self-loops collapse/drop here
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
            F.col(weight).alias("w"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    forest = None

    for _ in range(rounds):
        lu = labels.select(F.col("node").alias("u"), F.col("comp").alias("cu"))
        lv = labels.select(F.col("node").alias("v"), F.col("comp").alias("cv"))
        cross = (
            e.join(lu, "u").join(lv, "v").filter(F.col("cu") != F.col("cv"))
        )
        if cross.isEmpty():
            break
        # each component's minimum incident edge under (w, u, v); the edge
        # struct rides a min aggregate so both sides pick consistently
        cand = cross.select(
            F.explode(F.array("cu", "cv")).alias("comp"),
            F.struct("w", "u", "v").alias("edge"),
        )
        chosen = (
            cand.groupBy("comp")
            .agg(F.min("edge").alias("edge"))
            .select("edge.u", "edge.v", "edge.w")
            .distinct()  # one edge can win for BOTH of its components
            .localCheckpoint()
        )
        forest = chosen if forest is None else forest.union(chosen)
        # merge: relabel via CC over the selected-edge COMPONENT graph
        # (<= one edge per component — geometrically shrinking input)
        comp_edges = (
            chosen.join(lu, "u").join(lv, "v").select("cu", "cv")
        )
        merged = connected_components(comp_edges, "cu", "cv")
        labels = (
            labels.join(
                merged.withColumnRenamed("node", "comp"), "comp", "left"
            )
            .select(
                "node", F.coalesce("component", F.col("comp")).alias("comp")
            )
            .localCheckpoint()
        )

    if forest is None:
        return e.filter(F.lit(False)).select(
            "u", "v", F.col("w").alias("weight")
        )
    return forest.select("u", "v", F.col("w").alias("weight"))
