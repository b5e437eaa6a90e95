"""Distributed connected components — the scale path for G3 subgraph
verification (SURVEY.md §2.6, graphs/subgraph.rs:380-440 disjointness
checks) and for turning near-dup PAIR outputs (MinHash/LSH, n-gram
Jaccard) into duplicate CLUSTERS, the step an at-scale dedup pipeline
actually needs before keep-one-per-cluster filtering.

Algorithm: iterative min-label propagation with pointer jumping.
Each round every node takes the min label over {itself} ∪ neighbors
(one shuffle), then compresses label chains by looking up its label's
label (second shuffle) — the pointer-jump makes convergence ~O(log D)
rounds on chain-shaped components instead of O(D). Lineage is truncated
per round with localCheckpoint (an iterative plan otherwise doubles per
round and re-executes the whole history), and the loop stops when a
round changes no label. Deterministic: min over node ids.

The reference's graph fits on the driver (SURVEY §4: ~10^5-10^6 edges) —
pricing.graph.TokenGraph.components covers that; this operator exists for
the 100 TB regime where the edge list itself is a distributed table
(billions of near-dup pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every vertex, component = min node id in the
    component. `vertices` (single column named like `src`) adds isolated
    nodes; pass the full corpus to get singleton clusters too."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    nodes = und.select(F.col("a").alias("node"))
    if vertices is not None:
        nodes = nodes.union(vertices.select(F.col(src).alias("node")))
    labels = nodes.distinct().withColumn("label", F.col("node")).localCheckpoint()
    und = und.localCheckpoint()

    for _ in range(max_iter):
        # min label over self ∪ neighbors
        neigh = (
            und.join(labels, und["a"] == labels["node"])
            .select(F.col("b").alias("node"), "label")
            .union(labels.select("node", "label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: follow label -> its own label
        lab2 = neigh.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        jumped = (
            neigh.join(lab2, neigh["label"] == lab2["l_node"], "left")
            .select(
                "node", F.least(F.col("label"), F.col("l_label")).alias("label")
            )
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
