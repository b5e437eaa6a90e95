"""Synchronous label propagation — deterministic community detection.

Classic LPA (Raghavan et al. 2007) is notoriously nondeterministic
(random visit order, random tie-breaks). This is the SYNCHRONOUS
fixed-iteration variant with a TOTAL tie order, which makes it a pure
function of the graph: every node starts labeled with itself; each round,
every node simultaneously adopts the label that is most frequent among
its neighbors, ties broken by the SMALLEST label (then keeps that label
into the next round — a node with no neighbors never appears). After r
rounds, nodes sharing a label form the detected communities.

Relational per round: one join (edge ⋈ label) + one count aggregate per
(node, neighbor_label) + one argmax — all hash operations on the edge
relation; the driver loop only assembles plans and cuts lineage per round
(pagerank.py discipline — the label relation is read by the next round's
join on BOTH endpoints via the bidirected edge list, so the cut prevents
re-execution, not just plan depth).

Determinism makes a DuckDB twin possible: the SAME rounds unroll as
generated CTEs (the g7/g9 pattern) and hash-match exactly — integer
counts and min-label tie-breaks, no randomness, no floats.

Known semantics note: synchronous LPA can oscillate 2-cycles on
bipartite-ish structures (the literature's documented failure mode);
fixed-round output is still well-defined and the oracle replays it
exactly. Production dial: run r rounds, measure label churn between
r-1 and r, stop when churn is ~0 (the kcore early-stop shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kcore import canonical_undirected


def label_propagation(edges: DataFrame, rounds: int) -> DataFrame:
    """(node, label) after `rounds` synchronous updates over the
    canonical undirected graph; label = smallest-most-frequent neighbor
    label, per round, all nodes at once."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    e = canonical_undirected(edges)
    bidir = e.unionAll(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).localCheckpoint(eager=False)
    labels = bidir.select(F.col("s").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(rounds):
        neigh = bidir.join(
            labels.select(
                F.col("node").alias("t"), F.col("label").alias("n_label")
            ),
            "t",
        )
        counted = neigh.groupBy(F.col("s").alias("node"), "n_label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # argmax by (cnt DESC, label ASC): max_by over an orderable struct
        # with the label negated... integers can't negate strings, so use
        # the total struct (cnt, -label) for numeric labels — instead,
        # portable: min_by over (-cnt, label) is (max cnt, min label)
        labels = counted.groupBy("node").agg(
            F.expr("min_by(n_label, struct(-cnt, n_label))").alias("label")
        ).localCheckpoint(eager=False)
    return labels


def label_churn(a: DataFrame, b: DataFrame) -> int:
    """Count of nodes whose label differs between two label relations —
    the convergence dial for the production stop rule."""
    j = a.select("node", F.col("label").alias("la")).join(
        b.select("node", F.col("label").alias("lb")), "node"
    )
    return j.filter(F.col("la") != F.col("lb")).count()
