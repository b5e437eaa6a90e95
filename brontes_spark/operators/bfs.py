"""Multi-source BFS: hop distances + nearest-seed assignment.

The reference prices tokens by walking its pair graph with driver-side
Dijkstra (G2, crates/brontes-pricing/src/graphs/*); that is the right
call for its ~1e4-node token graph (SURVEY §4). This operator is the
DISTRIBUTED member of the family, for graphs that do NOT fit a driver:
given a seed set, label every reachable node with its hop distance and
the seed that reached it first — graph Voronoi / hub-assignment, the
primitive behind "distance to nearest exchange wallet", influence radii,
and contamination blast-radius queries.

Relational per round (frontier expansion):

    cand_r  = edges ⋈ frontier_{r-1}  (hash join on the edge source)
              -> min(root) per reached node  (one hash agg)
    new_r   = cand_r  anti-join  settled     (first-reach wins)
    settled = settled ∪ new_r ;  frontier_r = new_r

Every step is a hash operation keyed on the node id; the frontier
SHRINKS as the ball saturates, so late rounds are cheap. Lineage is cut
per round (pagerank.py discipline: `settled` is read by both the next
anti-join and the final output, `new` by three consumers — without the
cut, round t replans rounds 0..t-1 in every branch).

Determinism: a node reached by several frontier nodes in the same round
adopts the SMALLEST root (min over an orderable type), so the output is
a pure function of (edges, seeds, rounds) and the DuckDB twin replays
the identical rounds as generated unrolled CTEs (the g7/g9/g10 pattern).

Fixed `rounds` bounds the unrolled plan exactly like pagerank/kcore; the
production stop rule is `frontier.count() == 0` (one tiny driver action
per round — the count IS the convergence signal, not a data collect).
At 100 TB the cost model is rounds x (one edge-relation hash join); for
high-diameter graphs that is the known BFS lower bound on any
synchronous engine — low-diameter (social/trade) graphs saturate in a
handful of rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_nearest_seed(
    edges: DataFrame, seeds: DataFrame, rounds: int
) -> DataFrame:
    """(node, dist, root) for every node within `rounds` hops of a seed.

    ``edges``: (s, t) DIRECTED — pass a bidirected relation for
    undirected semantics. ``seeds``: one column ``node``; each seed is
    its own root at dist 0. Ties (same-round multi-reach, and duplicate
    seed rows) resolve to the smallest root.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    settled = (
        seeds.select("node")
        .distinct()
        .select("node", F.lit(0).alias("dist"), F.col("node").alias("root"))
        .localCheckpoint(eager=False)
    )
    frontier = settled
    for r in range(1, rounds + 1):
        cand = (
            edges.join(frontier.select(F.col("node").alias("s"), "root"), "s")
            .groupBy(F.col("t").alias("node"))
            .agg(F.min("root").alias("root"))
        )
        new = (
            cand.join(settled.select("node"), "node", "left_anti")
            .select("node", F.lit(r).alias("dist"), "root")
            .localCheckpoint(eager=False)
        )
        settled = settled.unionAll(new).localCheckpoint(eager=False)
        frontier = new
    return settled
