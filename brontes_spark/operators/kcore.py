"""k-core decomposition by fixed-round peeling.

The k-core of an undirected graph is the maximal subgraph where every node
has degree >= k — the standard density screen before community/centrality
work (spam-farm detection in link graphs, dense-cluster seeds in
near-duplicate graphs; the same "prune the periphery first" move the
reference's subgraph verifier makes before path pricing, SURVEY §2 G3).

Peeling is inherently iterative: removing degree-<k nodes lowers their
neighbors' degrees, which may drop below k in the NEXT round. Each round
here is one aggregate (degrees) + two semi-joins (keep edges whose BOTH
endpoints survive) — the pagerank.py discipline: the driver loop only
assembles plans, lineage is cut per round with localCheckpoint (each round
reads the previous edge set TWICE — once per endpoint semi-join — so
without the cut, round t replans and RE-EXECUTES rounds 0..t-1 in both
branches and the work goes quadratic in rounds; this is load-bearing here,
not just plan hygiene).

`rounds` is part of the operator contract (peel_rounds semantics) so a
DuckDB twin can unroll the SAME rounds as generated CTEs and hash-match
exactly; convergence (the true k-core) is the fixpoint, reached when a
round removes nothing — `kcore` loops to the fixpoint with an early-stop
count check, `peel_rounds` never counts (zero driver-side actions beyond
the checkpoints themselves).

All arithmetic is integer counts — nothing to scale or round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_undirected(
    edges: DataFrame, src_col: str = "s", dst_col: str = "t"
) -> DataFrame:
    """(s, t) with s < t, self-loops dropped, duplicates collapsed — one
    row per undirected edge regardless of input orientation."""
    s, t = F.col(src_col), F.col(dst_col)
    return (
        edges.select(
            F.least(s, t).alias("s"), F.greatest(s, t).alias("t")
        )
        .filter(F.col("s") != F.col("t"))
        .distinct()
    )


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("t").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def peel_rounds(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """(node, deg) after exactly `rounds` peels of degree-<k nodes from
    the canonical undirected graph. Output degrees are measured on the
    SURVIVING edge set; a node that lost all edges has no row."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    e = canonical_undirected(edges).localCheckpoint(eager=False)
    for _ in range(rounds):
        keep = _degrees(e).filter(F.col("deg") >= k).select("node")
        e = (
            e.join(keep, e["s"] == keep["node"], "left_semi")
            .join(keep, F.col("t") == keep["node"], "left_semi")
            .localCheckpoint(eager=False)
        )
    return _degrees(e)


def kcore(edges: DataFrame, k: int, max_rounds: int = 64) -> DataFrame:
    """The true k-core: peel to fixpoint (early-stop when an edge count
    survives a round unchanged — dropping zero nodes is then permanent),
    returning (node, deg) with every deg >= k."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = canonical_undirected(edges).localCheckpoint(eager=False)
    n_edges = e.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        keep = _degrees(e).filter(F.col("deg") >= k).select("node")
        e2 = (
            e.join(keep, e["s"] == keep["node"], "left_semi")
            .join(keep, F.col("t") == keep["node"], "left_semi")
            .localCheckpoint(eager=False)
        )
        n2 = e2.count()
        e = e2
        if n2 == n_edges:
            break
        n_edges = n2
    # at fixpoint every surviving endpoint has deg >= k; the filter is a
    # no-op on converged runs and a contract-keeper if max_rounds cut early
    return _degrees(e).filter(F.col("deg") >= k)
