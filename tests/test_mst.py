"""Boruvka minimum spanning forest (operators/mst.py) vs an independent
Kruskal implementation under the same (weight, u, v) total order —
random graphs, duplicate weights, parallel edges, self-loops,
disconnected forests."""

from __future__ import annotations

import random

from brontes_spark.operators.mst import minimum_spanning_forest
import pytest

DDL = "src long, dst long, weight long"


def _kruskal(edges):
    """Forest edges under the (w, u, v) total order (canonicalized)."""
    canon = {}
    for s, d, w in edges:
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        if (u, v) not in canon or w < canon[(u, v)]:
            canon[(u, v)] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for (u, v), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((u, v, w))
    return sorted(out)


def _spark_forest(spark, edges, rounds=10):
    df = spark.createDataFrame(edges, DDL)
    got = minimum_spanning_forest(df, "src", "dst", "weight", rounds=rounds)
    return sorted((r["u"], r["v"], r["weight"]) for r in got.collect())


def test_simple_triangle_plus_tail(spark):
    edges = [(1, 2, 5), (2, 3, 3), (1, 3, 4), (3, 4, 10)]
    assert _spark_forest(spark, edges) == [(1, 3, 4), (2, 3, 3), (3, 4, 10)]


def test_duplicate_weights_total_order(spark):
    # all weights equal: the forest is still unique under (w, u, v)
    edges = [(1, 2, 7), (2, 3, 7), (1, 3, 7), (3, 4, 7), (1, 4, 7)]
    assert _spark_forest(spark, edges) == _kruskal(edges)


def test_parallel_edges_self_loops_disconnected(spark):
    edges = [
        (1, 2, 9), (2, 1, 3),  # parallel: min weight wins
        (2, 2, 1),             # self-loop: dropped
        (3, 4, 2), (4, 5, 2), (3, 5, 8),  # second component
        (7, 8, 1),             # third component
    ]
    got = _spark_forest(spark, edges)
    assert got == _kruskal(edges)
    assert (1, 2, 3) in got  # the parallel pair collapsed to weight 3
    assert len(got) == 4  # V=7 nodes, 3 components -> 4 forest edges


@pytest.mark.slow
def test_random_graphs_match_kruskal(spark):
    rng = random.Random(17)
    for trial in range(3):
        n = 40 + 15 * trial
        nodes = list(range(n))
        edges = []
        for _ in range(n * 3):
            s, d = rng.sample(nodes, 2)
            edges.append((s, d, rng.randrange(1, 12)))  # dense weight ties
        assert _spark_forest(spark, edges) == _kruskal(edges), trial


def test_chain_needs_log_rounds_only(spark):
    # a 64-node path: Boruvka must finish in ~log2(64)=6 rounds, well
    # under the default 10 (each round at least halves the components)
    edges = [(i, i + 1, 100 - i) for i in range(63)]
    got = _spark_forest(spark, edges, rounds=7)
    assert len(got) == 63  # the whole path is the tree
