"""k-truss (operators/ktruss.py) against a brute-force peeling mirror:
fixpoint equality on planted graphs, cascade behavior, k=3 triangle
filter, and input canonicalization."""

from __future__ import annotations

from collections import defaultdict

import pytest


def _brute(edges, k, max_rounds=50):
    e = set()
    for s, t in edges:
        if s != t:
            e.add((min(s, t), max(s, t)))
    for _ in range(max_rounds):
        adj = defaultdict(set)
        for a, b in e:
            adj[a].add(b)
            adj[b].add(a)
        keep = {(a, b) for a, b in e if len(adj[a] & adj[b]) >= k - 2}
        if keep == e:
            return e
        e = keep
    return e


def _run(spark, edges, k, rounds=10):
    from brontes_spark.operators.ktruss import k_truss

    df = spark.createDataFrame(edges, "src long, dst long")
    return {(r["u"], r["v"]) for r in k_truss(df, k, rounds=rounds).collect()}


def test_clique_plus_tail_peels_to_clique(spark):
    # K5 (4-truss-proof for k<=5) with a pendant chain and one triangle
    # hanging off: k=4 must peel the chain AND the lone triangle (its
    # edges close only 1 triangle), keeping exactly the clique
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12)]
    tri = [(0, 20), (0, 21), (20, 21)]
    edges = k5 + tail + tri
    assert _run(spark, edges, 4) == _brute(edges, 4) == set(k5)
    # k=3 keeps every triangle edge, drops only the chain
    assert _run(spark, edges, 3) == _brute(edges, 3) == set(k5) | set(tri)


def test_cascade_requires_multiple_rounds(spark):
    # a "staircase" of triangles sharing edges: removing the weakest
    # triangle's edges drops the next one's support below threshold —
    # the single-pass support filter is NOT the fixpoint
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5),
             (5, 6), (4, 6)]
    want = _brute(edges, 4)
    assert want == set()  # everything cascades away at k=4
    assert _run(spark, edges, 4) == want
    one_round = _run(spark, edges, 4, rounds=1)
    assert one_round == set()  # each edge closes exactly 1 triangle here


def test_duplicates_loops_and_direction_collapse(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    noisy = k4 + [(b, a) for a, b in k4] + [(1, 1), (2, 2)] + k4
    assert _run(spark, noisy, 4) == set(k4)


def test_k_below_3_rejected(spark):
    from brontes_spark.operators.ktruss import k_truss

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        k_truss(df, 2)
