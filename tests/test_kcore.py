"""kcore / peel_rounds (operators/kcore.py) vs an independent Python
peeling reference: fixpoint correctness, round-by-round agreement,
canonicalization, and the monotone-shrink property."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from brontes_spark.operators.kcore import canonical_undirected, kcore, peel_rounds


def _py_peel(edges: set[tuple[int, int]], k: int, rounds: int | None):
    e = set(edges)
    r = 0
    while rounds is None or r < rounds:
        deg = Counter()
        for s, t in e:
            deg[s] += 1
            deg[t] += 1
        keep = {n for n, d in deg.items() if d >= k}
        e2 = {(s, t) for s, t in e if s in keep and t in keep}
        if rounds is None and len(e2) == len(e):
            break
        e = e2
        r += 1
    deg = Counter()
    for s, t in e:
        deg[s] += 1
        deg[t] += 1
    return dict(deg)


def _rand_graph(seed: int, n: int = 60, m: int = 150) -> set[tuple[int, int]]:
    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            out.add((min(a, b), max(a, b)))
    return out


def _got(df) -> dict[int, int]:
    return {r["node"]: r["deg"] for r in df.collect()}


@pytest.mark.parametrize("seed", [1, 2])
@pytest.mark.parametrize("k", [2, 3, 4])
def test_kcore_fixpoint_matches_reference(spark, seed, k):
    edges = _rand_graph(seed)
    df = spark.createDataFrame(sorted(edges), "s int, t int")
    want = _py_peel(edges, k, rounds=None)
    got = _got(kcore(df, k))
    assert got == want
    assert all(d >= k for d in got.values())


def test_peel_rounds_matches_reference_each_round(spark):
    edges = _rand_graph(5)
    df = spark.createDataFrame(sorted(edges), "s int, t int")
    for rounds in range(4):
        assert _got(peel_rounds(df, 3, rounds)) == _py_peel(edges, 3, rounds), rounds


def test_peel_rounds_monotone_shrink(spark):
    edges = _rand_graph(7)
    df = spark.createDataFrame(sorted(edges), "s int, t int")
    prev = None
    for rounds in range(4):
        nodes = set(_got(peel_rounds(df, 3, rounds)))
        if prev is not None:
            assert nodes <= prev
        prev = nodes


def test_canonicalization_orientation_self_loops_duplicates(spark):
    df = spark.createDataFrame(
        [(2, 1), (1, 2), (1, 2), (3, 3), (2, 3)], "s int, t int"
    )
    got = sorted(tuple(r) for r in canonical_undirected(df).collect())
    assert got == [(1, 2), (2, 3)]


def test_kcore_of_clique_is_clique(spark):
    n = 6
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)]
    df = spark.createDataFrame(edges, "s int, t int")
    got = _got(kcore(df, n - 1))
    assert got == {i: n - 1 for i in range(n)}
    # k above the clique degree peels everything
    assert kcore(df, n).count() == 0


def test_tree_peels_to_nothing_at_k2(spark):
    # a tree has no 2-core: leaves cascade inward to extinction
    edges = [(i, (i - 1) // 2) for i in range(1, 31)]
    df = spark.createDataFrame(edges, "s int, t int")
    assert kcore(df, 2).count() == 0
