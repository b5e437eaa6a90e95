"""Personalized PageRank: locality (zero rank outside the ball),
seed-restricted teleport, integer-recurrence parity with an
independent Python replay."""

from __future__ import annotations

from brontes_spark.operators.pagerank import ppr_integer


def _run(spark, edges, seeds, iters):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {
        r["node"]: r["rank"]
        for r in ppr_integer(e, s, iters=iters).collect()
    }


def _replay(edges, seeds, iters, scale=10**9, d_num=85, d_den=100):
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    out = {}
    for u, _ in e:
        out[u] = out.get(u, 0) + 1
    s = sorted(set(seeds))
    start = (scale * len(nodes)) // len(s)
    tp = ((d_den - d_num) * scale * len(nodes)) // (d_den * len(s))
    rank = {n: (start if n in s else 0) for n in nodes}
    for _ in range(iters):
        acc = {}
        for u, v in e:
            acc[v] = acc.get(v, 0) + rank[u] // out[u]
        rank = {
            n: (tp if n in s else 0) + (d_num * acc.get(n, 0)) // d_den
            for n in nodes
        }
    return rank


def test_matches_independent_replay(spark):
    edges = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
        ("c", "d"), ("d", "c"), ("d", "e"), ("e", "d"),
    ]
    for iters in (1, 3):
        got = _run(spark, edges, ["a"], iters)
        assert got == _replay(edges, ["a"], iters), iters


def test_locality_zero_outside_ball(spark):
    # chain a->b->c->d: after 2 iters mass reaches only b and c
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "d2")]
    got = _run(spark, edges, ["a"], 2)
    assert got["b"] > 0 and got["c"] > 0
    assert got["d"] == 0 and got["d2"] == 0


def test_seed_holds_teleport_even_when_unreached(spark):
    # seed z has no in-edges: rank = teleport share only
    edges = [("z", "q"), ("q", "q2")]
    got = _run(spark, edges, ["z"], 3)
    n, s = 3, 1
    tp = (15 * 10**9 * n) // (100 * s)
    assert got["z"] == tp
