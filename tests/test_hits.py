"""hits_integer (operators/hits.py) vs an independent Python reference:
per-round parity on random digraphs, the star-graph closed form, pure
source/sink behavior, and normalized-ranking equivalence."""

from __future__ import annotations

import random
from collections import defaultdict

from brontes_spark.operators.hits import hits_integer


def _py_hits(edges: set[tuple[int, int]], rounds: int):
    out_adj, in_adj, nodes = defaultdict(set), defaultdict(set), set()
    for s, t in edges:
        out_adj[s].add(t)
        in_adj[t].add(s)
        nodes |= {s, t}
    hub = {n: 1 for n in nodes}
    auth = {n: 1 for n in nodes}
    for _ in range(rounds):
        auth = {n: sum(hub[u] for u in in_adj[n]) for n in nodes}
        hub = {n: sum(auth[v] for v in out_adj[n]) for n in nodes}
    return auth, hub


def _got(df):
    return {r["node"]: (r["auth"], r["hub"]) for r in df.collect()}


def test_matches_reference_random_digraphs(spark):
    for seed in (1, 2):
        rng = random.Random(seed)
        edges = set()
        while len(edges) < 80:
            a, b = rng.randrange(30), rng.randrange(30)
            if a != b:
                edges.add((a, b))
        df = spark.createDataFrame(sorted(edges), "src int, dst int")
        for rounds in (1, 2, 3):
            auth, hub = _py_hits(edges, rounds)
            got = _got(hits_integer(df, rounds=rounds))
            assert got == {n: (auth[n], hub[n]) for n in auth}, (seed, rounds)


def test_star_graph_closed_form(spark):
    # k spokes all pointing at one center: after round 1, center auth = k
    # (k hubs of weight 1), spokes hub = k (the center's new auth),
    # center hub = 0, spoke auth = 0
    k = 5
    edges = [(i, 99) for i in range(k)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = _got(hits_integer(df, rounds=1))
    assert got[99] == (k, 0)
    for i in range(k):
        assert got[i] == (0, k)


def test_rankings_match_normalized_hits(spark):
    # un-normalized scores must induce the same ordering as the usual
    # L1-normalized float iteration (normalization is a positive scalar)
    rng = random.Random(7)
    edges = set()
    while len(edges) < 60:
        a, b = rng.randrange(20), rng.randrange(20)
        if a != b:
            edges.add((a, b))
    rounds = 3
    auth, hub = _py_hits(edges, rounds)

    # float reference with per-round L1 normalization
    out_adj, in_adj, nodes = defaultdict(set), defaultdict(set), set()
    for s, t in edges:
        out_adj[s].add(t)
        in_adj[t].add(s)
        nodes |= {s, t}
    fh = {n: 1.0 for n in nodes}
    fa = {n: 1.0 for n in nodes}
    for _ in range(rounds):
        fa = {n: sum(fh[u] for u in in_adj[n]) for n in nodes}
        z = sum(fa.values()) or 1.0
        fa = {n: v / z for n, v in fa.items()}
        fh = {n: sum(fa[v] for v in out_adj[n]) for n in nodes}
        z = sum(fh.values()) or 1.0
        fh = {n: v / z for n, v in fh.items()}
    order_int = sorted(nodes, key=lambda n: (-auth[n], n))
    order_flt = sorted(nodes, key=lambda n: (-fa[n], n))
    assert order_int == order_flt

    df = spark.createDataFrame(sorted(edges), "src int, dst int")
    got = _got(hits_integer(df, rounds=rounds))
    assert {n: got[n][0] for n in got} == auth
