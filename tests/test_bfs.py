"""Multi-source BFS: hand-graph golds — distances, first-reach-wins,
smallest-root ties, unreached nodes, rounds=0 edge case."""

from __future__ import annotations

from brontes_spark.operators.bfs import bfs_nearest_seed


def _run(spark, edges, seeds, rounds):
    e = spark.createDataFrame(edges, "s string, t string")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {
        r["node"]: (r["dist"], r["root"])
        for r in bfs_nearest_seed(e, s, rounds).collect()
    }


def test_chain_distances_and_unreached(spark):
    # a-b-c-d-e directed chain, seed a, 3 rounds: e stays unreached
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = _run(spark, edges, ["a"], 3)
    assert got == {"a": (0, "a"), "b": (1, "a"), "c": (2, "a"), "d": (3, "a")}


def test_first_reach_wins_over_later_shorter_root(spark):
    # x is 1 hop from seed q and 2 hops from seed a: dist=1, root=q —
    # first reach settles, the round-2 path never overwrites
    edges = [("q", "x"), ("a", "m"), ("m", "x")]
    got = _run(spark, edges, ["a", "q"], 3)
    assert got["x"] == (1, "q")


def test_same_round_tie_takes_smallest_root(spark):
    edges = [("a", "x"), ("b", "x")]
    got = _run(spark, edges, ["a", "b"], 1)
    assert got["x"] == (1, "a")


def test_zero_rounds_returns_seeds_only(spark):
    got = _run(spark, [("a", "b")], ["a", "z"], 0)
    assert got == {"a": (0, "a"), "z": (0, "z")}


def test_seed_never_reassigned(spark):
    # b is itself a seed and also a's neighbor: stays (0, b)
    got = _run(spark, [("a", "b")], ["a", "b"], 2)
    assert got["b"] == (0, "b")


def _sssp(spark, edges, seeds, rounds):
    from brontes_spark.operators.bfs import sssp_bellman_ford

    e = spark.createDataFrame(edges, "s string, t string, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return {
        r["node"]: (r["dist"], r["root"])
        for r in sssp_bellman_ford(e, s, rounds).collect()
    }


def test_sssp_two_hop_beats_direct_edge(spark):
    # direct a->x costs 10; a->m->x costs 2+3=5: round 2 must IMPROVE x
    edges = [("a", "x", 10), ("a", "m", 2), ("m", "x", 3)]
    assert _sssp(spark, edges, ["a"], 1)["x"] == (10, "a")
    assert _sssp(spark, edges, ["a"], 2)["x"] == (5, "a")


def test_sssp_multi_source_and_root_tie(spark):
    # x is cost 4 from both seeds: smallest root wins the tie
    edges = [("a", "x", 4), ("b", "x", 4), ("b", "y", 1)]
    got = _sssp(spark, edges, ["b", "a"], 2)
    assert got["x"] == (4, "a")
    assert got["y"] == (1, "b")


def test_sssp_zero_weight_edges(spark):
    edges = [("a", "x", 0), ("x", "y", 0)]
    got = _sssp(spark, edges, ["a"], 2)
    assert got["x"] == (0, "a") and got["y"] == (0, "a")
