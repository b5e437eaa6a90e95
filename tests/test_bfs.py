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
