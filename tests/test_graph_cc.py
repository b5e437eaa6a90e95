"""G3 connectivity: distributed connected components (operators/graph_cc)
+ driver-side union-find and the prune→rundown→abandon verify flow
(pricing/graph.verify_pairs; reference graphs/subgraph.rs:380-440)."""

from __future__ import annotations

from brontes_spark.operators.graph_cc import connected_components
from brontes_spark.pricing.graph import TokenGraph, verify_pairs


def test_connected_components_chain_and_singletons(spark):
    # chain 1-2-3-4, pair 10-11, isolated 20 (via vertices)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    verts = spark.createDataFrame([(20,), (1,)], "src long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, vertices=verts).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_converges_on_long_chain(spark):
    # 40-node chain: pointer jumping must converge well inside max_iter
    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iter=12).collect()
    }
    assert set(got.values()) == {0} and len(got) == n + 1


def test_token_graph_components_union_find():
    g = TokenGraph(
        [("p1", "a", "b", 1.0), ("p2", "b", "c", 1.0), ("p3", "x", "y", 1.0)]
    )
    comp = g.components()
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert g.connected("a", "c") and not g.connected("a", "y")


def test_verify_pairs_prune_rundown_abandon(spark):
    pools = spark.createDataFrame(
        [
            ("p1", "usdc", "weth", 50_000.0),   # survives $15k prune
            ("p2", "weth", "tok1", 10_000.0),   # only in the $7.5k rundown
            ("p3", "tok2", "tok3", 1_000.0),    # below both floors
        ],
        "pool string, token0 string, token1 string, liquidity_usd double",
    )
    got = verify_pairs(
        pools, [("usdc", "weth"), ("usdc", "tok1"), ("usdc", "tok2")]
    )
    assert got == {
        ("usdc", "weth"): "verified",
        ("usdc", "tok1"): "rundown",
        ("usdc", "tok2"): "abandon",
    }
