"""label_propagation (operators/labelprop.py) vs an independent Python
synchronous-LPA reference, plus rrf_fuse (operators/fusion.py) vs
hand-computed fusion and the BM25∘RRF composition shape."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from brontes_spark.operators.fusion import rrf_fuse
from brontes_spark.operators.labelprop import label_churn, label_propagation

# ----------------------------------------------------------- labelprop


def _py_lpa(edges: set[tuple[int, int]], rounds: int) -> dict[int, int]:
    adj = defaultdict(set)
    for s, t in edges:
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n in adj:
            c = Counter(labels[m] for m in adj[n])
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[n] = best
        labels = nxt
    return labels


def _got(df):
    return {r["node"]: r["label"] for r in df.collect()}


def test_two_triangles_with_bridge_find_communities(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    df = spark.createDataFrame(edges, "s int, t int")
    got = _got(label_propagation(df, 3))
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_matches_python_reference_random_rounds(spark):
    for seed in (3, 4):
        rng = random.Random(seed)
        edges = set()
        while len(edges) < 120:
            a, b = rng.randrange(50), rng.randrange(50)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        df = spark.createDataFrame(sorted(edges), "s int, t int")
        for rounds in (0, 1, 2, 3):
            assert _got(label_propagation(df, rounds)) == _py_lpa(edges, rounds), (
                seed,
                rounds,
            )


def test_isolated_nodes_never_appear(spark):
    # node 9 has only a self-loop: dropped by canonicalization
    df = spark.createDataFrame([(0, 1), (9, 9)], "s int, t int")
    assert set(_got(label_propagation(df, 2))) == {0, 1}


def test_label_churn_reaches_zero_on_converged_graph(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    df = spark.createDataFrame(edges, "s int, t int")
    a = label_propagation(df, 3)
    b = label_propagation(df, 4)
    assert label_churn(a, b) == 0


# --------------------------------------------------------------- fusion


def test_rrf_hand_computed(spark):
    r1 = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2), ("q", 12, 3)], "query string, id int, rk int"
    )
    r2 = spark.createDataFrame(
        [("q", 11, 1), ("q", 13, 2)], "query string, id int, rk int"
    )
    got = {r["id"]: r for r in rrf_fuse([r1, r2], "query", "id", "rk", k=60).collect()}
    # id 11: 1e9//62 + 1e9//61 — in both lists, must rank first
    assert got[11]["score9"] == 10**9 // 62 + 10**9 // 61
    assert got[11]["n_lists"] == 2 and got[11]["fused_rank"] == 1
    assert got[10]["score9"] == 10**9 // 61 and got[10]["fused_rank"] == 2
    assert got[13]["score9"] == 10**9 // 62
    # tie between id 12 (rank 3 list1) and nothing else at that score
    assert got[12]["score9"] == 10**9 // 63


def test_rrf_queries_are_independent(spark):
    r1 = spark.createDataFrame(
        [("a", 1, 1), ("b", 2, 1)], "query string, id int, rk int"
    )
    got = {(r["query"], r["id"]): r["fused_rank"]
           for r in rrf_fuse([r1], "query", "id", "rk").collect()}
    assert got == {("a", 1): 1, ("b", 2): 1}


def test_rrf_fuses_bm25_with_a_second_retriever(spark):
    # the composition the operator exists for: BM25 ranks ∘ RRF
    from brontes_spark.operators.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark shuffles data fast"), (2, "spark caches data"),
         (3, "ducks quack loudly"), (4, "spark spark spark")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "spark"), (100, "data")], "query_id long, term string"
    )
    bm = bm25_topk(docs, queries, "doc_id", "text", k=4)
    bm_rank = bm.select(
        F.col("query_id").alias("query"), F.col("doc_id").alias("id"),
        F.col("rnk").alias("rk"),
    )
    # second retriever: recency (doc_id desc as a stand-in rank)
    from pyspark.sql import Window as W

    rec = docs.select(
        F.lit(100).cast("long").alias("query"), F.col("doc_id").alias("id"),
        F.row_number().over(W.orderBy(F.col("doc_id").desc())).alias("rk"),
    )
    fused = rrf_fuse([bm_rank, rec], "query", "id", "rk", k=60, top=3)
    rows = {r["id"]: r for r in fused.collect()}
    assert len(rows) == 3
    # every fused doc carries contributions from at least one list and
    # docs present in both lists outrank same-rank singletons
    assert all(r["n_lists"] >= 1 for r in rows.values())
