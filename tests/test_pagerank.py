"""Integer PageRank (operators/pagerank.py): pure-Python reference parity
(exact, every iteration), hub dominance, dangling semantics, and the
DuckDB unrolled-oracle twin on a random graph."""

from __future__ import annotations

import random

import duckdb

from brontes_spark.operators.pagerank import pagerank_integer, pagerank_oracle_sql

SCALE = 10**9


def _py_ref(edge_list, iters=3, scale=SCALE, num=85, den=100):
    e = sorted(set(edge_list))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    r = {n: scale for n in nodes}
    tel = (scale * (den - num)) // den
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in e:
            s[v] += r[u] // out[u]
        r = {n: tel + (num * s[n]) // den for n in nodes}
    return r


def _spark_pr(spark, edge_list, **kw):
    df = spark.createDataFrame(edge_list, "src string, dst string")
    return {r.node: r.rank for r in pagerank_integer(df, **kw).collect()}


def test_matches_python_reference_exactly(spark):
    rng = random.Random(17)
    edges = list({(f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
                  for _ in range(150)})
    edges = [(s, d) for s, d in edges if s != d]
    assert _spark_pr(spark, edges) == _py_ref(edges)


def test_hub_gets_highest_rank(spark):
    edges = [(f"u{i}", "hub") for i in range(10)] + [("hub", "u0")]
    got = _spark_pr(spark, edges)
    assert got["hub"] == max(got.values())


def test_dangling_semantics_documented(spark):
    # b has no out-edges: its mass is absorbed, not redistributed
    edges = [("a", "b")]
    got = _spark_pr(spark, edges, iters=2)
    assert got == _py_ref(edges, iters=2)


def test_duckdb_unrolled_oracle_matches(spark):
    rng = random.Random(23)
    edges = sorted({(f"x{rng.randrange(25)}", f"x{rng.randrange(25)}")
                    for _ in range(120)})
    got = _spark_pr(spark, edges)
    values = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    sql = pagerank_oracle_sql(f"edges(src, dst) AS (VALUES {values})")
    duck = {r[0]: r[1] for r in duckdb.connect().execute(sql).fetchall()}
    assert got == duck
