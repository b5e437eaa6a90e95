"""Property pins for the round-8 fourth-wave kernels — Spark-side bulk
examples (one seeded generation per test, variety inside the example;
the test_property.py cost model) plus cheap pure-Python properties.

Each property is a LAW the operator's docstring claims, not a re-run of
the unit goldens: skyline idempotence, k-core degree contract and
subgraph monotonicity, TWAP shift/scale invariance, Markov row-stochastic
envelope, BPE determinism under corpus shuffling."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from brontes_spark.operators.kcore import kcore
from brontes_spark.operators.markov import transition_stats
from brontes_spark.operators.skyline import skyline_max2
from brontes_spark.operators.twap import twap


def test_skyline_is_idempotent(spark):
    # skyline(skyline(X)) == skyline(X): the frontier is dominance-free,
    # so a second pass must be the identity (multiplicities preserved)
    rng = random.Random(77)
    pts = [(rng.randrange(60), rng.randrange(60)) for _ in range(500)]
    df = spark.createDataFrame(pts, "x int, y int")
    once = skyline_max2(df, "x", "y")
    again = skyline_max2(
        once.select(
            F.explode(F.array_repeat(F.struct("x", "y"), F.col("n_pts").cast("int"))).alias("p")
        ).select("p.x", "p.y"),
        "x",
        "y",
    )
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in again.collect())
    assert a == b


def test_kcore_every_survivor_meets_k_and_is_subgraph_monotone(spark):
    rng = random.Random(78)
    edges = set()
    while len(edges) < 200:
        a, b = rng.randrange(70), rng.randrange(70)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "s int, t int")
    prev_nodes = None
    for k in (2, 3, 4, 5):
        got = {r["node"]: r["deg"] for r in kcore(df, k).collect()}
        assert all(d >= k for d in got.values()), k
        if prev_nodes is not None:
            # (k+1)-core ⊆ k-core
            assert set(got) <= prev_nodes, k
        prev_nodes = set(got)


def test_twap_invariant_under_time_shift_and_price_scale(spark):
    rng = random.Random(79)
    rows = []
    for k in range(3):
        t = 0
        for i in range(20):
            t += rng.randrange(1, 10**9) * 1000  # µs-aligned
            rows.append((k, t, rng.randrange(100, 10**6) / 100.0, k * 100 + i))
    df = spark.createDataFrame(rows, "k int, ts_ns long, px double, id int")
    base = {r["key"]: r["twap9"] for r in twap(df, "k", "ts_ns", "px", "id").collect()}
    # time shift by a whole number of ms: identical twap9 (durations are
    # differences; ms grid alignment preserved)
    shifted = df.withColumn("ts_ns", F.col("ts_ns") + F.lit(5_000_000_000_000))
    got_s = {r["key"]: r["twap9"] for r in twap(shifted, "k", "ts_ns", "px", "id").collect()}
    assert got_s == base
    # price scale by 10 (exact in cents): the scaled mean is exactly 10x,
    # so its floor lands in [10*floor(x), 10*floor(x) + 9] — floors do
    # not commute with scaling, the envelope is the invariant
    scaled = df.withColumn("px", F.col("px") * 10)
    got_p = {r["key"]: r["twap9"] for r in twap(scaled, "k", "ts_ns", "px", "id").collect()}
    for k, v in base.items():
        assert 10 * v <= got_p[k] <= 10 * v + 9, k


def test_markov_rows_partition_the_step_count(spark):
    rng = random.Random(80)
    rows = []
    for k in range(6):
        for i in range(rng.randrange(2, 30)):
            rows.append((k, i, rng.choice("abcde")))
    df = spark.createDataFrame(rows, "k int, o int, s string")
    out = transition_stats(df, "k", ["o"], "s").collect()
    # sum of n == total steps == total events - n_keys
    from collections import Counter

    per_key = Counter(r[0] for r in rows)
    assert sum(r["n"] for r in out) == sum(n - 1 for n in per_key.values())
    # n_from is consistent: per from_state, sum(n) == n_from everywhere
    by_from: dict = {}
    for r in out:
        by_from.setdefault(r["from_state"], []).append(r)
    for rows_f in by_from.values():
        tot = sum(r["n"] for r in rows_f)
        assert all(r["n_from"] == tot for r in rows_f)


def test_bpe_merges_invariant_under_corpus_row_order(spark):
    from brontes_spark.operators.bpe import bpe_train

    rng = random.Random(81)
    words = ["".join(rng.choice("abc") for _ in range(rng.randrange(1, 6)))
             for _ in range(60)]
    texts = [" ".join(rng.choice(words) for _ in range(25)) for _ in range(6)]
    df1 = spark.createDataFrame([(t,) for t in texts], "text string")
    df2 = spark.createDataFrame([(t,) for t in reversed(texts)], "text string").repartition(7)
    m1, _ = bpe_train(df1, 6)
    m2, _ = bpe_train(df2, 6)
    assert m1 == m2
