"""Seeded randomized sweeps (the repo's Spark-side property idiom) for the
round-8 exact-rational operators: BM25 score9, percentile_cont, and TV
drift against fractions.Fraction / pure-Python references over random
corpora — the fixed-fixture unit tests sample one point; these sweep the
arithmetic across shapes (skewed dfs, tiny docs, repeated values, ties)."""

from __future__ import annotations

import random
from fractions import Fraction

from pyspark.sql import functions as F

from brontes_spark.operators.bm25 import bm25_scores
from brontes_spark.operators.drift import token_counts, tv_drift
from brontes_spark.operators.sketches import percentiles_cont


def test_bm25_score9_random_sweep(spark):
    rng = random.Random(211)
    for _ in range(3):
        vocab = [f"w{i}" for i in range(rng.randrange(4, 12))]
        docs = [
            (i, " ".join(rng.choices(vocab, k=rng.randrange(0, 25))))
            for i in range(rng.randrange(5, 20))
        ]
        queries = [(qi, t) for qi, t in enumerate(rng.sample(vocab, 3))]
        toks = {i: t.split() for i, t in docs}
        n = len(docs)
        total = sum(len(v) for v in toks.values())
        df_ = {}
        for ts in toks.values():
            for t in set(ts):
                df_[t] = df_.get(t, 0) + 1
        want = {}
        for qi, term in queries:
            for d, ts in toks.items():
                tf = ts.count(term)
                if not tf:
                    continue
                c = Fraction(
                    44 * tf * total * (2 * n - 2 * df_[term] + 1),
                    (20 * tf * total + 6 * total + 18 * len(ts) * n)
                    * (2 * df_[term] + 1),
                )
                key = (qi, d)
                want[key] = want.get(key, 0) + (c * 10**9).__floor__()
        got = {
            (r.query_id, r.doc_id): int(r.score9)
            for r in bm25_scores(
                spark.createDataFrame(docs, "doc_id long, text string"),
                spark.createDataFrame(queries, "query_id long, term string"),
                "doc_id", "text",
            ).collect()
        }
        assert got == want


def test_percentiles_cont_random_sweep(spark):
    # reference in EXACT Fraction arithmetic — numpy's percentile computes
    # the position q*(n-1) in floats and lands 1 ulp off the true
    # interpolation on e.g. q=2/3 (verified: the operator's single-division
    # value is the correctly-rounded one, numpy's is not)
    rng = random.Random(431)
    for _ in range(3):
        vals = [rng.randrange(-50, 5000) for _ in range(rng.randrange(3, 200))]
        # duplicates on purpose: ties exercise the bracketing ranks
        vals += vals[: rng.randrange(0, len(vals))]
        qs = [(1, 7), (2, 3), (1, 2), (99, 100)]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        rows = {(r.q_num, r.q_den): r.value_cont
                for r in percentiles_cont(df, "v", qs).collect()}
        sv = sorted(vals)
        n = len(sv)
        for nu, d in qs:
            p = Fraction(nu * (n - 1), d)
            lo = p.__floor__()
            w = p - lo
            want = float(sv[lo] * (1 - w) + sv[min(lo + 1, n - 1)] * w)
            assert rows[(nu, d)] == want, (nu, d, n)


def test_tv_drift_random_sweep(spark):
    rng = random.Random(613)
    for _ in range(3):
        vocab = [f"t{i}" for i in range(rng.randrange(3, 10))]
        a_txt = " ".join(rng.choices(vocab, k=rng.randrange(1, 60)))
        b_txt = " ".join(rng.choices(vocab, k=rng.randrange(1, 60)))
        a = token_counts(
            spark.createDataFrame([("g", a_txt)], "k string, text string"),
            "text", ["k"],
        )
        b = token_counts(
            spark.createDataFrame([("g", b_txt)], "k string, text string"),
            "text", ["k"],
        )
        got = tv_drift(a, b, ["k"]).collect()[0]
        from collections import Counter
        ca, cb = Counter(a_txt.split()), Counter(b_txt.split())
        na, nb = sum(ca.values()), sum(cb.values())
        num = sum(abs(ca.get(t, 0) * nb - cb.get(t, 0) * na)
                  for t in set(ca) | set(cb))
        assert int(got.tv_num) == num
        assert got.tv == float(Fraction(num, 2 * na * nb))
