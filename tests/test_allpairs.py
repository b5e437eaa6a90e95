"""Exact set-similarity join (operators/allpairs.py): brute-force property
parity over seeded random corpora, exact threshold-boundary inclusion, and
the lossless-pruning claim under skewed token frequencies."""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from pyspark.sql import functions as F

from brontes_spark.functions.text import ws_tokens
from brontes_spark.operators.allpairs import jaccard_similarity_join


def _brute(rows, num, den):
    sets = {i: set(t.lower().split()) for i, t in rows}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * den >= num * union:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


def _got(spark, rows, num, den):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = jaccard_similarity_join(df, "doc_id", ws_tokens(F.col("text")), None, num=num, den=den)
    return {(r.id_a, r.id_b): (r.inter, r.sz_a, r.sz_b) for r in res.collect()}


@pytest.mark.parametrize("num,den", [(1, 10), (1, 2), (4, 5)])
def test_matches_brute_force(spark, num, den):
    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(80)]
    rows = [
        (i, " ".join(rng.sample(vocab, rng.randrange(3, 25)))) for i in range(70)
    ]
    assert _got(spark, rows, num, den) == _brute(rows, num, den)


def test_threshold_boundary_exact(spark):
    # "a b" vs "a c": inter=1, union=3 -> jaccard exactly 1/3
    rows = [(1, "a b"), (2, "a c")]
    assert _got(spark, rows, 1, 3) == {(1, 2): (1, 2, 2)}  # >= inclusive AT 1/3
    assert _got(spark, rows, 1, 2) == {}                   # 1/3 < 1/2
    # "a" vs "a b": inter=1, union=2 -> exactly 1/2
    rows2 = [(1, "a"), (2, "a b")]
    assert _got(spark, rows2, 1, 2) == {(1, 2): (1, 1, 2)}
    assert _got(spark, rows2, 51, 100) == {}


def test_skewed_df_no_false_negatives(spark):
    # one stopword in EVERY doc (its posting list is the longest — the
    # prefix rule must keep correctness while mostly not indexing it)
    rng = random.Random(7)
    rows = [(i, "the " + " ".join(f"t{rng.randrange(40)}" for _ in range(6)))
            for i in range(50)]
    num, den = 1, 3
    assert _got(spark, rows, num, den) == _brute(rows, num, den)


def test_identical_docs_and_self_exclusion(spark):
    rows = [(1, "x y z"), (2, "x y z"), (3, "q")]
    got = _got(spark, rows, 9, 10)
    assert got == {(1, 2): (3, 3, 3)}


def test_jaccard_value_column(spark):
    rows = [(1, "a b c d"), (2, "a b c e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = jaccard_similarity_join(df, "doc_id", ws_tokens(F.col("text")), Fraction(1, 2)).collect()[0]
    assert r.jaccard == pytest.approx(3 / 5)
