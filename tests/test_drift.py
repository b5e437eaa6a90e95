"""TV-distance corpus drift (operators/drift.py): exact-integer parity
with a Python reference, identical-corpus zero, disjoint-corpus one,
keyed groups, and the empty-side guard."""

from __future__ import annotations

from fractions import Fraction

from brontes_spark.operators.drift import token_counts, tv_drift


def _py_tv(a_tokens, b_tokens):
    from collections import Counter
    a, b = Counter(a_tokens), Counter(b_tokens)
    na, nb = sum(a.values()), sum(b.values())
    num = sum(abs(a.get(t, 0) * nb - b.get(t, 0) * na) for t in set(a) | set(b))
    return num, Fraction(num, 2 * na * nb)


def _counts(spark, rows):
    df = spark.createDataFrame(rows, "k string, text string")
    return token_counts(df, "text", ["k"])


def test_matches_python_reference(spark):
    a_rows = [("g", "a b b c d d d")]
    b_rows = [("g", "a a b e")]
    out = tv_drift(_counts(spark, a_rows), _counts(spark, b_rows), ["k"]).collect()[0]
    num, frac = _py_tv("a b b c d d d".split(), "a a b e".split())
    assert int(out.tv_num) == num
    assert out.tv == float(frac)


def test_identical_zero_disjoint_one(spark):
    same = [("g", "x y z x")]
    out = tv_drift(_counts(spark, same), _counts(spark, same), ["k"]).collect()[0]
    assert int(out.tv_num) == 0 and out.tv == 0.0
    dis = tv_drift(
        _counts(spark, [("g", "a a b")]), _counts(spark, [("g", "c d")]), ["k"]
    ).collect()[0]
    assert dis.tv == 1.0


def test_groups_independent_and_empty_side_dropped(spark):
    a = _counts(spark, [("g1", "a b"), ("g2", "x x")])
    b = _counts(spark, [("g1", "a b")])  # g2 missing on side b
    rows = {r.k: r for r in tv_drift(a, b, ["k"]).collect()}
    assert set(rows) == {"g1"}  # g2 dropped loudly, not scored 1.0
    assert rows["g1"].tv == 0.0


def test_global_ungrouped(spark):
    a = _counts(spark, [("g", "p q q")]).drop("k")
    b = _counts(spark, [("g", "p p q")]).drop("k")
    out = tv_drift(a, b).collect()[0]
    _, frac = _py_tv("p q q".split(), "p p q".split())
    assert out.tv == float(frac)
