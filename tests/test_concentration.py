"""Gini + HHI (operators/concentration.py) against brute-force quantized
mirrors and the closed-form extremes."""

from __future__ import annotations


def _brute(values):
    xs = sorted(values)
    n = len(xs)
    t = sum(xs)
    if t == 0:
        return n, t, None, None
    si = sum((i + 1) * x for i, x in enumerate(xs))
    s2 = sum(x * x for x in xs)
    gini_9 = (10**9 * (2 * si - (n + 1) * t)) // (n * t)
    hhi_9 = (10**9 * s2) // (t * t)
    return n, t, gini_9, hhi_9


def test_concentration_matches_bruteforce(spark):
    from brontes_spark.operators.concentration import group_concentration

    groups = {
        "equal": [10, 10, 10, 10],            # gini 0, hhi = 1/4
        "onehot": [0, 0, 0, 100],             # max concentration
        "mixed": [1, 2, 3, 4, 5, 30],
        "ties": [5, 5, 10, 10, 10, 60],       # tie-rank invariance
        "single": [42],
        "zeros": [0, 0, 0],                   # degenerate: NULL metrics
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r["g"]: r for r in group_concentration(df, "g", "x").collect()}
    for g, vs in groups.items():
        n, t, gini_9, hhi_9 = _brute(vs)
        r = got[g]
        assert (r["n"], r["total"]) == (n, t), g
        assert r["gini_9"] == gini_9, g
        assert r["hhi_9"] == hhi_9, g
    assert got["equal"]["gini_9"] == 0
    assert got["equal"]["hhi_9"] == 250_000_000  # 1/4
    # one-hot: gini = (n-1)/n = 3/4, hhi = 1
    assert got["onehot"]["gini_9"] == 750_000_000
    assert got["onehot"]["hhi_9"] == 10**9
    assert got["zeros"]["gini_9"] is None and got["zeros"]["hhi_9"] is None


def test_tie_rank_invariance_under_repartition(spark):
    """Equal values may receive ranks in any order; SI and therefore
    gini_9 must not depend on it — checked by comparing across different
    input partitionings."""
    from brontes_spark.operators.concentration import group_concentration

    rows = [("g", v) for v in [7, 7, 7, 7, 13, 13, 1]]
    df1 = spark.createDataFrame(rows, "g string, x long")
    df2 = df1.repartition(7)
    r1 = group_concentration(df1, "g", "x").collect()[0]
    r2 = group_concentration(df2, "g", "x").collect()[0]
    assert (r1["gini_9"], r1["hhi_9"]) == (r2["gini_9"], r2["hhi_9"])
    assert r1["gini_9"] == _brute([7, 7, 7, 7, 13, 13, 1])[2]
