"""Chi-square independence + Cramér's V (operators/contingency.py)
against a brute-force quantized mirror and a hand-exact 2x2 case."""

from __future__ import annotations

import math
from collections import Counter


def _brute(pairs):
    cells = Counter(pairs)
    rt = Counter()
    ct = Counter()
    for (a, b), o in cells.items():
        rt[a] += o
        ct[b] += o
    n = sum(cells.values())
    chi2_9 = 0
    for (a, b), o in cells.items():
        det = o * n - rt[a] * ct[b]
        chi2_9 += (det * det * 1_000_000_000) // (n * rt[a] * ct[b])
    r, c = len(rt), len(ct)
    v = (
        math.sqrt((chi2_9 / 1e9) / (n * min(r - 1, c - 1)))
        if r > 1 and c > 1
        else None
    )
    return n, r, c, (r - 1) * (c - 1), chi2_9, v


def test_chi2_matches_bruteforce(spark):
    from brontes_spark.operators.contingency import chi2_independence

    pairs = (
        [("click", "mon")] * 30 + [("click", "tue")] * 10
        + [("view", "mon")] * 15 + [("view", "tue")] * 25
        + [("purchase", "mon")] * 5 + [("purchase", "tue")] * 15
    )
    df = spark.createDataFrame(pairs, "et string, dow string")
    row = chi2_independence(df, "et", "dow").collect()[0]
    n, r, c, dof, chi2_9, v = _brute(pairs)
    assert (row["n"], row["n_rows_cat"], row["n_cols_cat"], row["dof"]) == (
        n, r, c, dof,
    )
    assert row["chi2_9"] == chi2_9
    assert abs(row["cramers_v"] - v) < 1e-12


def test_chi2_independent_table_is_zero(spark):
    from brontes_spark.operators.contingency import chi2_independence

    # perfectly independent 2x2: O_ab = r_a * c_b / N exactly
    pairs = (
        [("x", "m")] * 20 + [("x", "t")] * 20
        + [("y", "m")] * 10 + [("y", "t")] * 10
    )
    df = spark.createDataFrame(pairs, "a string, b string")
    row = chi2_independence(df, "a", "b").collect()[0]
    assert row["chi2_9"] == 0
    assert row["cramers_v"] == 0.0


def test_chi2_degenerate_single_category(spark):
    from brontes_spark.operators.contingency import chi2_independence

    df = spark.createDataFrame(
        [("only", "m"), ("only", "t"), ("only", "m")], "a string, b string"
    )
    row = chi2_independence(df, "a", "b").collect()[0]
    assert row["n_rows_cat"] == 1 and row["dof"] == 0
    assert row["cramers_v"] is None
