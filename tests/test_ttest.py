"""Welch t / one-way ANOVA (operators/ttest.py): known-value goldens
computed by an independent pure-Python mirror of the same IEEE double
chain, plus symmetry/degeneracy invariants."""

from __future__ import annotations

import math

from brontes_spark.operators.ttest import anova_oneway, welch_ttest

DDL = "g string, v long"


def _welch_py(a, b):
    na, nb = len(a), len(b)
    sa, sb = sum(a), sum(b)
    qa, qb = sum(x * x for x in a), sum(x * x for x in b)
    va = (na * float(qa) - float(sa) * sa) / (na * (na - 1.0) * na)
    vb = (nb * float(qb) - float(sb) * sb) / (nb * (nb - 1.0) * nb)
    t = (float(sa) / na - float(sb) / nb) / math.sqrt(va + vb)
    df = ((va + vb) * (va + vb)) / ((va * va) / (na - 1.0) + (vb * vb) / (nb - 1.0))
    return math.floor(1e9 * t), math.floor(1e9 * df)


def test_welch_matches_python_mirror(spark):
    a = [120, 135, 150, 160, 145, 170, 155]
    b = [100, 110, 90, 105, 115]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [("c", 999), ("a", None)]
    out = welch_ttest(spark.createDataFrame(rows, DDL), "g", "v", "a", "b").collect()[0]
    t9, df9 = _welch_py(a, b)
    assert (out["n_a"], out["n_b"]) == (7, 5)
    assert out["sum_a"] == sum(a) and out["sumsq_b"] == sum(v * v for v in b)
    assert out["t_9"] == t9
    assert out["df_9"] == df9
    assert out["t_9"] > 0  # group a is clearly larger


def test_welch_symmetry_and_degenerate(spark):
    a = [10, 20, 30]
    b = [30, 20, 10]  # identical multisets -> t == 0 exactly
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    out = welch_ttest(spark.createDataFrame(rows, DDL), "g", "v", "a", "b").collect()[0]
    assert out["t_9"] == 0
    # n_b == 1 -> NULL t/df
    rows = [("a", v) for v in a] + [("b", 5)]
    out = welch_ttest(spark.createDataFrame(rows, DDL), "g", "v", "a", "b").collect()[0]
    assert out["t_9"] is None and out["df_9"] is None
    # zero combined variance (all values equal) -> NULL, not div-by-zero
    rows = [("a", 7), ("a", 7), ("b", 7), ("b", 7)]
    out = welch_ttest(spark.createDataFrame(rows, DDL), "g", "v", "a", "b").collect()[0]
    assert out["t_9"] is None


def test_anova_known_values(spark):
    # groups with exact decimal-friendly sums: n=2 each, clean floors
    rows = [("a", 10), ("a", 20), ("b", 30), ("b", 40), ("c", 50), ("c", 60)]
    out = anova_oneway(spark.createDataFrame(rows, DDL), "g", "v").collect()[0]
    # exact: S=210, N=6, Q=9100; per-group s^2*1e3/n:
    # a: 900e3/2=450e3, b: 4900e3/2=2450e3, c: 12100e3/2=6050e3 -> 8950e3
    # SSB_3 = 8950e3 - 44100e3/6(=7350e3) = 1600e3; SSW_3 = 9100e3-8950e3=150e3
    assert (out["k"], out["n"]) == (3, 6)
    assert out["ssb_3"] == 1_600_000
    assert out["ssw_3"] == 150_000
    # F = (1600/2)/(150/3) = 16 -> f_9 = 16e9
    assert out["f_9"] == 16_000_000_000


def test_anova_degenerate(spark):
    out = anova_oneway(
        spark.createDataFrame([("a", 1), ("a", 2)], DDL), "g", "v"
    ).collect()[0]
    assert out["f_9"] is None  # k < 2
    out = anova_oneway(
        spark.createDataFrame([("a", 5), ("b", 5)], DDL), "g", "v"
    ).collect()[0]
    assert out["f_9"] is None  # n == k


def _z_py(na, xa, nb, xb):
    import math

    p = float(xa + xb) / (na + nb)
    return math.floor(
        1e9 * (float(xa) / na - float(xb) / nb)
        / math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    )


def test_two_proportion_z_matches_python_mirror(spark):
    from brontes_spark.operators.ttest import two_proportion_ztest

    rows = []
    # arm a: 6 units, 4 convert (one unit has DUPLICATE converting rows —
    # must not double count); arm b: 5 units, 1 converts
    for u in range(6):
        rows.append((f"a{u}", "a", u < 4))
    rows.append(("a0", "a", True))  # duplicate event for a converting unit
    rows.append(("a5", "a", False))
    for u in range(5):
        rows.append((f"b{u}", "b", u < 1))
    df = spark.createDataFrame(rows, "unit string, arm string, conv boolean")
    out = two_proportion_ztest(df, "unit", "arm", "conv", "a", "b").collect()[0]
    assert (out["n_a"], out["x_a"], out["n_b"], out["x_b"]) == (6, 4, 5, 1)
    assert out["z_9"] == _z_py(6, 4, 5, 1)
    assert out["z_9"] > 0


def test_two_proportion_z_degenerate(spark):
    from brontes_spark.operators.ttest import two_proportion_ztest

    # all convert -> pooled rate 1 -> zero variance -> NULL
    df = spark.createDataFrame(
        [("u1", "a", True), ("u2", "b", True)], "unit string, arm string, conv boolean"
    )
    out = two_proportion_ztest(df, "unit", "arm", "conv", "a", "b").collect()[0]
    assert out["z_9"] is None
