"""Mann-Whitney U: hand golds with ties, scipy-free reference parity,
U_A + U_B identity, separation endpoints."""

from __future__ import annotations

import random

from brontes_spark.operators.mannwhitney import mann_whitney_u


def _run(spark, a_vals, b_vals):
    rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = mann_whitney_u(df, "g", "v", "A", "B").collect()
    return r


def _u2_ref(a_vals, b_vals):
    # direct pairwise definition: U_A = #(a>b) + 0.5*#(a==b), doubled
    u2 = 0
    for a in a_vals:
        for b in b_vals:
            u2 += 2 if a > b else (1 if a == b else 0)
    return u2


def test_hand_gold_with_ties(spark):
    a, b = [3, 5, 5, 9], [1, 5, 7]
    r = _run(spark, a, b)
    assert (r["n_a"], r["n_b"]) == (4, 3)
    assert r["u2_a"] == _u2_ref(a, b)
    assert r["u2_a"] + r["u2_b"] == 2 * 4 * 3


def test_random_matches_pairwise_reference(spark):
    rng = random.Random(21)
    for trial in range(3):
        a = [rng.randrange(0, 20) for _ in range(40)]
        b = [rng.randrange(5, 25) for _ in range(30)]
        r = _run(spark, a, b)
        assert r["u2_a"] == _u2_ref(a, b), trial
        assert r["u2_b"] == _u2_ref(b, a), trial


def test_complete_separation_endpoints(spark):
    r = _run(spark, [10, 11, 12], [1, 2])
    # A dominates completely: U_A = n_a*n_b, rb = +1
    assert r["u2_a"] == 2 * 3 * 2
    assert r["rb_9"] == 1_000_000_000
    r = _run(spark, [1, 2], [10, 11, 12])
    assert r["u2_a"] == 0 and r["rb_9"] == -1_000_000_000


def test_identical_distributions_zero_effect(spark):
    r = _run(spark, [1, 2, 3], [1, 2, 3])
    assert r["u2_a"] == r["u2_b"] and r["rb_9"] == 0


def _ks(spark, a_vals, b_vals):
    from brontes_spark.operators.mannwhitney import ks_two_sample

    rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = ks_two_sample(df, "g", "v", "A", "B").collect()
    return r


def _ks_ref(a_vals, b_vals):
    # direct ECDF-gap definition over the union of values
    na, nb = len(a_vals), len(b_vals)
    best = 0
    for v in sorted(set(a_vals) | set(b_vals)):
        ca = sum(1 for x in a_vals if x <= v)
        cb = sum(1 for x in b_vals if x <= v)
        best = max(best, abs(ca * nb - cb * na))
    return best


def test_ks_hand_and_reference(spark):
    a, b = [1, 2, 3, 9], [2, 5, 6]
    r = _ks(spark, a, b)
    assert r["d_num"] == _ks_ref(a, b)
    assert r["d_9"] == r["d_num"] * 10**9 // (4 * 3)
    rng = random.Random(33)
    a = [rng.randrange(0, 15) for _ in range(25)]
    b = [rng.randrange(3, 18) for _ in range(35)]
    assert _ks(spark, a, b)["d_num"] == _ks_ref(a, b)


def test_ks_endpoints(spark):
    # disjoint supports: D = 1
    r = _ks(spark, [1, 2], [10, 11])
    assert r["d_9"] == 1_000_000_000
    # identical samples: D = 0
    r = _ks(spark, [1, 2, 3], [1, 2, 3])
    assert r["d_num"] == 0 and r["d_9"] == 0


def _spearman(spark, pairs):
    from brontes_spark.operators.mannwhitney import spearman_corr

    df = spark.createDataFrame(pairs, "x long, y long")
    [r] = spearman_corr(df, "x", "y").collect()
    return r


def test_spearman_monotonic_nonlinear_is_one(spark):
    # y = x^3 is nonlinear but perfectly monotonic: rho == 1, while
    # Pearson would be < 1 — the reason Spearman exists
    pairs = [(x, x**3) for x in range(1, 20)]
    r = _spearman(spark, pairs)
    assert r["rho9"] == 1_000_000_000
    r = _spearman(spark, [(x, -(x**3)) for x in range(1, 20)])
    assert r["rho9"] == -1_000_000_000


def test_spearman_ties_match_scipy_formula(spark):
    # hand case with ties in both columns; reference via plain Pearson
    # on fractional midranks computed independently
    import math

    pairs = [(1, 5), (2, 5), (2, 7), (3, 7), (3, 7), (4, 1)]

    def midranks(vals):
        out = {}
        s = 1
        for v in sorted(set(vals)):
            c = vals.count(v)
            out[v] = s + (c - 1) / 2
            s += c
        return [out[v] for v in vals]

    xs = midranks([p[0] for p in pairs])
    ys = midranks([p[1] for p in pairs])
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    r = _spearman(spark, pairs)
    assert r["n"] == n
    assert abs(r["rho9"] / 1e9 - rho) < 2e-9
