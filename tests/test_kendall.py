"""Kendall tau-b (operators/kendall.py) against a brute-force pair-count
mirror, including the tie conventions and degenerate keys."""

from __future__ import annotations

import math


def _brute_tau_b(xs, ys):
    n = len(xs)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = (xs[i] > xs[j]) - (xs[i] < xs[j])
            sy = (ys[i] > ys[j]) - (ys[i] < ys[j])
            if sx == 0:
                tx += 1
            if sy == 0:
                ty += 1
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
    n0 = n * (n - 1) // 2
    if n0 - tx <= 0 or n0 - ty <= 0:
        return c, d, tx, ty, None
    return c, d, tx, ty, (c - d) / math.sqrt((n0 - tx) * (n0 - ty))


def test_tau_b_matches_bruteforce_with_ties(spark):
    from brontes_spark.operators.kendall import kendall_tau_b

    series = {
        "mono": ([1, 2, 3, 4, 5], [10, 20, 30, 40, 50]),       # tau = 1
        "anti": ([1, 2, 3, 4, 5], [50, 40, 30, 20, 10]),       # tau = -1
        "tied": ([1, 1, 2, 3, 3, 4], [2, 1, 1, 5, 5, 4]),      # x and y ties
        "dupes": ([1, 1, 2], [7, 7, 9]),                        # duplicate rows
        "noisy": ([3, 1, 4, 1, 5, 9, 2, 6], [2, 7, 1, 8, 2, 8, 1, 8]),
    }
    rows = [
        (k, float(x), float(y))
        for k, (xs, ys) in series.items()
        for x, y in zip(xs, ys)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {
        r["k"]: r
        for r in kendall_tau_b(df, "k", "x", "y").collect()
    }
    for k, (xs, ys) in series.items():
        c, d, tx, ty, tau = _brute_tau_b(xs, ys)
        r = got[k]
        assert (r["concordant"], r["discordant"], r["ties_x"], r["ties_y"]) == (
            c, d, tx, ty,
        ), k
        if tau is None:
            assert r["tau_b"] is None, k
        else:
            assert abs(r["tau_b"] - tau) < 1e-12, k
    assert got["mono"]["tau_b"] == 1.0
    assert got["anti"]["tau_b"] == -1.0


def test_tau_b_degenerate_keys_null(spark):
    from brontes_spark.operators.kendall import kendall_tau_b

    df = spark.createDataFrame(
        [("single", 1.0, 2.0), ("allx", 5.0, 1.0), ("allx", 5.0, 2.0),
         ("allx", 5.0, 3.0)],
        "k string, x double, y double",
    )
    got = {r["k"]: r for r in kendall_tau_b(df, "k", "x", "y").collect()}
    assert got["single"]["n"] == 1 and got["single"]["tau_b"] is None
    # all x tied: denominator zero -> NULL, counts still exact
    assert got["allx"]["ties_x"] == 3 and got["allx"]["tau_b"] is None
