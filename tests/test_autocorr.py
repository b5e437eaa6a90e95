"""Lag-k autocorrelation: exact endpoints, Python-reference parity,
short-series NULLs."""

from __future__ import annotations

import math
import random

from brontes_spark.operators.ols import autocorr
import pytest


def _run(spark, series, lag=1):
    rows = [
        (k, i, x) for k, xs in series.items() for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "key string, t long, y long")
    return {
        r["key"]: r for r in autocorr(df, "key", ["t"], "y", lag).collect()
    }


def _ref(xs, lag):
    pairs = [(xs[i - lag], xs[i]) for i in range(lag, len(xs))]
    n = len(pairs)
    sx = sum(p[0] for p in pairs); sy = sum(p[1] for p in pairs)
    sxy = sum(a * b for a, b in pairs)
    sxx = sum(a * a for a, _ in pairs); syy = sum(b * b for _, b in pairs)
    d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
    if d1 <= 0 or d2 <= 0:
        return None
    return math.floor(1e9 * (n * sxy - sx * sy) / math.sqrt(d1 * d2))


@pytest.mark.slow
def test_exact_endpoints(spark):
    got = _run(spark, {
        "up": [1, 2, 3, 4, 5, 6],        # shifted copy: corr == 1
        "alt": [0, 1, 0, 1, 0, 1],       # anti-phase: corr == -1
        "flat": [7, 7, 7, 7],            # zero variance -> NULL
    })
    assert got["up"]["corr9"] == 1_000_000_000
    assert got["alt"]["corr9"] == -1_000_000_000
    assert got["flat"]["corr9"] is None
    assert got["up"]["n"] == 5  # 6 obs -> 5 lag-1 pairs


def test_matches_python_reference(spark):
    rng = random.Random(5)
    series = {
        f"k{j}": [rng.randrange(0, 500) for _ in range(60)] for j in range(6)
    }
    for lag in (1, 3):
        got = _run(spark, series, lag=lag)
        for k, xs in series.items():
            assert got[k]["corr9"] == _ref(xs, lag), (k, lag)
            assert got[k]["lag"] == lag


def test_short_series(spark):
    got = _run(spark, {"one": [5], "two": [5, 9], "three": [5, 9, 2]})
    assert "one" not in got          # zero pairs -> no row
    assert got["two"]["corr9"] is None   # 1 pair -> degenerate variance
    assert got["three"]["n"] == 2
