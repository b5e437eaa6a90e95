"""ols_trend (operators/ols.py) vs a Fraction-exact Python reference:
closed-form parity on seeded random series, perfect-line exactness,
negative-slope floors, degenerate keys, and the t_unit grain dial."""

from __future__ import annotations

import random
from fractions import Fraction
from math import floor

from brontes_spark.operators.ols import ols_trend


def _ref(points: list[tuple[int, int]], unit: int = 1):
    ts = [t // unit for t, _ in points]
    ys = [y for _, y in points]
    t0 = min(ts)
    ts = [t - t0 for t in ts]
    n = len(points)
    st, sy = sum(ts), sum(ys)
    sty = sum(t * y for t, y in zip(ts, ys))
    stt = sum(t * t for t in ts)
    den = n * stt - st * st
    if den == 0:
        return (n, max(ts), None, None)
    b = Fraction(n * sty - st * sy, den)
    a = (Fraction(sy, 1) - b * st) / n
    return (n, max(ts), floor(b * 10**9), floor(a * 10**9))


def _got(df):
    return {
        r[0]: tuple(r)[1:]
        for r in df.select("k", "n", "t_span", "slope9", "intercept9").collect()
    }


def test_perfect_line_is_exact(spark):
    rows = [(1, i * 10, 500 + 3 * i) for i in range(20)]
    df = spark.createDataFrame(rows, "k int, ts long, y long")
    got = _got(ols_trend(df, "k", "ts", "y", t_unit=10))
    # slope 3 per grain, intercept 500, both exactly representable
    assert got[1] == (20, 19, 3 * 10**9, 500 * 10**9)


def test_matches_fraction_reference_random(spark):
    rng = random.Random(13)
    rows, ref = [], {}
    for k in range(8):
        pts = []
        t = rng.randrange(10**6)
        for _ in range(rng.randrange(2, 40)):
            t += rng.randrange(1, 10**4)
            y = rng.randrange(-(10**5), 10**5)  # negative ordinates too
            pts.append((t, y))
            rows.append((k, t, y))
        ref[k] = _ref(pts)
    df = spark.createDataFrame(rows, "k int, ts long, y long")
    got = _got(ols_trend(df, "k", "ts", "y"))
    for k, want in ref.items():
        assert got[k] == want[0:4], k


def test_negative_slope_floors_toward_minus_inf(spark):
    # t=(0,1,3), y=(1,0,0): b = -2/7 -> slope9 = floor(-285714285.71...)
    # = -285714286, NOT the truncation -285714285 (both engines' integer
    # division truncates; the operator floor-adjusts)
    rows = [(1, 0, 1), (1, 1, 0), (1, 3, 0)]
    df = spark.createDataFrame(rows, "k int, ts long, y long")
    got = _got(ols_trend(df, "k", "ts", "y"))
    assert got[1][2] == -285714286


def test_degenerate_keys_yield_null(spark):
    rows = [(1, 5, 10), (1, 5, 20), (2, 7, 3)]
    df = spark.createDataFrame(rows, "k int, ts long, y long")
    got = _got(ols_trend(df, "k", "ts", "y"))
    assert got[1] == (2, 0, None, None)
    assert got[2] == (1, 0, None, None)


def test_t_unit_coarsens_grain(spark):
    # same data at unit=1 vs unit=1000: slope in y-per-grain scales by
    # the grain ratio (exactly, for a perfect line)
    rows = [(1, i * 1000, 7 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "k int, ts long, y long")
    fine = _got(ols_trend(df, "k", "ts", "y", t_unit=1))[1]
    coarse = _got(ols_trend(df, "k", "ts", "y", t_unit=1000))[1]
    assert fine[2] * 1000 == coarse[2]
    assert fine[3] == coarse[3]  # same intercept at the rebased origin


def test_rebasing_makes_epoch_scale_safe(spark):
    # epoch-nanosecond abscissas with second grain: raw sums of t*t would
    # overflow int64 without the per-key re-base; the operator must not
    base = 1_700_000_000_000_000_000
    rows = [(1, base + i * 10**9, 100 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "k int, ts long, y long")
    got = _got(ols_trend(df, "k", "ts", "y", t_unit=10**9))
    assert got[1] == (50, 49, 10**9, 100 * 10**9)


# ------------------------------------------------------------- pearson


def test_pearson_perfect_lines_and_constant(spark):
    from brontes_spark.operators.ols import pearson_corr

    rows = [(1, i, 3 * i + 5) for i in range(10)]
    rows += [(2, i, -2 * i + 100) for i in range(10)]
    rows += [(3, i, 7) for i in range(5)]
    df = spark.createDataFrame(rows, "k int, ts long, y long")
    got = {r["k"]: r["corr9"] for r in pearson_corr(df, "k", "ts", "y").collect()}
    assert got[1] == 10**9
    assert got[2] == -(10**9)
    assert got[3] is None


def test_pearson_matches_python_reference(spark):
    import math
    import random

    from brontes_spark.operators.ols import pearson_corr

    rng = random.Random(17)
    rows, ref = [], {}
    for k in range(6):
        pts = [(t, rng.randrange(-1000, 1000)) for t in range(rng.randrange(3, 40))]
        rows += [(k, t, y) for t, y in pts]
        n = len(pts)
        st = sum(t for t, _ in pts); sy = sum(y for _, y in pts)
        sty = sum(t * y for t, y in pts)
        stt = sum(t * t for t, _ in pts); syy = sum(y * y for _, y in pts)
        num, d1, d2 = n * sty - st * sy, n * stt - st * st, n * syy - sy * sy
        ref[k] = (
            math.floor(1e9 * float(num) / math.sqrt(float(d1) * float(d2)))
            if d1 > 0 and d2 > 0 else None
        )
    df = spark.createDataFrame(rows, "k int, ts long, y long")
    got = {r["k"]: r["corr9"] for r in pearson_corr(df, "k", "ts", "y").collect()}
    assert got == ref


def test_pearson_bounded(spark):
    import random

    from brontes_spark.operators.ols import pearson_corr

    rng = random.Random(18)
    rows = [(k, t, rng.randrange(10**6)) for k in range(4) for t in range(50)]
    df = spark.createDataFrame(rows, "k int, ts long, y long")
    for r in pearson_corr(df, "k", "ts", "y").collect():
        assert -(10**9) <= r["corr9"] <= 10**9
