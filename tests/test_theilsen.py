"""Theil-Sen robust slope (operators/theilsen.py): hand-computed pair
medians (odd/even counts, negative slopes, x-ties excluded), robustness
to one outlier, and the truncating-division sign convention."""

from __future__ import annotations

from brontes_spark.operators.theilsen import theil_sen_slope

DDL = "k string, x long, y long"


def test_odd_pair_median(spark):
    # x: 0,1,2 / y: 0,10,18 -> slopes 10/1, 8/1, 18/2=9 -> median 9
    rows = [("u", 0, 0), ("u", 1, 10), ("u", 2, 18)]
    out = theil_sen_slope(spark.createDataFrame(rows, DDL), "k", "x", "y").collect()[0]
    assert out["n_pairs"] == 3
    assert out["slope_9"] == 9_000_000_000
    assert (out["num_lo"], out["den_lo"]) == (out["num_hi"], out["den_hi"]) == (18, 2)


def test_even_pair_mean_of_middles(spark):
    # x: 0,1,2,4 / y: 0,2,10,12
    # slopes: (0,1):2, (0,2):5, (0,4):3, (1,2):8, (1,4):10/3, (2,4):1
    # sorted: 1, 2, 3, 10/3, 5, 8 -> middles 3 and 10/3 -> mean 19/6
    rows = [("u", 0, 0), ("u", 1, 2), ("u", 2, 10), ("u", 4, 12)]
    out = theil_sen_slope(spark.createDataFrame(rows, DDL), "k", "x", "y").collect()[0]
    assert out["n_pairs"] == 6
    assert out["slope_9"] == 19_000_000_000 // 6  # 3.1666... truncated


def test_negative_slope_truncates_toward_zero(spark):
    # two points, slope -5/3 -> -1.6666... -> truncation gives -1666666666
    rows = [("u", 0, 5), ("u", 3, 0)]
    out = theil_sen_slope(spark.createDataFrame(rows, DDL), "k", "x", "y").collect()[0]
    assert out["slope_9"] == -1_666_666_666


def test_x_ties_excluded_and_outlier_robust(spark):
    # duplicate x -> that pair is excluded entirely
    rows = [("u", 0, 0), ("u", 0, 100), ("u", 1, 10)]
    out = theil_sen_slope(spark.createDataFrame(rows, DDL), "k", "x", "y").collect()[0]
    assert out["n_pairs"] == 2  # (0,1) twice; the (0,0) x-tie pair dropped
    # one wild outlier barely moves the median (robustness vs OLS)
    clean = [("u", x, 10 * x) for x in range(9)]
    out = theil_sen_slope(
        spark.createDataFrame(clean + [("u", 9, 100000)], DDL), "k", "x", "y"
    ).collect()[0]
    assert out["slope_9"] == 10_000_000_000


def test_keys_without_pairs_emit_nothing(spark):
    rows = [("solo", 1, 1), ("dup", 2, 3), ("dup", 2, 9)]
    out = theil_sen_slope(spark.createDataFrame(rows, DDL), "k", "x", "y")
    assert out.count() == 0
