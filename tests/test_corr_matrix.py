"""One-pass correlation matrix: pairwise agreement with pearson_corr_xy,
single-aggregate plan shape, listwise NULL exclusion."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from brontes_spark.operators.ols import corr_matrix, pearson_corr_xy


def test_matches_pairwise_operator(spark):
    rng = random.Random(9)
    rows = [
        (rng.randrange(0, 50), rng.randrange(0, 80), rng.randrange(0, 30))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = {
        (r["col_a"], r["col_b"]): (r["n"], r["corr9"])
        for r in corr_matrix(df, ["a", "b", "c"]).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for x, y in got:
        one = df.withColumn("k", F.lit(1))
        [r] = pearson_corr_xy(one, "k", x, y).collect()
        assert got[(x, y)] == (r["n"], r["corr9"]), (x, y)


def test_listwise_null_exclusion_and_constant_column(spark):
    rows = [(1, 10, 7), (2, 20, 7), (3, None, 7), (4, 40, 7)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = {
        (r["col_a"], r["col_b"]): r for r in corr_matrix(df, ["a", "b", "c"]).collect()
    }
    # the NULL-b row drops from EVERY pair (listwise): n == 3 everywhere
    assert all(r["n"] == 3 for r in got.values())
    assert got[("a", "b")]["corr9"] == 1_000_000_000  # perfectly linear
    assert got[("a", "c")]["corr9"] is None  # zero variance in c


def test_single_aggregate_single_scan(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    out = corr_matrix(df, ["a", "b", "c"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "simple"
    )
    # ONE aggregate pair (partial+final), no join, one source scan
    assert plan.count("HashAggregate") == 2
    assert "Join" not in plan
