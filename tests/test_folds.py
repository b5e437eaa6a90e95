"""Fold assignment: group atomicity (the leakage invariant), seed
sensitivity, determinism across runs, NULL handling, report counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.operators.folds import fold_report, with_fold


def _df(spark, n_groups=50, rows_per=4):
    rows = [
        (g, i, "c%d" % (g % 3))
        for g in range(n_groups)
        for i in range(rows_per)
    ]
    return spark.createDataFrame(rows, "grp long, i long, cls string")


def test_group_atomicity_and_determinism(spark):
    df = _df(spark)
    a = with_fold(df, "grp", 5)
    per_group = (
        a.groupBy("grp").agg(F.countDistinct("fold").alias("nf")).collect()
    )
    assert all(r["nf"] == 1 for r in per_group)  # no group spans folds
    # identical across independent invocations (pure function of the key)
    b = {r["grp"]: r["fold"] for r in with_fold(df, "grp", 5).select("grp", "fold").distinct().collect()}
    a_map = {r["grp"]: r["fold"] for r in a.select("grp", "fold").distinct().collect()}
    assert a_map == b
    assert set(a_map.values()) == set(range(5))  # all folds populated


def test_seed_changes_the_split(spark):
    df = _df(spark)
    s0 = {r["grp"]: r["fold"] for r in with_fold(df, "grp", 5, seed=0).select("grp", "fold").distinct().collect()}
    s1 = {r["grp"]: r["fold"] for r in with_fold(df, "grp", 5, seed=1).select("grp", "fold").distinct().collect()}
    assert s0 != s1


def test_null_group_gets_null_fold(spark):
    df = spark.createDataFrame([(None, 1, "c")], "grp long, i long, cls string")
    [r] = with_fold(df, "grp", 3).collect()
    assert r["fold"] is None


def test_report_counts(spark):
    df = _df(spark, n_groups=10, rows_per=3)
    rep = fold_report(df, "grp", "cls", k=5)
    total_rows = sum(r["n_rows"] for r in rep.collect())
    assert total_rows == 30
    # groups per fold sum to 10 counting each group once per class it has
    folded = with_fold(df, "grp", 5)
    want = folded.select("grp", "fold").distinct().count()
    assert want == 10
