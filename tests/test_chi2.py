"""Chi-squared feature selection: hand-computed 2x2 golds, degenerate
exclusions, presence (not frequency) semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.operators.chi2 import chi2_topk_terms


def _run(spark, rows, k=10):
    df = spark.createDataFrame(rows, "cls string, text string")
    out = chi2_topk_terms(df, "cls", F.split(F.col("text"), " "), k=k)
    return {(r["class"], r["term"]): r for r in out.collect()}


def test_hand_contingency(spark):
    got = _run(
        spark,
        [("A", "x y"), ("A", "x z"), ("B", "y z"), ("B", "z w")],
    )
    # x: perfect predictor of A -> chi2 == N == 4
    assert got[("A", "x")]["chi2_9"] == 4_000_000_000
    assert (got[("A", "x")]["a"], got[("A", "x")]["df"]) == (2, 2)
    # y: split evenly -> det 0
    assert got[("A", "y")]["chi2_9"] == 0
    # z: df=3, a=1 -> chi2 = 16/12
    assert got[("A", "z")]["chi2_9"] == 1_333_333_333
    # only terms PRESENT in a class are scored (a >= 1): w never occurs
    # in an A doc, so its negative association surfaces via the B row
    assert ("A", "w") not in got
    assert got[("B", "w")]["chi2_9"] == 1_333_333_333
    # ranking inside class A: x first
    assert got[("A", "x")]["rank"] == 1


def test_term_in_every_doc_excluded(spark):
    got = _run(spark, [("A", "u x"), ("B", "u y")])
    assert ("A", "u") not in got and ("B", "u") not in got
    assert ("A", "x") in got


def test_presence_semantics_ignore_repeats(spark):
    # "x x x" counts once per doc: same table as a single "x"
    a = _run(spark, [("A", "x x x y"), ("B", "y z")])
    b = _run(spark, [("A", "x y"), ("B", "y z")])
    assert a[("A", "x")]["chi2_9"] == b[("A", "x")]["chi2_9"]
    assert a[("A", "x")]["df"] == 1


def test_single_class_degenerate_is_empty(spark):
    # n_class == N for every stratum -> den == 0 everywhere -> empty
    got = _run(spark, [("A", "x y"), ("A", "y z")])
    assert got == {}
