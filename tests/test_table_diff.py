"""table_diff / diff_counts (operators/table_diff.py): all four statuses,
NULL-safe semantics, changed_cols ordering, column auto-selection, and
count consistency with the detail output."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.operators.table_diff import diff_counts, table_diff

DDL = "id long, a string, b long"


def _mk(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _got(df):
    return {r["id"]: (r["status"], r["changed_cols"]) for r in df.collect()}


def test_all_statuses(spark):
    old = _mk(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _mk(spark, [(1, "x", 10), (2, "y", 99), (4, "w", 40)])
    got = _got(table_diff(old, new, ["id"]))
    assert got == {
        2: ("changed", "b"),
        3: ("removed", ""),
        4: ("added", ""),
    }  # id 1 unchanged: absent


def test_null_safe_comparison(spark):
    old = _mk(spark, [(1, None, 10), (2, "y", None), (3, None, None)])
    new = _mk(spark, [(1, "x", 10), (2, "y", 5), (3, None, None)])
    got = _got(table_diff(old, new, ["id"]))
    # NULL->value and value->NULL are changes; NULL->NULL is not
    assert got == {1: ("changed", "a"), 2: ("changed", "b")}


def test_changed_cols_schema_ordered(spark):
    old = _mk(spark, [(1, "x", 10)])
    new = _mk(spark, [(1, "q", 99)])
    got = _got(table_diff(old, new, ["id"]))
    assert got[1] == ("changed", "a,b")


def test_compare_cols_subset(spark):
    old = _mk(spark, [(1, "x", 10)])
    new = _mk(spark, [(1, "x", 99)])
    # comparing only 'a': the b change is invisible -> no output
    assert table_diff(old, new, ["id"], compare_cols=["a"]).count() == 0


def test_counts_consistent_with_detail(spark):
    old = _mk(spark, [(i, "v", i) for i in range(100)])
    new = (
        old.filter(F.col("id") % 10 != 0)  # 10 removed
        .withColumn("b", F.when(F.col("id") % 7 == 0, -1).otherwise(F.col("b")))
        .unionByName(_mk(spark, [(1000 + i, "n", i) for i in range(5)]))
    )
    counts = {r["status"]: r["n"] for r in diff_counts(old, new, ["id"]).collect()}
    detail = table_diff(old, new, ["id"])
    by_status = {
        r["status"]: r["n"]
        for r in detail.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["added"] == by_status["added"] == 5
    assert counts["removed"] == by_status["removed"] == 10
    assert counts["changed"] == by_status["changed"]
    assert counts["unchanged"] == 100 - 10 - counts["changed"]
    assert "unchanged" not in by_status
