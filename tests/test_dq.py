"""Data-quality checks (operators/dq.py): each constraint's fire and
no-fire directions on crafted frames, NULL semantics, and the unioned
report shape."""

from __future__ import annotations

from brontes_spark.operators.dq import (
    check_accepted,
    check_foreign_key,
    check_in_range,
    check_not_null,
    check_unique,
    run_checks,
)


def _n(df):
    r = df.collect()
    assert len(r) == 1
    return r[0]["n_violations"]


def test_unique_counts_extra_copies(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,), (3,)], "k int")
    # 1 appears 3x (2 extra), 3 appears 2x (1 extra) -> 3 violations
    assert _n(check_unique(df, ["k"], "u")) == 3
    clean = spark.createDataFrame([(1,), (2,)], "k int")
    assert _n(check_unique(clean, ["k"], "u")) == 0


def test_unique_composite_key(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (1, "a")], "k int, s string")
    assert _n(check_unique(df, ["k", "s"], "u")) == 1


def test_not_null(spark):
    df = spark.createDataFrame([(1,), (None,), (None,)], "k int")
    assert _n(check_not_null(df, "k", "nn")) == 2


def test_accepted_values_null_is_violation(spark):
    df = spark.createDataFrame([("A",), ("B",), (None,), ("A",)], "s string")
    assert _n(check_accepted(df, "s", ["A"], "av")) == 2  # B and NULL


def test_foreign_key(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    assert _n(check_foreign_key(child, "fk", parent, "pk", "fk")) == 2


def test_in_range_inclusive_bounds(spark):
    df = spark.createDataFrame([(0,), (1,), (50,), (51,), (None,)], "v int")
    assert _n(check_in_range(df, "v", 1, 50, "r")) == 3  # 0, 51, NULL


def test_report_union_shape(spark):
    df = spark.createDataFrame([(1,), (1,)], "k int")
    rep = run_checks([
        check_unique(df, ["k"], "a"),
        check_not_null(df, "k", "b"),
    ])
    got = {r["check_name"]: r["n_violations"] for r in rep.collect()}
    assert got == {"a": 1, "b": 0}
