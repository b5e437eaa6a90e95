"""CUSUM closed form vs the sequential definition, alarm semantics, and
the single-exchange plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from brontes_spark.operators.changepoint import cusum, cusum_summary


def _fold(xs, target, allowance):
    """The textbook sequential recursion (Page 1954) — the semantics the
    window closed form must reproduce exactly."""
    sp = sn = 0
    out = []
    for x in xs:
        sp = max(0, sp + (x - target - allowance))
        sn = max(0, sn + (target - x - allowance))
        out.append((sp, sn))
    return out


def _mk(spark, series):
    rows = [
        (key, i, x)
        for key, xs in series.items()
        for i, x in enumerate(xs)
    ]
    return spark.createDataFrame(rows, "key string, t long, x long")


def test_closed_form_matches_sequential_fold(spark):
    rng = random.Random(7)
    series = {
        f"k{j}": [rng.randint(-50, 80) for _ in range(200)] for j in range(5)
    }
    # include adversarial shapes: all-below-target, all-above, constant
    series["low"] = [-10] * 50
    series["high"] = [99] * 50
    series["flat"] = [10] * 50
    got = (
        cusum(_mk(spark, series), "key", ["t"], "x", target=10, allowance=3,
              threshold=100)
        .orderBy("key", "t")
        .collect()
    )
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], []).append(r)
    for key, xs in series.items():
        want = _fold(xs, 10, 3)
        rows = by_key[key]
        assert len(rows) == len(want)
        for r, (sp, sn) in zip(rows, want):
            assert (r["cusum_pos"], r["cusum_neg"]) == (sp, sn), (key, r["t"])
            assert r["alarm"] == (sp > 100 or sn > 100)


def test_summary_first_alarm_and_counts(spark):
    # key "a": drifts up from t=3 (x=50 vs target 10+3) -> first crossing
    # when cumulative excess > 60; key "b": never alarms
    series = {"a": [10, 10, 10, 50, 50, 50, 10], "b": [10] * 7}
    out = {
        r["key"]: r
        for r in cusum_summary(
            _mk(spark, series), "key", ["t"], "t", "x",
            target=10, allowance=3, threshold=60,
        ).collect()
    }
    # excess per high x: 50-13=37; S+ walks 0,0,0,37,74,111,108 -> first
    # crossing of 60 at the 2nd high row (t=4), and t=4/5/6 all sit above
    a, b = out["a"], out["b"]
    assert a["first_alarm_ts"] == 4
    assert a["n_alarm_rows"] == 3
    assert a["max_pos"] == 111
    assert b["n_alarm_rows"] == 0 and b["first_alarm_ts"] is None
    assert b["max_pos"] == 0 and b["max_neg"] == 0  # flat series never drifts


def test_negative_drift_side(spark):
    # mirror symmetry: negating the series swaps pos/neg statistics
    series = {"m": [5, -20, 30, -40, 0, 12, -7]}
    neg = {"m": [-x for x in series["m"]]}
    a = cusum(_mk(spark, series), "key", ["t"], "x", 0, 2, 10).orderBy("t").collect()
    b = cusum(_mk(spark, neg), "key", ["t"], "x", 0, 2, 10).orderBy("t").collect()
    for ra, rb in zip(a, b):
        assert ra["cusum_pos"] == rb["cusum_neg"]
        assert ra["cusum_neg"] == rb["cusum_pos"]


def test_single_exchange_plan(spark):
    df = _mk(spark, {"k": [1, 2, 3]})
    out = cusum_summary(df, "key", ["t"], "t", "x", 0, 0, 1)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "simple"
    )
    # prefix-sum window, running-min window, and the summary aggregate all
    # ride ONE hashpartitioning on the key
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
