"""Skew profiler: hand-counted ratios, NULL-as-hot-key, WGL plan bound."""

from __future__ import annotations

from brontes_spark.operators.skew import key_skew_profile, key_skew_summary


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_summary_ratios_exact(spark):
    # 10 rows, 4 keys, hot key 'a' holds 7
    df = _df(spark, ["a"] * 7 + ["b", "c", "d"])
    [s] = key_skew_summary(df, "k").collect()
    assert (s["n_rows"], s["n_keys"], s["max_cnt"]) == (10, 4, 7)
    assert s["skew_ratio_9"] == 7 * 4 * 10**9 // 10  # 2.8x mean
    assert s["p_hot_9"] == 700_000_000


def test_profile_order_and_ties(spark):
    df = _df(spark, ["a"] * 3 + ["b"] * 3 + ["c"])
    got = [(r["key"], r["cnt"], r["rank"])
           for r in key_skew_profile(df, "k", 2).orderBy("rank").collect()]
    # tie on 3: key-ascending order
    assert got == [("a", 3, 1), ("b", 3, 2)]


def test_null_key_profiles_like_a_value(spark):
    df = _df(spark, [None, None, None, "x"])
    got = key_skew_profile(df, "k", 1).collect()
    assert got[0]["key"] is None and got[0]["cnt"] == 3
    [s] = key_skew_summary(df, "k").collect()
    assert s["n_keys"] == 2 and s["max_cnt"] == 3


def test_hot_list_bounded_map_side(spark):
    plan = key_skew_profile(_df(spark, ["a", "b"]), "k", 5)
    txt = plan._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        plan._jdf.queryExecution(), "simple"
    )
    # the rank<=k filter must compile to the bounded global top-k
    # (map-side partial TakeOrdered feeding a k-row final), never a
    # single-partition window over the full key relation
    assert "TakeOrderedAndProject(limit=5" in txt
    assert "Exchange SinglePartition" not in txt
