"""gapfill (regular-grid ffill + linear interpolation) and mad_anomalies
(median/MAD robust outlier flagging): hand-computed grids, exact
interpolation values, head/tail conventions, and robustness pins."""

from __future__ import annotations

import pytest

from brontes_spark.operators.anomaly import mad_anomalies
from brontes_spark.operators.gapfill import gapfill


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, ts long, v double")


def test_gapfill_grid_and_interp(spark):
    # observations at t=10 (v=1.0) and t=40 (v=4.0), step 10:
    # grid = 10,20,30,40; interp at 20 = 2.0, at 30 = 3.0
    df = _series(spark, [("a", 10, 1.0), ("a", 40, 4.0)])
    got = {
        r.grid_ts: (r.value_ffill, r.value_interp)
        for r in gapfill(df, "k", "ts", "v", step=10).collect()
    }
    assert got == {
        10: (1.0, 1.0),
        20: (1.0, 2.0),
        30: (1.0, 3.0),
        40: (4.0, 4.0),
    }


def test_gapfill_unaligned_start_head_nulls(spark):
    # first observation at t=15: grid starts at floor(15/10)*10 = 10, and
    # the t=10 row precedes every observation -> both fills null
    df = _series(spark, [("a", 15, 5.0), ("a", 25, 7.0)])
    got = {
        r.grid_ts: (r.value_ffill, r.value_interp)
        for r in gapfill(df, "k", "ts", "v", step=10).collect()
    }
    assert got[10] == (None, None)
    assert got[20] == (5.0, 5.0 + 2.0 * (5 / 10))
    # after the last observation interp falls back to ffill
    assert set(got) == {10, 20}


def test_gapfill_negative_ts_floor_alignment(spark):
    # pre-epoch timestamps: the grid origin must FLOOR (-15 -> -20), not
    # truncate toward zero (-15 -> -10, Spark's `div`) — the engine-parity
    # divergence ADVICE r7 flagged; DuckDB's // floors
    df = _series(spark, [("a", -15, 1.0), ("a", 5, 3.0)])
    got = {
        r.grid_ts: (r.value_ffill, r.value_interp)
        for r in gapfill(df, "k", "ts", "v", step=10).collect()
    }
    assert set(got) == {-20, -10, 0}
    assert got[-20] == (None, None)  # precedes the first observation
    assert got[-10] == (1.0, 1.0 + 2.0 * (5 / 20))
    assert got[0] == (1.0, 1.0 + 2.0 * (15 / 20))


def test_gapfill_tail_ffill(spark):
    df = _series(spark, [("a", 0, 2.0), ("a", 35, 8.0)])
    got = {
        r.grid_ts: (r.value_ffill, r.value_interp)
        for r in gapfill(df, "k", "ts", "v", step=10).collect()
    }
    # t=30 is between observations; 0..30 of 0..35 -> 2 + 6*(30/35)
    assert got[30] == (2.0, 2.0 + 6.0 * (30 / 35))
    assert set(got) == {0, 10, 20, 30}


def test_gapfill_multi_key_independent(spark):
    df = _series(spark, [("a", 0, 1.0), ("a", 20, 3.0), ("b", 100, 9.0)])
    rows = gapfill(df, "k", "ts", "v", step=10).collect()
    a = {r.grid_ts for r in rows if r.key == "a"}
    b = {r.grid_ts for r in rows if r.key == "b"}
    assert a == {0, 10, 20} and b == {100}


def test_gapfill_observation_on_grid_wins(spark):
    df = _series(spark, [("a", 0, 1.0), ("a", 10, 5.0), ("a", 20, 1.0)])
    got = {
        r.grid_ts: r.value_interp
        for r in gapfill(df, "k", "ts", "v", step=10).collect()
    }
    assert got[10] == 5.0


def test_gapfill_bad_step(spark):
    with pytest.raises(ValueError):
        gapfill(_series(spark, [("a", 0, 1.0)]), "k", "ts", "v", step=0)


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, x double")


def test_mad_flags_outlier_mean_would_miss_less_robustly(spark):
    # 9 values near 10 plus one at 1000: median 10, MAD small, 1000 flagged
    rows = [("g", i, 10.0 + (i % 3)) for i in range(9)] + [("g", 99, 1000.0)]
    out = mad_anomalies(_vals(spark, rows), "g", "x", k=3.0, keep_cols=["id"]).collect()
    assert [r.id for r in out] == [99]
    r = out[0]
    assert r.med == 11.0 and r.mad == 1.0 and r.value == 1000.0


def test_mad_lower_median_convention(spark):
    # even count: lower order statistic, rank (n+1)//2 = 2 of 4
    rows = [("g", 1, 1.0), ("g", 2, 2.0), ("g", 3, 3.0), ("g", 4, 100.0)]
    out = mad_anomalies(_vals(spark, rows), "g", "x", k=3.0, keep_cols=["id"]).collect()
    # median = 2.0, devs = [1,0,1,98], MAD = lower-median(0,1,1,98) = 1
    assert [r.id for r in out] == [4]
    assert out[0].med == 2.0 and out[0].mad == 1.0


def test_mad_zero_flags_any_deviation(spark):
    rows = [("g", i, 5.0) for i in range(6)] + [("g", 10, 5.1)]
    out = mad_anomalies(_vals(spark, rows), "g", "x", keep_cols=["id"]).collect()
    assert [r.id for r in out] == [10]


def test_mad_per_group_isolation(spark):
    rows = [("a", i, float(i % 5)) for i in range(10)] + [
        ("a", 50, 90.0),
        # in group b, values near 90 are typical (median 90, MAD 2)
        ("b", 60, 88.0),
        ("b", 61, 90.0),
        ("b", 62, 90.0),
        ("b", 63, 92.0),
        ("b", 64, 94.0),
    ]
    out = mad_anomalies(_vals(spark, rows), "g", "x", k=3.0, keep_cols=["id"]).collect()
    assert [r.id for r in out] == [50]


def test_mad_clean_group_empty(spark):
    rows = [("g", i, float(i)) for i in range(10)]
    assert mad_anomalies(_vals(spark, rows), "g", "x", k=5.0).count() == 0
