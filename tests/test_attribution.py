"""linear_attribution (operators/attribution.py): hand-computed credit
splits, horizon boundaries (inclusive both ends), first/last flags with
ties, credit conservation, and key isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.operators.attribution import linear_attribution
import pytest

DDL = "event_id long, ts_ns long, user_id long, event_type string"
H = 1000  # small integer horizon: the math is unit-agnostic
ARGS = dict(
    key_col="user_id", ts_col="ts_ns", id_col="event_id",
    type_col="event_type", touch_type="view", conv_type="purchase",
)


def _run(spark, rows, horizon=H):
    df = spark.createDataFrame(rows, DDL)
    return linear_attribution(df, horizon_ns=horizon, **ARGS)


@pytest.mark.slow
def test_equal_split_and_flags(spark):
    rows = [
        (1, 100, 7, "view"),
        (2, 200, 7, "view"),
        (3, 300, 7, "view"),
        (9, 350, 7, "purchase"),
    ]
    got = {r["touch_id"]: r for r in _run(spark, rows).collect()}
    assert set(got) == {1, 2, 3}
    for tid, r in got.items():
        assert r["n_touch"] == 3
        assert r["credit9"] == 333333333
        assert r["conv_id"] == 9
    assert got[1]["is_first"] and not got[1]["is_last"]
    assert got[3]["is_last"] and not got[3]["is_first"]
    assert not got[2]["is_first"] and not got[2]["is_last"]
    assert got[2]["gap_ns"] == 150


def test_horizon_is_inclusive_both_ends(spark):
    rows = [
        (1, 0, 7, "view"),      # exactly horizon before: IN
        (2, 1, 7, "view"),      # inside
        (3, 1000, 7, "view"),   # at conversion instant: IN
        (4, -1, 7, "view"),     # one past horizon: OUT
        (9, 1000, 7, "purchase"),
    ]
    got = {r["touch_id"] for r in _run(spark, rows).collect()}
    assert got == {1, 2, 3}


def test_touch_after_conversion_never_attributes(spark):
    rows = [(1, 500, 7, "view"), (9, 400, 7, "purchase")]
    assert _run(spark, rows).count() == 0


def test_keys_are_isolated(spark):
    rows = [(1, 100, 7, "view"), (9, 150, 8, "purchase")]
    assert _run(spark, rows).count() == 0


def test_touch_shared_across_conversions(spark):
    # one view inside both purchase horizons: credited to EACH (per-conv
    # normalization, not a budget split across conversions)
    rows = [
        (1, 100, 7, "view"),
        (8, 200, 7, "purchase"),
        (9, 300, 7, "purchase"),
    ]
    out = _run(spark, rows).collect()
    assert {r["conv_id"] for r in out} == {8, 9}
    assert all(r["credit9"] == 10**9 for r in out)


def test_cotimestamped_touches_tie_both_flags(spark):
    rows = [
        (1, 100, 7, "view"),
        (2, 100, 7, "view"),
        (9, 200, 7, "purchase"),
    ]
    out = _run(spark, rows).collect()
    # both share min AND max touch time: all four flags true, credit half
    assert all(r["is_first"] and r["is_last"] for r in out)
    assert all(r["credit9"] == 500000000 for r in out)


def test_credit_conserves_up_to_floor(spark):
    rows = [(i, 100 + i, 7, "view") for i in range(1, 8)] + [
        (99, 900, 7, "purchase")
    ]
    out = _run(spark, rows)
    tot = out.agg(F.sum("credit9")).collect()[0][0]
    n = out.count()
    assert n == 7
    # sum of floors: within n of 1e9, never over
    assert 10**9 - n < tot <= 10**9
