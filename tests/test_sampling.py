"""Deterministic weighted sampling (operators/sampling.py): exact A-ES
max-of-w-draws equivalence properties — determinism, weight-0 exclusion,
heavy-item dominance, scale invariance, and tie-total ordering."""

from __future__ import annotations

import pytest

from brontes_spark.operators.sampling import sample_weighted, weighted_sample_keys


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, w long")


def test_deterministic_and_total(spark):
    df = _df(spark, [(i, (i % 5) + 1) for i in range(100)])
    a = [tuple(r) for r in sample_weighted(df, "id", "w", 10).collect()]
    b = [tuple(r) for r in sample_weighted(df, "id", "w", 10).collect()]
    assert a == b and len(a) == 10
    # different salt -> (almost surely) different sample
    c = [tuple(r) for r in sample_weighted(df, "id", "w", 10, salt="other").collect()]
    assert {x[0] for x in a} != {x[0] for x in c}


def test_zero_weight_never_sampled(spark):
    df = _df(spark, [(1, 0), (2, 5), (3, 0), (4, 5)])
    got = {r.id for r in sample_weighted(df, "id", "w", 4).collect()}
    assert got == {2, 4}


def test_heavy_item_dominates(spark):
    # one item with 1000x the weight of each of 50 light items: it wins the
    # m=1 draw in >=4 of 5 fixed salts (P(win) = 1000/1050 per draw; the
    # salts are fixed so this is a deterministic pin of the construction,
    # not a flaky statistical test)
    df = _df(spark, [(0, 1000)] + [(i, 1) for i in range(1, 51)])
    wins = sum(
        sample_weighted(df, "id", "w", 1, salt=f"s{i}").collect()[0].id == 0
        for i in range(5)
    )
    assert wins >= 4


def test_m_exceeding_population_returns_all_weighted(spark):
    df = _df(spark, [(1, 2), (2, 1), (3, 0)])
    got = {r.id for r in sample_weighted(df, "id", "w", 10).collect()}
    assert got == {1, 2}


def test_weight_scale_ceil(spark):
    # scale 10: weights 1..10 -> 1 draw, 11..20 -> 2 draws
    df = _df(spark, [(1, 1), (2, 10), (3, 11)])
    keys = weighted_sample_keys(df, "id", "w", weight_scale=10)
    reps = {r.id: r.key for r in keys.collect()}
    assert set(reps) == {1, 2, 3}
    one_draw = weighted_sample_keys(df.filter("id = 2"), "id", "w", weight_scale=10)
    # ceil(10/10) = 1 draw: key is exactly the single hash, same as w=1
    df1 = _df(spark, [(2, 1)])
    k1 = weighted_sample_keys(df1, "id", "w").collect()[0].key
    assert one_draw.collect()[0].key == k1


def test_bad_params(spark):
    df = _df(spark, [(1, 1)])
    with pytest.raises(ValueError):
        sample_weighted(df, "id", "w", 0)
    with pytest.raises(ValueError):
        weighted_sample_keys(df, "id", "w", weight_scale=0)
