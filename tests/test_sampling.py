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


def test_balanced_sample_exact_n_per_class(spark):
    from brontes_spark.operators.sampling import balanced_weighted_sample

    rows = [("a", i, 1 + i % 3) for i in range(20)] + [
        ("b", 100 + i, 5) for i in range(3)
    ] + [("c", 200, 0)]  # class c: only a zero-weight member
    df = spark.createDataFrame(rows, "cls string, id long, w long")
    got = balanced_weighted_sample(df, "cls", "id", "w", n_per_class=5).collect()
    by_cls = {}
    for r in got:
        by_cls.setdefault(r.cls, []).append(r)
    assert sorted(by_cls) == ["a", "b"]          # c has no sampleable mass
    assert len(by_cls["a"]) == 5                  # capped
    assert len(by_cls["b"]) == 3                  # whole class (< n)
    for rs in by_cls.values():                    # rk is 1..m in key order
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        keys = [r.key for r in rs]
        assert keys == sorted(keys, reverse=True)


def test_balanced_sample_is_per_class_independent(spark):
    """Growing class b must not change class a's draw (the key is a pure
    function of (salt, class, id, rep))."""
    from brontes_spark.operators.sampling import balanced_weighted_sample

    base = [("a", i, 2) for i in range(30)]
    small = spark.createDataFrame(base + [("b", 100, 1)], "cls string, id long, w long")
    big = spark.createDataFrame(
        base + [("b", 100 + i, 1) for i in range(50)], "cls string, id long, w long"
    )
    pick = lambda df: sorted(  # noqa: E731
        (r.id, r.rk)
        for r in balanced_weighted_sample(df, "cls", "id", "w", 7).collect()
        if r.cls == "a"
    )
    assert pick(small) == pick(big)


def test_balanced_sample_prefix_nesting(spark):
    """The A-ES nesting property: the n=3 sample is exactly the rk<=3
    prefix of the n=10 sample."""
    from brontes_spark.operators.sampling import balanced_weighted_sample

    df = spark.createDataFrame(
        [("g", i, 1 + i % 7) for i in range(40)], "cls string, id long, w long"
    )
    ten = {
        (r.id, r.rk)
        for r in balanced_weighted_sample(df, "cls", "id", "w", 10).collect()
    }
    three = {
        (r.id, r.rk)
        for r in balanced_weighted_sample(df, "cls", "id", "w", 3).collect()
    }
    assert three == {(i, rk) for i, rk in ten if rk <= 3}


def test_balanced_sample_heavy_weight_dominates(spark):
    """One member with 1000x weight wins rank 1 in >= 4 of 5 fixed salts
    (deterministic pin of the construction, not a statistical test)."""
    from brontes_spark.operators.sampling import balanced_weighted_sample

    df = spark.createDataFrame(
        [("g", 0, 1000)] + [("g", i, 1) for i in range(1, 51)],
        "cls string, id long, w long",
    )
    wins = 0
    for i in range(5):
        top = [
            r.id
            for r in balanced_weighted_sample(
                df, "cls", "id", "w", 1, salt=f"s{i}"
            ).collect()
        ]
        wins += top == [0]
    assert wins >= 4


def test_balanced_sample_rejects_bad_params(spark):
    from brontes_spark.operators.sampling import balanced_weighted_sample

    df = spark.createDataFrame([("g", 1, 1)], "cls string, id long, w long")
    with pytest.raises(ValueError):
        balanced_weighted_sample(df, "cls", "id", "w", 0)
    with pytest.raises(ValueError):
        balanced_weighted_sample(df, "cls", "id", "w", 1, weight_scale=0)
