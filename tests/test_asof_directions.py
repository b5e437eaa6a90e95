"""asof_join direction='forward'/'nearest' and tolerance (operators/asof.py)
— the pandas merge_asof surface: hand-computed matches, exact-time
visibility in every direction, tie rules, tolerance voiding, and
backward-compatibility of the default path."""

from __future__ import annotations

import pytest

from brontes_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 205), (3, "k", 310), (4, "k", 400)],
        "lid long, k string, t long",
    )
    right = spark.createDataFrame(
        [("k", 90, 9.0), ("k", 200, 20.0), ("k", 300, 30.0), ("k", 330, 33.0)],
        "k string, rt long, price double",
    )
    return left, right


def _run(spark, **kw):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt",
        payload_prefix="r_", how="left", **kw,
    )
    return {r.lid: (r.r_rt, r.r_price) for r in out.collect()}


@pytest.mark.slow
def test_backward_default_unchanged(spark):
    got = _run(spark)
    assert got == {1: (90, 9.0), 2: (200, 20.0), 3: (300, 30.0), 4: (330, 33.0)}


def test_forward(spark):
    got = _run(spark, direction="forward")
    # lid=1 t=100 -> next right at 200; lid=4 t=400 -> none
    assert got == {1: (200, 20.0), 2: (300, 30.0), 3: (330, 33.0), 4: (None, None)}


def test_forward_exact_time_visible(spark):
    left = spark.createDataFrame([(1, "k", 200)], "lid long, k string, t long")
    right = spark.createDataFrame([("k", 200, 2.0)], "k string, rt long, price double")
    out = asof_join(left, right, ["k"], "t", "rt", how="left",
                    direction="forward").collect()
    assert out[0].r_price == 2.0


def test_nearest_with_backward_tie_win(spark):
    got = _run(spark, direction="nearest")
    # lid=2 t=205: back 200 (d=5) vs fwd 300 (d=95) -> 200
    # lid=3 t=310: back 300 (d=10) vs fwd 330 (d=20) -> 300
    assert got == {1: (90, 9.0), 2: (200, 20.0), 3: (300, 30.0), 4: (330, 33.0)}
    # exact tie: back d == fwd d -> backward wins
    left = spark.createDataFrame([(1, "k", 250)], "lid long, k string, t long")
    right = spark.createDataFrame(
        [("k", 200, 2.0), ("k", 300, 3.0)], "k string, rt long, price double"
    )
    out = asof_join(left, right, ["k"], "t", "rt", how="left",
                    direction="nearest").collect()
    assert out[0].r_price == 2.0


def test_tolerance_voids_far_matches(spark):
    got = _run(spark, tolerance=10)
    # lid=1 t=100: back 90 d=10 OK; lid=2 t=205: 200 d=5 OK;
    # lid=3 t=310: 300 d=10 OK; lid=4 t=400: 330 d=70 void
    assert got == {1: (90, 9.0), 2: (200, 20.0), 3: (300, 30.0), 4: (None, None)}
    got_f = _run(spark, direction="forward", tolerance=10)
    assert got_f == {1: (None, None), 2: (None, None), 3: (None, None), 4: (None, None)}
    got_n = _run(spark, direction="nearest", tolerance=20)
    # lid=1: back 90 d=10 ok; fwd 200 d=100 no -> 90
    # lid=4: back 330 d=70 no; fwd none -> null
    assert got_n == {1: (90, 9.0), 2: (200, 20.0), 3: (300, 30.0), 4: (None, None)}


def test_nearest_prefers_forward_when_backward_out_of_tolerance(spark):
    left = spark.createDataFrame([(1, "k", 295)], "lid long, k string, t long")
    right = spark.createDataFrame(
        [("k", 200, 2.0), ("k", 300, 3.0)], "k string, rt long, price double"
    )
    out = asof_join(left, right, ["k"], "t", "rt", how="left",
                    direction="nearest", tolerance=50).collect()
    assert out[0].r_price == 3.0  # back d=95 > 50 voided, fwd d=5 ok


def test_inner_drops_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "t", "rt", how="inner",
                    direction="forward")
    assert sorted(r.lid for r in out.collect()) == [1, 2, 3]


def test_forward_tiebreak_greatest_wins(spark):
    left = spark.createDataFrame([(1, "k", 100)], "lid long, k string, t long")
    right = spark.createDataFrame(
        [("k", 150, 1, 10.0), ("k", 150, 2, 20.0)],
        "k string, rt long, seq int, price double",
    )
    out = asof_join(left, right, ["k"], "t", "rt", tiebreak="seq",
                    how="left", direction="forward").collect()
    assert out[0].r_seq == 2 and out[0].r_price == 20.0


def test_bad_params(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", "rt", direction="sideways")
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", "rt", tolerance=-1)


def test_point_in_time_join_covers_and_guards(spark):
    """PIT lookup (operators/asof.point_in_time_join): facts take the
    version covering their timestamp under [valid_from, valid_to);
    coverage gaps must NOT match a stale version (inner drops, left
    nulls every payload column)."""
    from brontes_spark.operators.asof import point_in_time_join

    versions = spark.createDataFrame(
        [
            ("u", 0, 10, "v1"),
            ("u", 10, 20, "v2"),
            # gap [20, 30)
            ("u", 30, None, "v3"),
        ],
        "key string, valid_from long, valid_to long, attr string",
    )
    facts = spark.createDataFrame(
        [("u", 0, "a"), ("u", 9, "b"), ("u", 10, "c"), ("u", 25, "gap"),
         ("u", 30, "d"), ("u", 99, "e"), ("w", 5, "nokey")],
        "key string, ts long, fact string",
    )
    inner = {
        r["fact"]: r["dim_attr"]
        for r in point_in_time_join(facts, versions, ["key"], "ts").collect()
    }
    assert inner == {"a": "v1", "b": "v1", "c": "v2", "d": "v3", "e": "v3"}
    left = {
        r["fact"]: (r["dim_attr"], r["dim_valid_from"])
        for r in point_in_time_join(
            facts, versions, ["key"], "ts", how="left"
        ).collect()
    }
    assert left["gap"] == (None, None)  # stale v2 must NOT leak through
    assert left["nokey"] == (None, None)
    assert left["a"] == ("v1", 0)


def test_point_in_time_left_mask_spares_prefix_collision_fact_cols(spark):
    """A FACT column whose name happens to start with payload_prefix (here
    a literal `dim_note`) must survive the how='left' coverage mask — the
    mask set derives from the versions frame's payload columns, not from a
    name-prefix scan of the output."""
    from brontes_spark.operators.asof import point_in_time_join

    versions = spark.createDataFrame(
        [("u", 0, 10, "v1")],
        "key string, valid_from long, valid_to long, attr string",
    )
    facts = spark.createDataFrame(
        [("u", 5, "covered"), ("u", 25, "uncovered")],
        "key string, ts long, dim_note string",
    )
    rows = {
        r["ts"]: (r["dim_note"], r["dim_attr"])
        for r in point_in_time_join(
            facts, versions, ["key"], "ts", how="left"
        ).collect()
    }
    assert rows[5] == ("covered", "v1")
    # uncovered: payload nulled, but the fact's own dim_note untouched
    assert rows[25] == ("uncovered", None)
