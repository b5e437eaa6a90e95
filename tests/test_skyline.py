"""skyline_max2 (operators/skyline.py): brute-force dominance parity on
seeded random point sets, duplicate semantics, and prune_local
equivalence (the high-cardinality path must be provably identical)."""

from __future__ import annotations

import random

from brontes_spark.operators.skyline import skyline_max2


def _brute_frontier(pts: list[tuple[int, int]]) -> dict[tuple[int, int], int]:
    distinct = set(pts)
    out = {}
    for p in distinct:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and q != p for q in distinct
        )
        if not dominated:
            out[p] = pts.count(p)
    return out


def _got(df) -> dict[tuple[int, int], int]:
    return {(r["x"], r["y"]): r["n_pts"] for r in df.collect()}


def test_skyline_matches_brute_force_seeded(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        pts = [(rng.randrange(40), rng.randrange(40)) for _ in range(300)]
        df = spark.createDataFrame(pts, "x int, y int")
        want = _brute_frontier(pts)
        assert _got(skyline_max2(df, "x", "y")) == want, seed
        assert _got(skyline_max2(df, "x", "y", prune_local=True)) == want, seed


def test_skyline_duplicates_of_a_frontier_point_all_count(spark):
    # identical points never dominate each other: multiplicity reported
    pts = [(5, 5), (5, 5), (5, 5), (1, 9), (0, 0)]
    df = spark.createDataFrame(pts, "x int, y int")
    assert _got(skyline_max2(df, "x", "y")) == {(5, 5): 3, (1, 9): 1}


def test_skyline_same_x_loses_to_higher_y(spark):
    pts = [(3, 1), (3, 7), (2, 7)]  # (3,7) kills both others
    df = spark.createDataFrame(pts, "x int, y int")
    assert _got(skyline_max2(df, "x", "y")) == {(3, 7): 1}


def test_skyline_equal_y_loses_to_larger_x(spark):
    pts = [(3, 7), (2, 7)]
    df = spark.createDataFrame(pts, "x int, y int")
    assert _got(skyline_max2(df, "x", "y")) == {(3, 7): 1}


def test_skyline_chain_keeps_everything(spark):
    # strictly anti-monotone staircase: nothing dominates anything
    pts = [(i, 10 - i) for i in range(10)]
    df = spark.createDataFrame(pts, "x int, y int")
    assert len(_got(skyline_max2(df, "x", "y"))) == 10


def test_skyline_prune_local_many_partitions(spark):
    # force many partitions so the local sweep actually runs per-pid
    rng = random.Random(9)
    pts = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(2000)]
    df = spark.createDataFrame(pts, "x int, y int").repartition(16)
    want = _brute_frontier(pts)
    assert _got(skyline_max2(df, "x", "y", prune_local=True)) == want
