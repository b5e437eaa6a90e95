"""Quantile normalization: textbook Bolstad example, rank-fraction
mapping, tie determinism, NULL exclusion."""

from __future__ import annotations

from brontes_spark.operators.qnorm import quantile_normalize


def _run(spark, rows):
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    out = quantile_normalize(df, "grp", "v", ["id"])
    return {(r["grp"], r["id"]): r for r in out.collect()}


def test_equal_size_groups_share_the_pooled_ladder(spark):
    # two groups of 3: within-group ranks 1,2,3 map to pooled ranks 2,4,6
    rows = [
        ("A", 1, 10), ("A", 2, 20), ("A", 3, 30),
        ("B", 4, 100), ("B", 5, 200), ("B", 6, 300),
    ]
    got = _run(spark, rows)
    pooled = sorted([10, 20, 30, 100, 200, 300])
    for grp, ids in (("A", [1, 2, 3]), ("B", [4, 5, 6])):
        for k, i in enumerate(ids, start=1):
            r = got[(grp, i)]
            assert r["rank_in_group"] == k
            assert r["pooled_rank"] == 2 * k  # ceil(k*6/3)
            assert r["normalized"] == pooled[2 * k - 1]
    # after normalization the two groups have IDENTICAL value sets
    a = sorted(r["normalized"] for (g, _), r in got.items() if g == "A")
    b = sorted(r["normalized"] for (g, _), r in got.items() if g == "B")
    assert a == b


def test_unequal_groups_ceil_mapping(spark):
    # n_g=2 inside N=5: ranks 1,2 -> ceil(5/2)=3, ceil(10/2)=5
    rows = [("A", i, v) for i, v in enumerate([1, 2, 3])] + [
        ("B", 10, 50), ("B", 11, 60),
    ]
    got = _run(spark, rows)
    assert got[("B", 10)]["pooled_rank"] == 3
    assert got[("B", 11)]["pooled_rank"] == 5


def test_ties_and_nulls(spark):
    rows = [("A", 1, 7), ("A", 2, 7), ("B", 3, 7), ("B", 4, None)]
    got = _run(spark, rows)
    assert ("B", 4) not in got  # NULL excluded
    # every pooled rank resolves to the tied value regardless of order
    assert all(r["normalized"] == 7 for r in got.values())
    # rn deterministic via the tiebreak
    assert got[("A", 1)]["rank_in_group"] == 1
    assert got[("A", 2)]["rank_in_group"] == 2
