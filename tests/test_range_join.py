"""interval_overlap_join (operators/range_join.py): hand goldens,
exactly-once emission across bucket boundaries, bucket-width independence
(property over seeded random intervals vs a brute-force reference),
negative-timestamp banding, and the empty-interval guard."""

from __future__ import annotations

import random

import pytest

from brontes_spark.operators.range_join import interval_overlap_join


def _frames(spark, lrows, rrows):
    l = spark.createDataFrame(lrows, "k string, lid long, ls long, le long")
    r = spark.createDataFrame(rrows, "k string, rid long, rs long, re long")
    return l, r


def _pairs(df):
    return {(r.k, r.lid, r.rid, r.overlap_start, r.overlap_end) for r in df.collect()}


def test_hand_golden(spark):
    l, r = _frames(
        spark,
        [("u", 1, 0, 100), ("u", 2, 200, 300), ("v", 3, 0, 100)],
        [("u", 10, 50, 150), ("u", 11, 290, 310), ("v", 12, 100, 200)],
    )
    got = _pairs(interval_overlap_join(l, r, "ls", "le", "rs", "re", on=["k"], bucket=10))
    #  [0,100) x [50,150) overlap [50,100); [200,300) x [290,310) overlap
    #  [290,300); v: [0,100) x [100,200) touch but half-open -> no overlap
    assert got == {("u", 1, 10, 50, 100), ("u", 2, 11, 290, 300)}


def test_exactly_once_across_many_buckets(spark):
    # one pair overlapping 10+ buckets must emit once, not per bucket
    l, r = _frames(spark, [("u", 1, 0, 1000)], [("u", 2, 1, 999)])
    out = interval_overlap_join(l, r, "ls", "le", "rs", "re", on=["k"], bucket=7)
    rows = out.collect()
    assert len(rows) == 1
    assert (rows[0].overlap_start, rows[0].overlap_end) == (1, 999)


@pytest.mark.parametrize("bucket", [1, 3, 17, 1000, 10**9])
def test_bucket_width_independence(spark, bucket):
    rng = random.Random(42)
    lrows = [("k", i, s := rng.randrange(-500, 500), s + rng.randrange(1, 120))
             for i in range(60)]
    rrows = [("k", i, s := rng.randrange(-500, 500), s + rng.randrange(1, 120))
             for i in range(60)]
    want = {
        ("k", li, ri, max(ls, rs), min(le, re))
        for (_, li, ls, le) in lrows
        for (_, ri, rs, re) in rrows
        if ls < re and rs < le
    }
    l, r = _frames(spark, lrows, rrows)
    got = _pairs(interval_overlap_join(l, r, "ls", "le", "rs", "re", on=["k"], bucket=bucket))
    assert got == want


def test_negative_timestamps_band_correctly(spark):
    # floor banding: [-25,-5) and [-10,10) overlap in bucket -1 territory
    l, r = _frames(spark, [("k", 1, -25, -5)], [("k", 2, -10, 10)])
    got = _pairs(interval_overlap_join(l, r, "ls", "le", "rs", "re", on=["k"], bucket=10))
    assert got == {("k", 1, 2, -10, -5)}


def test_empty_and_inverted_intervals_never_match(spark):
    l, r = _frames(
        spark, [("k", 1, 50, 50), ("k", 2, 90, 10)], [("k", 3, 0, 100)]
    )
    out = interval_overlap_join(l, r, "ls", "le", "rs", "re", on=["k"], bucket=10)
    assert out.count() == 0


def test_no_key_join_and_ambiguity_guard(spark):
    l, r = _frames(spark, [("a", 1, 0, 10)], [("b", 2, 5, 15)])
    # without `on`, k collides between the sides -> loud error
    with pytest.raises(ValueError, match="ambiguous"):
        interval_overlap_join(l, r, "ls", "le", "rs", "re")
    rows = interval_overlap_join(
        l.drop("k"), r.drop("k"), "ls", "le", "rs", "re", bucket=4
    ).collect()
    assert [(r.lid, r.rid, r.overlap_start, r.overlap_end) for r in rows] == [
        (1, 2, 5, 10)
    ]
