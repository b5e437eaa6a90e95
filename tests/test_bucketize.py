"""Exact-quantile bucketize: cut selection, tie collapse, duplicate-cut
label skipping, RFM composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.operators.bucketize import (
    bucket_expr,
    quantile_cuts,
    rfm_segments,
)


def _vals(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "v long")


def test_cuts_are_rank_values(spark):
    # n=10, k=5 -> ranks ceil(i*10/5) = 2,4,6,8 -> values 20,40,60,80
    df = _vals(spark, [10, 20, 30, 40, 50, 60, 70, 80, 90, 100])
    assert quantile_cuts(df, "v", 5) == [20, 40, 60, 80]


def test_bucket_assignment_and_tie_collapse(spark):
    df = _vals(spark, [1, 2, 2, 2, 5, 6])
    cuts = quantile_cuts(df, "v", 3)  # n=6: ranks 2,4 -> values 2, 2
    assert cuts == [2, 2]
    out = {
        r["v"]: r["b"]
        for r in df.select("v", bucket_expr(F.col("v"), cuts).alias("b")).collect()
    }
    # duplicate cut: nothing lands in bucket 2 — ties collapse low,
    # values above the tied cut jump straight to bucket 3
    assert out == {1: 1, 2: 1, 5: 3, 6: 3}


def test_empty_and_null_inputs(spark):
    assert quantile_cuts(_vals(spark, []), "v", 4) == []
    df = spark.createDataFrame([(None,), (7,)], "v long")
    assert quantile_cuts(df, "v", 2) == [7]


def test_rfm_composition(spark):
    sec = 1_000_000_000
    rows = []
    # 10 users: user u has (u+1) events of 100*(u+1) cents, last at t=u
    for u in range(10):
        rows += [(u, t * sec + u, 100 * (u + 1)) for t in range(u + 1)]
    ev = spark.createDataFrame(rows, "user_id long, ts_ns long, cents long")
    got = {
        r["key"]: r
        for r in rfm_segments(ev, "user_id", "ts_ns", "cents", k=5)
        .withColumnRenamed("user_id", "key")
        .collect()
    }
    # user 9: most events (10), biggest spend, latest activity
    assert got[9]["f_bucket"] == 5 and got[9]["m_bucket"] == 5
    assert got[9]["r_bucket"] == 1  # recency_ns == 0 (global max is theirs)
    # user 0: single earliest event, smallest spend
    assert got[0]["f_bucket"] == 1 and got[0]["m_bucket"] == 1
    assert got[0]["r_bucket"] == 5
    assert got[0]["frequency"] == 1 and got[0]["monetary"] == 100
