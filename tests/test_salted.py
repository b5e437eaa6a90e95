"""Salted join (operators/salted.py): result equals the plain join exactly
(multiset, inner and left), hot-key spread actually happens, guards."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from brontes_spark.operators.salted import salted_join


def _frames(spark):
    rng = random.Random(13)
    left = [(f"k{rng.randrange(20)}", i) for i in range(500)]
    left += [("hot", 1000 + i) for i in range(500)]  # one hot key
    right = [(f"k{i}", f"v{i}") for i in range(20)] + [("hot", "vh"), ("miss", "vm")]
    return (
        spark.createDataFrame(left, "k string, lid long"),
        spark.createDataFrame(right, "k string, rv string"),
    )


def _multiset(rows):
    return Counter((r.k, r.lid, r.rv) for r in rows)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_equals_plain_join(spark, how):
    left, right = _frames(spark)
    got = _multiset(salted_join(left, right, ["k"], n_salts=8, how=how).collect())
    want = _multiset(left.join(right, "k", how).collect())
    assert got == want


def test_hot_key_spreads_over_salts(spark):
    left, right = _frames(spark)
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int"),
    )
    n = l.filter(F.col("k") == "hot").select("_salt").distinct().count()
    assert n >= 6  # 500 rows over 8 salts: all salts hit w.h.p.


def test_guards(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(left, right, ["k"], n_salts=1)
    with pytest.raises(ValueError, match="how"):
        salted_join(left, right, ["k"], how="full")
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(left.withColumn("rv", F.lit("x")), right, ["k"])
