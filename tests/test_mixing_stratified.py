"""temperature_weights_* (operators/mixing.py) and the stratified
samplers (operators/sampling.py): exact-arithmetic golds, perfect-square
twilight, sample-stability properties."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from brontes_spark.operators.mixing import (
    temperature_weights_float,
    temperature_weights_sqrt,
)
from brontes_spark.operators.sampling import stratified_sample_exact_n

# ---------------------------------------------------------------- mixing


def _mk(spark, counts: dict[str, int]):
    rows = [(d,) for d, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "d string")


def test_sqrt_weights_exact_on_perfect_squares(spark):
    df = _mk(spark, {"a": 16, "b": 4, "c": 1})  # s = 4, 2, 1; total 7
    got = {r["domain"]: r for r in temperature_weights_sqrt(df, "d").collect()}
    assert (got["a"]["s"], got["b"]["s"], got["c"]["s"]) == (4, 2, 1)
    assert got["a"]["weight9"] == 4 * 10**9 // 7
    assert got["b"]["weight9"] == 2 * 10**9 // 7
    assert got["c"]["weight9"] == 1 * 10**9 // 7


def test_sqrt_weights_match_python_floor_sqrt(spark):
    counts = {f"d{i}": n for i, n in enumerate([2, 3, 5, 8, 15, 24, 25, 26, 99])}
    df = _mk(spark, counts)
    got = {r["domain"]: r["s"] for r in temperature_weights_sqrt(df, "d").collect()}
    # java Math.sqrt is correctly rounded -> floor matches python exactly
    # for these magnitudes (both are the true isqrt here)
    assert got == {d: math.isqrt(n) for d, n in counts.items()}


def test_sqrt_weights_compress_toward_uniform(spark):
    # 100:1 corpus ratio becomes 10:1 weight ratio — the point of T=2
    df = _mk(spark, {"big": 400, "small": 4})
    got = {r["domain"]: r["weight9"] for r in temperature_weights_sqrt(df, "d").collect()}
    assert abs(got["big"] - 10 * got["small"]) <= 10  # exact up to floor slack
    assert got["big"] < 100 * got["small"]


def test_weights_sum_just_under_1e9(spark):
    df = _mk(spark, {"a": 7, "b": 13, "c": 29, "d": 2})
    tot = temperature_weights_sqrt(df, "d").agg(F.sum("weight9")).collect()[0][0]
    assert 10**9 - 4 < tot <= 10**9


def test_float_variant_normalizes_and_orders(spark):
    df = _mk(spark, {"a": 100, "b": 10, "c": 1})
    got = {r["domain"]: r["weight"] for r in
           temperature_weights_float(df, "d", temperature=3.0).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-12
    assert got["a"] > got["b"] > got["c"]
    # T -> inf limit is uniform; T=3 must sit between T=1 shares and uniform
    assert got["a"] < 100 / 111
    assert got["c"] > 1 / 111


# ------------------------------------------------------------ stratified


def test_exact_n_caps_per_stratum(spark):
    df = spark.range(100).select(
        (F.col("id") % 7).cast("string").alias("g"), "id"
    )
    out = stratified_sample_exact_n(df, "g", "id", 5)
    sizes = {r["g"]: r["c"] for r in
             out.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sizes == {str(i): 5 for i in range(7)}
    # small stratum: takes everything
    df2 = spark.range(3).select(F.lit("only").alias("g"), "id")
    assert stratified_sample_exact_n(df2, "g", "id", 10).count() == 3


def test_exact_n_is_stable_under_other_strata_growth(spark):
    # adding rows to OTHER strata must not change this stratum's draw
    base = spark.range(50).select(F.lit("a").alias("g"), "id")
    grown = base.unionByName(
        spark.range(1000, 1400).select(F.lit("b").alias("g"), "id")
    )
    pick = lambda df: sorted(
        r["id"] for r in stratified_sample_exact_n(df, "g", "id", 8)
        .filter(F.col("g") == "a").collect()
    )
    assert pick(base) == pick(grown)


def test_exact_n_salt_redraws(spark):
    df = spark.range(200).select(F.lit("a").alias("g"), "id")
    a = {r["id"] for r in stratified_sample_exact_n(df, "g", "id", 20, salt="s1").collect()}
    b = {r["id"] for r in stratified_sample_exact_n(df, "g", "id", 20, salt="s2").collect()}
    assert a != b  # 20-of-200 twice identical has odds ~1e-26


# (the FRACTION-based stratified sampler is operators/dedup.py
# sample_stratified, gated as `sample_stratified` with its own tests —
# exact_n above is its fixed-count complement, not a replacement)
