"""winsorize (operators/winsorize.py): numpy-free positional-percentile
reference parity, bound semantics, idempotence, group isolation."""

from __future__ import annotations

import random

from brontes_spark.operators.winsorize import winsorize

DDL = "k string, v long, id long"


def _ref_bounds(vals, q_num, q_den):
    s = sorted(vals)
    n = len(s)
    rn = (q_num * n + q_den - 1) // q_den  # ceil
    return s[rn - 1]


def test_matches_positional_reference(spark):
    rng = random.Random(21)
    rows = []
    by_key = {}
    for k in ("a", "b"):
        vals = [rng.randrange(-500, 5000) for _ in range(137)]
        by_key[k] = vals
        rows += [(k, v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, DDL)
    out = winsorize(df, "k", "v", "id", q_lo=(10, 100), q_hi=(90, 100))
    got = {(r["k"], r["id"]): (r["lo"], r["hi"], r["clamped"]) for r in out.collect()}
    for k, vals in by_key.items():
        lo = _ref_bounds(vals, 10, 100)
        hi = _ref_bounds(vals, 90, 100)
        for i, v in enumerate(vals):
            want = min(max(v, lo), hi)
            assert got[(k, i)] == (lo, hi, want), (k, i)


def test_extremes_are_pulled_to_bounds_not_dropped(spark):
    rows = [("g", v, i) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = spark.createDataFrame(rows, DDL)
    out = winsorize(df, "k", "v", "id", q_lo=(10, 100), q_hi=(90, 100))
    assert out.count() == 10  # nothing dropped
    got = {r["id"]: r["clamped"] for r in out.collect()}
    assert got[9] == 9  # 1000 clipped to the p90 bound (rank 9 -> value 9)
    assert got[0] == 1  # p10 bound is rank 1 -> value 1: unchanged


def test_idempotent(spark):
    rng = random.Random(22)
    rows = [("g", rng.randrange(1000), i) for i in range(80)]
    df = spark.createDataFrame(rows, DDL)
    once = winsorize(df, "k", "v", "id", q_lo=(5, 100), q_hi=(95, 100))
    again = winsorize(
        once.select("k", once["clamped"].alias("v"), "id"),
        "k", "v", "id", q_lo=(5, 100), q_hi=(95, 100),
    )
    a = sorted((r["id"], r["clamped"]) for r in once.collect())
    b = sorted((r["id"], r["clamped"]) for r in again.collect())
    assert a == b


def test_groups_isolated(spark):
    rows = [("a", v, i) for i, v in enumerate(range(10))]
    rows += [("b", v * 100, 50 + v) for v in range(10)]
    df = spark.createDataFrame(rows, DDL)
    out = winsorize(df, "k", "v", "id", q_lo=(10, 100), q_hi=(90, 100))
    bounds = {r["k"]: (r["lo"], r["hi"]) for r in out.collect()}
    assert bounds["a"] == (0, 8)
    assert bounds["b"] == (0, 800)
