"""HyperLogLog sketch (operators/sketches.hll_*): registers against an
independent pure-Python reference over the same md5 hash, merge == full
build, exact integer raw-estimate arithmetic, and accuracy envelopes in
both the linear-counting and raw regimes."""

from __future__ import annotations

import hashlib
from fractions import Fraction

from brontes_spark.operators.sketches import (
    _hll_alpha,
    hll_distinct,
    hll_merge,
    hll_sketch,
)

P = 6
M = 1 << P
W_BITS = 60 - P


def _h(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def _py_registers(values):
    regs = {}
    for v in set(values):
        hv = _h(v)
        bucket = hv >> W_BITS
        w = hv & ((1 << W_BITS) - 1)
        rho = (W_BITS + 1) if w == 0 else W_BITS - w.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _vals(n, tag="v"):
    return [f"{tag}{i}" for i in range(n)]


def test_registers_match_python_reference(spark):
    vals = _vals(500)
    df = spark.createDataFrame([("k", v) for v in vals], "key string, v string")
    got = {
        r.bucket: r.rho_max for r in hll_sketch(df, "key", "v", p=P).collect()
    }
    assert got == _py_registers(vals)


def test_merge_equals_full_build(spark):
    vals = _vals(800)
    df = spark.createDataFrame([("k", v) for v in vals], "key string, v string")
    a = hll_sketch(df.filter("v < 'v4'"), "key", "v", p=P)
    b = hll_sketch(df.filter("v >= 'v4'"), "key", "v", p=P)
    full = {(r.bucket, r.rho_max) for r in hll_sketch(df, "key", "v", p=P).collect()}
    merged = {(r.bucket, r.rho_max) for r in hll_merge(a, b).collect()}
    assert merged == full


def test_raw_estimate_integer_arithmetic(spark):
    vals = _vals(3000)
    df = spark.createDataFrame([("k", v) for v in vals], "key string, v string")
    row = hll_distinct(df, "key", "v", p=P).collect()[0]
    regs = _py_registers(vals)
    b = 61 - P
    s_num = sum(1 << (b - r) for r in regs.values()) + (M - len(regs)) * (1 << b)
    a_num, a_den = _hll_alpha(M)
    want_raw = int(Fraction(a_num * M * M * (1 << b), a_den * s_num))
    assert (row.n_buckets, row.zeros, row.s_num, row.raw_est) == (
        len(regs), M - len(regs), s_num, want_raw
    )


def test_accuracy_envelopes(spark):
    # HLL std error is 1.04/sqrt(m) ~ 13% at m=64; assert a generous 3-sigma
    # band in the raw regime and near-exactness in linear counting
    for n, tol in ((20, 0.15), (150, 0.3), (5000, 0.4), (20000, 0.4)):
        df = spark.createDataFrame(
            [("k", v) for v in _vals(n, tag=f"x{n}_")], "key string, v string"
        )
        est = hll_distinct(df, "key", "v", p=P).collect()[0].est_distinct
        assert abs(est - n) / n < tol, (n, est)


def test_duplicates_do_not_move_registers(spark):
    df1 = spark.createDataFrame(
        [("k", f"v{i % 50}") for i in range(5000)], "key string, v string"
    )
    df2 = spark.createDataFrame(
        [("k", f"v{i}") for i in range(50)], "key string, v string"
    )
    r1 = sorted(map(tuple, hll_sketch(df1, "key", "v", p=P).collect()))
    r2 = sorted(map(tuple, hll_sketch(df2, "key", "v", p=P).collect()))
    assert r1 == r2


def test_null_values_are_not_set_members(spark):
    """NULLs must not emit register rows (a NULL hash would also rank
    differently across engines in the KMV order) — same bug class as the
    bloom NULL fix."""
    from brontes_spark.operators.sketches import countmin_sketch, kmv_sketch

    df = spark.createDataFrame(
        [("k", None), ("k", "a"), ("k", None)], "key string, v string"
    )
    hll = hll_sketch(df, "key", "v", p=4).collect()
    assert len(hll) == 1 and all(r.bucket is not None for r in hll)
    kmv = kmv_sketch(df, "key", "v", k=8).collect()
    assert len(kmv) == 1 and kmv[0].hv is not None
    cm = countmin_sketch(df.select("v"), "v", width=8, depth=2).collect()
    assert all(r.col is not None for r in cm)
    assert sum(r.cnt for r in cm) == 2  # one value, two depth rows
