"""Property-based tests (hypothesis — the analog of the reference's
randomized coverage, SURVEY.md §5): generated inputs vs naive in-Python
oracles for the custom kernels that carry the most semantic weight."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from brontes_spark.functions.keccak import keccak256
from brontes_spark.pricing.univ3 import (
    MAX_TICK,
    MIN_TICK,
    get_sqrt_ratio_at_tick,
    get_tick_at_sqrt_ratio,
)

# -- driver-side math: cheap per-example, wide sampling ----------------------


@given(st.integers(min_value=MIN_TICK, max_value=MAX_TICK))
@settings(max_examples=200, deadline=None)
def test_tick_ratio_roundtrip_property(tick):
    r = get_sqrt_ratio_at_tick(tick)
    assert get_tick_at_sqrt_ratio(r) == tick
    if tick > MIN_TICK:
        # 1 below the boundary belongs to the previous tick
        assert get_tick_at_sqrt_ratio(r - 1) == tick - 1


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=100, deadline=None)
def test_keccak_padding_boundaries(data):
    # digest is always 32 bytes and deterministic across calls — exercises
    # every padding branch incl. the rate-1 single-byte 0x81 case
    d1, d2 = keccak256(data), keccak256(data)
    assert d1 == d2 and len(d1) == 32
    if data:
        assert keccak256(data[:-1]) != d1


# -- Spark kernels: ONE generated bulk example per run (JVM round-trips are
#    the cost; the bulk data inside the example is where the variety lives)


def test_asof_join_matches_naive_oracle(spark):
    import random

    rng = random.Random(42)
    keys = ["a", "b", "c"]
    updates = [
        (k, rng.randint(0, 1000), i)
        for i, k in enumerate(rng.choices(keys, k=60))
    ]
    probes = [(k, rng.randint(0, 1000)) for k in rng.choices(keys, k=80)]

    from brontes_spark.operators.asof import asof_join

    r = spark.createDataFrame(updates, "k string, t long, val long")
    l = spark.createDataFrame(probes, "k string, t long")
    got = {
        (row["k"], row["t"], i): row["r_val"]
        for i, row in enumerate(
            asof_join(l, r, ["k"], "t", "t", how="left")
            .orderBy("k", "t")
            .collect()
        )
    }

    def naive(k, t):
        cands = [(ut, i, v) for (uk, ut, v) in updates if uk == k and ut <= t
                 for i in [v]]
        if not cands:
            return None
        # latest update wins; ties broken by later insertion order (the
        # kernel's window keeps the LAST row at equal timestamps)
        return max(cands)[2]

    want_sorted = sorted(probes)
    got_sorted = sorted(got.keys())
    assert len(got) == len(probes)
    for (gk, gt, _i) in got_sorted:
        assert got[(gk, gt, _i)] == naive(gk, gt), (gk, gt)
