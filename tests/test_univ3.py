"""G4 UniswapV3: exact tick math + event-sourced state replay
(pricing/univ3.py; reference uniswap_v3/mod.rs:160-493, tick_math.rs)."""

from __future__ import annotations

from decimal import Decimal

from brontes_spark.pricing.univ3 import (
    MAX_SQRT_RATIO,
    MAX_TICK,
    MIN_SQRT_RATIO,
    MIN_TICK,
    Q96,
    get_sqrt_ratio_at_tick,
    get_tick_at_sqrt_ratio,
    univ3_pool_state,
    univ3_price,
    univ3_tick_liquidity,
)
from brontes_spark.sources.fixtures import load_fixtures

D = Decimal


def test_tick_math_published_vectors():
    """INDEPENDENT goldens: Uniswap's published TickMath boundary values
    (v3-core TickMath.sol constants + test vectors) — not derived from this
    implementation. A match proves the ladder is bit-exact with on-chain
    behavior and with the reference's tick_math.rs port."""
    # tick 0 is exactly Q96 (1.0001^0 = 1)
    assert get_sqrt_ratio_at_tick(0) == Q96
    # published MIN_SQRT_RATIO / MAX_SQRT_RATIO constants
    assert MIN_SQRT_RATIO == 4295128739
    assert MAX_SQRT_RATIO == 1461446703485210103287273052203988822378723970342
    assert get_sqrt_ratio_at_tick(MIN_TICK) == MIN_SQRT_RATIO
    assert get_sqrt_ratio_at_tick(MAX_TICK) == MAX_SQRT_RATIO
    # ±1 tick vectors (note the Solidity round-UP conversion: one above the
    # exact floor of sqrt(1.0001^±1)·2^96)
    assert get_sqrt_ratio_at_tick(1) == 79232123823359799118286999568
    assert get_sqrt_ratio_at_tick(-1) == 79224201403219477170569942574
    # strictly increasing
    prev = 0
    for t in (-887272, -100000, -1, 0, 1, 100000, 887272):
        cur = get_sqrt_ratio_at_tick(t)
        assert cur > prev
        prev = cur


def test_tick_math_roundtrip_invariant():
    for t in (-887272, -443636, -60, -1, 0, 1, 60, 205923, 887271, 887272):
        r = get_sqrt_ratio_at_tick(t)
        # invariant: greatest tick whose ratio <= r
        assert get_tick_at_sqrt_ratio(r) == t
        if t > MIN_TICK:
            assert get_tick_at_sqrt_ratio(r - 1) == t - 1


def test_univ3_state_replay(spark):
    t = load_fixtures(spark)
    state = {
        (r["pool"], r["block_number"], r["tx_index"]): r.asDict()
        for r in univ3_pool_state(t["univ3_events"], t["univ3_initial"]).collect()
    }
    assert len(state) == 11

    # P3: in-range mint raises active liquidity; above-range mint doesn't
    m1 = state[("0xv3pool1", 200, 0)]
    assert m1["liquidity_pre"] == D(1_000_000)
    assert m1["liquidity_post"] == D(1_500_000)
    assert m1["tick_post"] == 0 and m1["r0_post"] == D(11 * 10**17)
    m2 = state[("0xv3pool1", 200, 1)]
    assert m2["liquidity_post"] == D(1_500_000)  # tick 0 not in (60, 120)
    assert m2["r0_post"] == D(13 * 10**17)

    # swap resets (sqrt, liquidity, tick) absolutely, reserves additive
    s1 = state[("0xv3pool1", 200, 2)]
    assert s1["tick_pre"] == 0 and s1["tick_post"] == -30
    assert s1["sqrt_price_post"] == D(get_sqrt_ratio_at_tick(-30))
    assert s1["r0_post"] == D(14 * 10**17)
    assert s1["r1_post"] == D(101 * 10**16)

    # post-swap mint applies at the NEW tick (-30 in (-60, 0))
    assert state[("0xv3pool1", 201, 0)]["liquidity_post"] == D(1_700_000)
    # second swap drops liquidity to the event's absolute payload
    s2 = state[("0xv3pool1", 201, 1)]
    assert s2["liquidity_pre"] == D(1_700_000)
    assert s2["liquidity_post"] == D(800_000)
    # in-range burn subtracts; above-range burn doesn't
    assert state[("0xv3pool1", 202, 0)]["liquidity_post"] == D(300_000)
    assert state[("0xv3pool1", 202, 1)]["liquidity_post"] == D(300_000)

    # P4: mint at tick == tick_lower is OUT of range (strict bounds,
    # mod.rs:377 — reference diverges from Uniswap core here; we mirror it)
    at_lower = state[("0xv3pool2", 200, 1)]
    assert at_lower["liquidity_post"] == D(50_000)
    # mints before any swap fall back to the initial state's tick
    assert at_lower["tick_post"] == -30


def test_univ3_tick_liquidity(spark):
    t = load_fixtures(spark)
    nets = {
        (r["pool"], r["tick"]): r["liquidity_net"]
        for r in univ3_tick_liquidity(t["univ3_events"]).collect()
    }
    # fully-cancelled ticks (±120, 60 on P3; 0, 60 on P4) dropped
    assert nets == {
        ("0xv3pool1", -60): D(200_000),
        ("0xv3pool1", 0): D(-200_000),
        ("0xv3pool2", -30): D(40_000),
        ("0xv3pool2", 30): D(-40_000),
    }


def test_univ3_price_and_liquidity_floor(spark):
    t = load_fixtures(spark)
    state = univ3_pool_state(t["univ3_events"], t["univ3_initial"])
    pools = spark.createDataFrame(
        [("0xv3pool1", 18, 6), ("0xv3pool2", 18, 18)],
        "pool string, token0_decimals int, token1_decimals int",
    )
    priced = {
        (r["pool"], r["block_number"], r["tx_index"]): r["price0_in_1"]
        for r in univ3_price(state, pools).collect()
    }
    # calculate_price (mod.rs:189-211): 1.0001^tick * 10^(dec0-dec1)
    assert priced[("0xv3pool1", 200, 2)] == 1.0001**-30 * 10.0**12
    assert priced[("0xv3pool2", 201, 0)] == 1.0001**15
    # liquidity floor: burn leaves P4 at 40_000 > 10_000 (priced) but a
    # pool at/below 10_000 prices null
    assert priced[("0xv3pool2", 202, 0)] is not None
    low = univ3_pool_state(
        t["univ3_events"].filter("pool = '0xv3pool2' AND kind = 'mint'"),
        t["univ3_initial"].withColumn("liquidity", F_lit_dec(9_000)),
    )
    lp = univ3_price(low, pools).select("price0_in_1").collect()
    assert all(r["price0_in_1"] is None for r in lp)


def F_lit_dec(v):
    from pyspark.sql import functions as F

    return F.lit(Decimal(v)).cast("decimal(38,0)")


def test_g5_per_tx_dex_quotes(spark):
    """G5 DexQuotes double wrapper over the exact tick-sum core."""
    from brontes_spark.pricing.dex import per_tx_dex_quotes
    from brontes_spark.pricing.univ3 import univ3_pool_state

    t = load_fixtures(spark)
    state = univ3_pool_state(t["univ3_events"], t["univ3_initial"]).select(
        "pool", "block_number", "tx_index", "tick_post"
    )
    paths = spark.createDataFrame(
        [("0xtoka", 0, "0xv3pool1", 1), ("0xtoka", 1, "0xv3pool2", 1)],
        "token string, hop_idx int, pool string, sign int",
    )
    grid = spark.createDataFrame(
        [(200, 2), (201, 0)], "block_number long, tx_index int"
    )
    got = {
        (r["block_number"], r["tx_index"]): (r["path_tick"], r["price_in_quote"])
        for r in per_tx_dex_quotes(state, paths, grid).collect()
    }
    # A→B→USD: (200,2) ticks -30 + -30; (201,0) ticks -30 + 15
    assert got[(200, 2)] == (-60, 1.0001**-60)
    assert got[(201, 0)] == (-15, 1.0001**-15)
