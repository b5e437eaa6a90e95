"""G4 tick-crossing swap simulation (pricing/univ3_swap.py): AMM
invariants, crossing semantics, fee accounting, and the Arrow-batched
bulk-quote wrapper."""

from __future__ import annotations

from decimal import Decimal

from brontes_spark.pricing.univ3 import Q96, get_sqrt_ratio_at_tick
from brontes_spark.pricing.univ3_swap import univ3_swap_exact_in

L = 10**18


def _virtual_reserves(sqrt_p: int, liq: int) -> tuple[float, float]:
    return liq * Q96 / sqrt_p, liq * sqrt_p / Q96


def test_single_range_swap_constant_product_invariant():
    q = univ3_swap_exact_in(
        amount_in=10**15, zero_for_one=True, sqrt_price_x96=Q96,
        liquidity=L, tick=0, tick_liquidity=[], fee_pips=0,
    )
    # price falls, token1 comes out
    assert q["sqrt_price_after"] < Q96 and q["amount_out"] > 0
    assert q["ticks_crossed"] == 0 and q["fee_paid"] == 0
    # x·y = L² holds before and (up to pool-favoring rounding) after
    x0, y0 = _virtual_reserves(Q96, L)
    x1, y1 = _virtual_reserves(q["sqrt_price_after"], L)
    k0, k1 = x0 * y0, (x0 + 10**15) * (y0 - q["amount_out"])
    assert k1 >= k0 * (1 - 1e-12)  # rounding never favors the swapper
    assert abs(k1 - k0) / k0 < 1e-6
    # tiny swap executes ~at spot (price 1.0 at tick 0)
    assert abs(q["amount_out"] / 10**15 - 1.0) < 1e-3


def test_direction_and_monotonicity():
    up = univ3_swap_exact_in(10**15, False, Q96, L, 0, [], fee_pips=0)
    assert up["sqrt_price_after"] > Q96
    small = univ3_swap_exact_in(10**14, True, Q96, L, 0, [], fee_pips=0)
    big = univ3_swap_exact_in(10**16, True, Q96, L, 0, [], fee_pips=0)
    assert big["amount_out"] > small["amount_out"] > 0


def test_tick_crossing_drops_inner_liquidity():
    # inner position [-60, 60] adds N on top of background L
    N = 5 * 10**17
    ticks = [(-60, N), (60, -N)]
    # swap down far enough to cross -60
    q = univ3_swap_exact_in(
        amount_in=6 * 10**15, zero_for_one=True, sqrt_price_x96=Q96,
        liquidity=L + N, tick=0, tick_liquidity=ticks, fee_pips=0,
    )
    assert q["ticks_crossed"] == 1
    assert q["liquidity_after"] == L  # inner N gone below -60
    assert q["sqrt_price_after"] < get_sqrt_ratio_at_tick(-60)
    assert q["tick_after"] <= -61

    # same swap UP crosses +60 and also sheds N
    q2 = univ3_swap_exact_in(
        amount_in=6 * 10**15, zero_for_one=False, sqrt_price_x96=Q96,
        liquidity=L + N, tick=0, tick_liquidity=ticks, fee_pips=0,
    )
    assert q2["ticks_crossed"] == 1 and q2["liquidity_after"] == L
    assert q2["sqrt_price_after"] > get_sqrt_ratio_at_tick(60)


def test_closed_form_half_price_swap():
    """INDEPENDENT golden (directive r3#4): single position, no crossing,
    no fee — solvable by hand from x·y=k without running the walker.
    At tick 0 the virtual reserves are x = y = L; swapping in exactly
    x (= L) of token0 doubles x, so the price exactly halves
    (sqrt' = Q96/2, exact: Q96 is a power of two) and the output is
    exactly y/2 = L/2. Symmetrically for token1 in."""
    q = univ3_swap_exact_in(L, True, Q96, L, 0, [], fee_pips=0)
    assert q["sqrt_price_after"] == Q96 // 2
    assert q["amount_out"] == L // 2
    assert q["fee_paid"] == 0 and q["ticks_crossed"] == 0

    q1 = univ3_swap_exact_in(L, False, Q96, L, 0, [], fee_pips=0)
    assert q1["sqrt_price_after"] == 2 * Q96
    assert q1["amount_out"] == L // 2


def test_closed_form_fee_swap_independent_formula():
    """INDEPENDENT golden with fee: expected values derived IN THE TEST
    from the published SqrtPriceMath formulas with exact integer
    arithmetic — no walker helper is called. exact-in token0, one range:
      in_net = in·(1e6−fee)/1e6          (fee withheld from input)
      sqrt'  = ceil(L·Q96·sqrt/(L·Q96 + in_net·sqrt))   (rounds up: against swapper)
      out    = floor(L·(sqrt−sqrt')/Q96)               (rounds down)
    """
    amount_in, fee_pips = 10**18, 3000
    in_net = amount_in * (1_000_000 - fee_pips) // 1_000_000  # exact: 997e15
    assert in_net * 1_000_000 == amount_in * (1_000_000 - fee_pips)
    expected_sqrt = -(-(L * Q96 * Q96) // (L * Q96 + in_net * Q96))
    expected_out = L * (Q96 - expected_sqrt) // Q96
    q = univ3_swap_exact_in(amount_in, True, Q96, L, 0, [], fee_pips=fee_pips)
    assert q["sqrt_price_after"] == expected_sqrt
    assert q["amount_out"] == expected_out
    assert q["fee_paid"] == amount_in - in_net
    assert q["ticks_crossed"] == 0


def test_fee_accounting():
    free = univ3_swap_exact_in(10**15, True, Q96, L, 0, [], fee_pips=0)
    paid = univ3_swap_exact_in(10**15, True, Q96, L, 0, [], fee_pips=3000)
    assert paid["amount_out"] < free["amount_out"]
    # 30 bps of input, and the fee leaves the swappable amount exactly
    assert abs(paid["fee_paid"] - 10**15 * 0.003) / 10**15 < 1e-4


def test_bulk_quote_wrapper(spark):
    """Cogrouped bulk quoting: state/ticks ride as DataFrames keyed on
    pool — never driver dicts or task closures. A request for a pool with
    no state row is dropped (unquotable), a pool with no ticks quotes
    against an empty table."""
    from brontes_spark.pricing.univ3_swap import univ3_quote_batch

    tick_rows = [(-60, 5 * 10**17), (60, -5 * 10**17)]
    state = spark.createDataFrame(
        [("0xp", str(Q96), str(L), 0), ("0xq", str(Q96), str(L), 0)],
        "pool string, sqrt_price string, liquidity string, tick int",
    )
    ticks = spark.createDataFrame(
        [("0xp", t, str(n)) for t, n in tick_rows],
        "pool string, tick int, liquidity_net string",
    )
    reqs = spark.createDataFrame(
        [("0xp", Decimal(10**15), True), ("0xp", Decimal(10**15), False),
         ("0xq", Decimal(10**15), True), ("0xmissing", Decimal(10**15), True)],
        "pool string, amount_in decimal(38,0), zero_for_one boolean",
    )
    out = univ3_quote_batch(reqs, state, ticks, fee_pips=0).collect()
    assert {r["pool"] for r in out} == {"0xp", "0xq"}  # 0xmissing dropped
    got = {r["zero_for_one"]: r for r in out if r["pool"] == "0xp"}
    ref_down = univ3_swap_exact_in(10**15, True, Q96, L + 0, 0, tick_rows, 0)
    assert got[True]["amount_out"] == Decimal(ref_down["amount_out"])
    assert got[False]["amount_out"] > 0
    # tickless pool == single-range walker
    ref_q = univ3_swap_exact_in(10**15, True, Q96, L, 0, [], 0)
    (q_row,) = [r for r in out if r["pool"] == "0xq"]
    assert q_row["amount_out"] == Decimal(ref_q["amount_out"])


def test_zero_liquidity_gap_crossed_to_next_position():
    """Two disjoint positions with a dead zone between them: a swap that
    exhausts the first position must WALK the zero-liquidity gap (at zero
    cost) and keep filling from the second position, exactly like Uniswap's
    computeSwapStep — not stop at the gap with input unconsumed."""
    # position A on [10, 20] (we start inside it at tick 15), position B on
    # [-20, -10]; nothing in between. zero_for_one pushes the price down.
    ticks = [(10, L), (20, -L), (-20, L), (-10, -L)]
    start = get_sqrt_ratio_at_tick(15)
    # ~2.5e14 exhausts A (ticks 15->10); 4e14 lands partway into B
    q = univ3_swap_exact_in(
        amount_in=4 * 10**14, zero_for_one=True, sqrt_price_x96=start,
        liquidity=L, tick=15, tick_liquidity=ticks, fee_pips=0,
    )
    # the swap crossed A's lower bound (10), the gap boundary (-10), and
    # ended inside (or past) position B with more output than A alone gives
    a_only = univ3_swap_exact_in(
        amount_in=4 * 10**14, zero_for_one=True, sqrt_price_x96=start,
        liquidity=L, tick=15, tick_liquidity=[(10, L), (20, -L)], fee_pips=0,
    )
    assert q["ticks_crossed"] >= 2
    assert q["amount_out"] > a_only["amount_out"]
    assert q["sqrt_price_after"] < get_sqrt_ratio_at_tick(-10)
    # and with liquidity live again, the final state is inside B
    assert q["liquidity_after"] == L


def test_salted_hot_pool_quotes_identical_and_spread(spark):
    """Directive r4#5: a 100:1 hot-pool request skew quoted through the
    salted path (salt=4) must return results BIT-IDENTICAL to the unsalted
    cogroup, and the salted plan must shuffle on (pool, salt) so the hot
    pool's requests fan out across salt buckets instead of one task."""
    from brontes_spark.pricing.univ3_swap import univ3_quote_batch

    tick_rows = [(-60, 5 * 10**17), (60, -5 * 10**17)]
    state = spark.createDataFrame(
        [("0xhot", str(Q96), str(L), 0), ("0xcold", str(Q96), str(L), 0)],
        "pool string, sqrt_price string, liquidity string, tick int",
    )
    ticks = spark.createDataFrame(
        [(p, t, str(n)) for p in ("0xhot", "0xcold") for t, n in tick_rows],
        "pool string, tick int, liquidity_net string",
    )
    # 200 hot requests vs 2 cold ones (100:1), varying amounts so the salt
    # hash actually spreads them
    req_rows = [
        ("0xhot", Decimal(10**13 * (i + 1)), i % 2 == 0) for i in range(200)
    ] + [("0xcold", Decimal(10**15), True), ("0xcold", Decimal(10**15), False)]
    reqs = spark.createDataFrame(
        req_rows, "pool string, amount_in decimal(38,0), zero_for_one boolean"
    )

    def key(r):
        return (r["pool"], r["amount_in"], r["zero_for_one"])

    plain = {key(r): r.asDict() for r in univ3_quote_batch(reqs, state, ticks).collect()}
    salted_df = univ3_quote_batch(reqs, state, ticks, salt=4)
    salted = {key(r): r.asDict() for r in salted_df.collect()}
    assert salted == plain  # bit-identical quotes, every request answered once

    # plan evidence: the cogroup exchange hashes on pool AND salt
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan and "FlatMapCoGroupsInPandas" in plan

    # the salt really spreads the hot pool: >1 distinct bucket over its reqs
    from pyspark.sql import functions as F

    n_buckets = (
        reqs.filter("pool = '0xhot'")
        .select(
            F.pmod(
                F.xxhash64(F.col("amount_in").cast("string"), "zero_for_one"),
                F.lit(4),
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert n_buckets > 1
