"""UniswapV3 tick-crossing swap simulation — the price-math half of G4
(SURVEY.md §2.6 "exact UniV2 (x*y=k) & UniV3 (tick-crossing) price math";
reference uniswap_v3_math/{tick_math,tick_bitmap,bit_math}.rs provide the
primitives, the pool struct holds the per-tick liquidity table it walks).

Exact integer math throughout (Python ints = unbounded, matching U256
semantics); rounding directions mirror the published SqrtPriceMath
conventions: prices round AGAINST the swapper (next-sqrt-price rounds up
when price falls, down when it rises) and output amounts round down.
Fees are charged on the input consumed per step at `fee_pips`/1e6 (the
pool-fee model; protocol-fee split not modeled — documented divergence).

Driver-side single-quote function + an Arrow-batched cogrouped
`applyInPandas` wrapper for bulk quoting: requests cogroup with the pool
state/tick DataFrames on the pool key, so no pool metadata ever rides the
driver or a task closure (the scale requirement at ~10^4-10^6 pools).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .univ3 import (
    MAX_TICK,
    MIN_TICK,
    Q96,
    get_sqrt_ratio_at_tick,
    get_tick_at_sqrt_ratio,
)

FEE_DENOM = 1_000_000


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _amount0_delta(sqrt_a: int, sqrt_b: int, liquidity: int, round_up: bool) -> int:
    """token0 between two sqrt prices: L·Q96·(√Pb−√Pa)/(√Pb·√Pa)."""
    if sqrt_a > sqrt_b:
        sqrt_a, sqrt_b = sqrt_b, sqrt_a
    num = liquidity * Q96 * (sqrt_b - sqrt_a)
    den = sqrt_b * sqrt_a
    return _ceil_div(num, den) if round_up else num // den


def _amount1_delta(sqrt_a: int, sqrt_b: int, liquidity: int, round_up: bool) -> int:
    """token1 between two sqrt prices: L·(√Pb−√Pa)/Q96."""
    if sqrt_a > sqrt_b:
        sqrt_a, sqrt_b = sqrt_b, sqrt_a
    num = liquidity * (sqrt_b - sqrt_a)
    return _ceil_div(num, Q96) if round_up else num // Q96


def _next_sqrt_from_amount0_in(sqrt_p: int, liquidity: int, amount: int) -> int:
    # price falls; round UP (against the swapper)
    num = liquidity * Q96 * sqrt_p
    den = liquidity * Q96 + amount * sqrt_p
    return _ceil_div(num, den)


def _next_sqrt_from_amount1_in(sqrt_p: int, liquidity: int, amount: int) -> int:
    # price rises; round DOWN
    return sqrt_p + (amount * Q96) // liquidity


def univ3_swap_exact_in(
    amount_in: int,
    zero_for_one: bool,
    sqrt_price_x96: int,
    liquidity: int,
    tick: int,
    tick_liquidity: list[tuple[int, int]],
    fee_pips: int = 3000,
) -> dict:
    """Simulate an exact-input swap with tick crossing.

    `tick_liquidity`: [(tick, liquidity_net), ...] — the per-pool table
    from pricing.univ3.univ3_tick_liquidity (liquidity_net added when the
    price crosses the tick moving UP, subtracted moving DOWN).

    Returns dict(amount_out, fee_paid, sqrt_price_after, tick_after,
    liquidity_after, ticks_crossed).
    """
    # one sort + dict per request, then O(log ticks) next-tick lookups per
    # crossing via bisect (the earlier per-step linear scans re-filtered the
    # whole table and rebuilt dict(ticks) every crossing — O(ticks²) worst
    # case per request; the reference walks a tick BITMAP word at a time,
    # tick_bitmap.rs next_initialized_tick_within_one_word, same O(log)/O(1)
    # spirit)
    import bisect

    ticks = sorted(tick_liquidity)
    tick_keys = [t for t, _ in ticks]
    net_by_tick = dict(ticks)
    sqrt_p, liq = sqrt_price_x96, liquidity
    remaining = amount_in
    out = fee_total = crossed = 0

    # loop on remaining input ONLY: liq == 0 is a zero-liquidity GAP between
    # positions, not exhaustion — the full-step branch walks across it at
    # zero cost (in_to_boundary = 0 ⇒ step_in = 0) until liquidity returns,
    # exactly Uniswap's computeSwapStep behavior; MIN/MAX clamp still breaks.
    while remaining > 0:
        i = bisect.bisect_right(tick_keys, tick)
        if zero_for_one:
            # largest initialized tick <= current tick
            next_tick = tick_keys[i - 1] if i > 0 else MIN_TICK
        else:
            # smallest initialized tick > current tick
            next_tick = tick_keys[i] if i < len(tick_keys) else MAX_TICK
        boundary = get_sqrt_ratio_at_tick(next_tick)

        # input needed (pre-fee) to push the price to the boundary
        if zero_for_one:
            in_to_boundary = _amount0_delta(boundary, sqrt_p, liq, round_up=True)
        else:
            in_to_boundary = _amount1_delta(sqrt_p, boundary, liq, round_up=True)
        in_after_fee = (remaining * (FEE_DENOM - fee_pips)) // FEE_DENOM

        if in_after_fee >= in_to_boundary:
            # full step to the boundary (consume exactly in_to_boundary)
            step_in = in_to_boundary
            new_sqrt = boundary
            if zero_for_one:
                out += _amount1_delta(new_sqrt, sqrt_p, liq, round_up=False)
            else:
                out += _amount0_delta(sqrt_p, new_sqrt, liq, round_up=False)
            # fee on the consumed input, rounded against the swapper
            fee = _ceil_div(step_in * fee_pips, FEE_DENOM - fee_pips)
            remaining -= step_in + fee
            fee_total += fee
            sqrt_p = new_sqrt
            if next_tick in (MIN_TICK, MAX_TICK):
                # tick table exhausted: the pool clamps at MIN/MAX_SQRT_RATIO;
                # leftover input is NOT consumed past the boundary
                tick = get_tick_at_sqrt_ratio(sqrt_p)
                break
            net = net_by_tick.get(next_tick, 0)
            liq += -net if zero_for_one else net
            tick = next_tick - 1 if zero_for_one else next_tick
            crossed += 1
        else:
            # final partial step inside the current range
            step_in = in_after_fee
            if step_in <= 0:
                break
            if zero_for_one:
                new_sqrt = _next_sqrt_from_amount0_in(sqrt_p, liq, step_in)
                out += _amount1_delta(new_sqrt, sqrt_p, liq, round_up=False)
            else:
                new_sqrt = _next_sqrt_from_amount1_in(sqrt_p, liq, step_in)
                out += _amount0_delta(sqrt_p, new_sqrt, liq, round_up=False)
            fee_total += remaining - step_in
            remaining = 0
            sqrt_p = new_sqrt
            tick = get_tick_at_sqrt_ratio(sqrt_p)
    return dict(
        amount_out=out,
        fee_paid=fee_total,
        sqrt_price_after=sqrt_p,
        tick_after=tick,
        liquidity_after=liq,
        ticks_crossed=crossed,
    )


_QUOTE_SCHEMA = (
    "pool string, amount_in decimal(38,0), zero_for_one boolean, "
    "amount_out decimal(38,0), fee_paid decimal(38,0), "
    "tick_after int, liquidity_after decimal(38,0), ticks_crossed int"
)
_QUOTE_COLS = [
    "pool", "amount_in", "zero_for_one", "amount_out", "fee_paid",
    "tick_after", "liquidity_after", "ticks_crossed",
]


def univ3_quote_batch(
    requests: DataFrame,
    pool_state: DataFrame,
    pool_ticks: DataFrame,
    fee_pips: int = 3000,
    salt: int | None = None,
) -> DataFrame:
    """Bulk quoting as a cogrouped `applyInPandas` on `pool` — the
    scale-safe shape for the walker (reference uniswap_v3/mod.rs:160-493 +
    uniswap_v3_math): both sides shuffle on the pool key, so each task sees
    one pool's requests next to that pool's state row and tick table, and
    NOTHING rides the driver or the task closure. At mainnet scale
    (~10^4-10^6 V3 pools × tick arrays) the previous closure-dict variant
    serialized every pool's ticks into every task; here a pool's ticks move
    once, to the one task that quotes it.

    `requests`:    pool string, amount_in decimal(38,0), zero_for_one boolean
    `pool_state`:  pool, sqrt_price, liquidity, tick — one row per pool
                   (U256-scale columns may be string or decimal; cast-safe)
    `pool_ticks`:  pool, tick, liquidity_net — per-pool net-liquidity table

    Requests for a pool with no state row are dropped (unquotable pool —
    the caller decides whether that's an error).

    Skew: one hot pool's requests land in one task by default (the walker
    is O(log ticks) per crossing after the per-batch table sort, so this
    is fine until a single pool dominates the request volume). ``salt=k``
    splits each pool's requests across k cogroup keys — requests get a
    deterministic content-hash salt, and the (tiny) state/ticks metadata
    is replicated k ways with an explode, NOT a shuffle of the big side —
    so the hot pool fans out over k tasks with bit-identical results
    (each task still sees the full pool table). The extra cost is k-1
    redundant metadata copies, which is why it is opt-in.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    # one metadata relation for the right side of the cogroup: the state
    # row (row_kind 0: v1=sqrt_price, v2=liquidity) unioned with the tick
    # table (row_kind 1: v1=liquidity_net). U256-scale cells ride as
    # strings — Arrow round-trips them losslessly; Python int() re-widens.
    meta = pool_state.select(
        "pool",
        F.lit(0).alias("row_kind"),
        F.col("sqrt_price").cast("string").alias("v1"),
        F.col("liquidity").cast("string").alias("v2"),
        F.col("tick").cast("int").alias("tick"),
    ).unionByName(
        pool_ticks.select(
            "pool",
            F.lit(1).alias("row_kind"),
            F.col("liquidity_net").cast("string").alias("v1"),
            F.lit(None).cast("string").alias("v2"),
            F.col("tick").cast("int").alias("tick"),
        )
    )

    def quote(reqs: pd.DataFrame, meta_pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import Decimal

        state = meta_pdf[meta_pdf["row_kind"] == 0]
        if reqs.empty or state.empty:
            return pd.DataFrame(columns=_QUOTE_COLS)
        st = state.iloc[0]
        sqrt_p, liq, tick0 = int(st["v1"]), int(st["v2"]), int(st["tick"])
        table = [
            (int(r.tick), int(r.v1))
            for r in meta_pdf[meta_pdf["row_kind"] == 1].itertuples(index=False)
        ]
        rows = []
        for r in reqs.itertuples(index=False):
            q = univ3_swap_exact_in(
                int(r.amount_in), bool(r.zero_for_one), sqrt_p, liq, tick0,
                table, fee_pips,
            )
            rows.append(
                dict(
                    pool=r.pool, amount_in=Decimal(int(r.amount_in)),
                    zero_for_one=bool(r.zero_for_one),
                    amount_out=Decimal(q["amount_out"]),
                    fee_paid=Decimal(q["fee_paid"]),
                    tick_after=q["tick_after"],
                    liquidity_after=Decimal(q["liquidity_after"]),
                    ticks_crossed=q["ticks_crossed"],
                )
            )
        return pd.DataFrame(rows, columns=_QUOTE_COLS)

    if salt is None:
        return (
            requests.groupBy("pool")
            .cogroup(meta.groupBy("pool"))
            .applyInPandas(quote, schema=_QUOTE_SCHEMA)
        )

    # hot-pool path: spread each pool's requests over `salt` cogroup keys.
    # The request salt is a content hash (deterministic, no rand()) and the
    # quote result never reads it, so salted output == unsalted output.
    salted_reqs = requests.withColumn(
        "salt",
        F.pmod(
            F.xxhash64(F.col("amount_in").cast("string"), "zero_for_one"),
            F.lit(salt),
        ).cast("int"),
    )
    salted_meta = meta.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return (
        salted_reqs.groupBy("pool", "salt")
        .cogroup(salted_meta.groupBy("pool", "salt"))
        .applyInPandas(quote, schema=_QUOTE_SCHEMA)
    )
