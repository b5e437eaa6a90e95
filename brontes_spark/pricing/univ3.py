"""Event-sourced UniswapV3 pool state + exact tick math — the concentrated-
liquidity half of reference G4 (SURVEY.md §2.6,
`brontes-pricing/src/protocols/uniswap_v3/mod.rs:160-493` +
`uniswap_v3_math/tick_math.rs`).

Key insight that keeps this a pure DataFrame plan (no state machine, no
applyInPandasWithState): the reference's `sync_from_log` (mod.rs:169-183)
replays three event kinds, and none of them needs sequential state —

* Swap (mod.rs:463-479) sets `sqrt_price`, `liquidity`, `tick` ABSOLUTELY
  from the event payload and adjusts reserves additively;
* Mint/Burn (mod.rs:341-366) adjust reserves additively and active
  liquidity by ±amount, but only when the CURRENT tick is strictly inside
  (tick_lower, tick_upper) (mod.rs:374-384) — and mint/burn never move the
  tick, so the current tick is constant between consecutive swaps.

So per pool, split the event stream into swap-delimited segments: tick /
sqrt_price / base-liquidity are `last(swap payload)` over a cumulative
window, and the in-range mint/burn adjustment is a segment-relative
cumulative sum — computed as (total cumsum − cumsum at segment start), so
the WHOLE replay is one shuffle on pool and one ordered window. At cluster
scale this parallelizes across pools; per-pool ordering is inherent to the
semantics.

Divergences from the reference, documented:
* The in-range test mirrors the reference's STRICT bounds
  (`tick > lower && tick < upper`, mod.rs:377); Uniswap core itself uses
  `lower <= tick < upper`. We match the reference.
* Raw uint256/uint160 columns are decimal(38,0): covers |x| < 1e38 (every
  real pool; uint160 sqrt ratios above tick ~419k and uint128 liquidity
  above 3.4e38 would not fit — those are degenerate, not observed values).
* Tick math constants are computed at import from the exact definition
  sqrt(1.0001^tick)·2^96 with 90-digit software decimals (deterministic
  across platforms), not Uniswap's hard-coded Q128 magic constants — a few
  boundary ticks may differ from on-chain TickMath by 1 ulp of the ratio.
"""

from __future__ import annotations

from decimal import ROUND_FLOOR, Decimal, localcontext

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

RAW = "decimal(38,0)"

Q96 = 1 << 96
MIN_TICK, MAX_TICK = -887272, 887272

_PREC = 90


def get_sqrt_ratio_at_tick(tick: int) -> int:
    """floor(sqrt(1.0001^tick) · 2^96) — exact-definition twin of the
    reference's `get_sqrt_ratio_at_tick` (tick_math.rs:21-107)."""
    if not MIN_TICK <= tick <= MAX_TICK:
        raise ValueError(f"tick {tick} out of [{MIN_TICK}, {MAX_TICK}]")
    with localcontext() as ctx:
        ctx.prec = _PREC
        return int((Decimal("1.0001") ** tick).sqrt() * Q96)


MIN_SQRT_RATIO = get_sqrt_ratio_at_tick(MIN_TICK)
MAX_SQRT_RATIO = get_sqrt_ratio_at_tick(MAX_TICK)


def get_tick_at_sqrt_ratio(sqrt_price_x96: int) -> int:
    """Greatest tick with get_sqrt_ratio_at_tick(tick) <= sqrt_price_x96 —
    twin of tick_math.rs:110-219. Float-free: a decimal log seed, then exact
    integer comparisons pin the invariant."""
    if not MIN_SQRT_RATIO <= sqrt_price_x96 <= MAX_SQRT_RATIO:
        raise ValueError("sqrt ratio out of range")
    with localcontext() as ctx:
        ctx.prec = _PREC
        seed = (
            (Decimal(sqrt_price_x96) / Q96).ln() * 2 / Decimal("1.0001").ln()
        ).to_integral_value(ROUND_FLOOR)
    tick = max(MIN_TICK, min(MAX_TICK, int(seed)))
    while tick > MIN_TICK and get_sqrt_ratio_at_tick(tick) > sqrt_price_x96:
        tick -= 1
    while tick < MAX_TICK and get_sqrt_ratio_at_tick(tick + 1) <= sqrt_price_x96:
        tick += 1
    return tick


def univ3_pool_state(events: DataFrame, initial_state: DataFrame) -> DataFrame:
    """Per V3 pool event: full pool state BEFORE and AFTER — reserves,
    active liquidity, tick, sqrt_price — via one cumulative window per pool
    (see module docstring for why no state machine is needed).

    `events` columns (UNIV3_EVENTS_SCHEMA): pool, block_number, tx_index,
    trace_idx, kind ('swap'|'mint'|'burn'), amount0/amount1 (signed deltas
    into the pool for swaps; positive magnitudes for mint/burn),
    sqrt_price_x96/liquidity/tick (swap payload, null otherwise),
    tick_lower/tick_upper/amount (mint-burn payload, null otherwise).

    `initial_state`: pool, sqrt_price_x96, liquidity, tick, r0, r1 at range
    start (the batch analog of `populate_data`, mod.rs:214-220) — small dim,
    broadcast.
    """
    w = (
        W.partitionBy("pool")
        .orderBy("block_number", "tx_index", "trace_idx")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_lag = W.partitionBy("pool").orderBy("block_number", "tx_index", "trace_idx")

    init = F.broadcast(
        initial_state.select(
            "pool",
            F.col("sqrt_price_x96").cast(RAW).alias("init_sqrt"),
            F.col("liquidity").cast(RAW).alias("init_liq"),
            F.col("tick").alias("init_tick"),
            F.col("r0").cast(RAW).alias("init_r0"),
            F.col("r1").cast(RAW).alias("init_r1"),
        )
    )

    is_swap = F.col("kind") == "swap"
    sign = F.when(F.col("kind") == "burn", F.lit(-1)).otherwise(F.lit(1))
    ev = (
        events.join(init, "pool")
        .withColumn("d0", (sign * F.col("amount0")).cast(RAW))
        .withColumn("d1", (sign * F.col("amount1")).cast(RAW))
        .withColumn(
            "ldelta",
            F.when(F.col("kind") == "mint", F.col("amount"))
            .when(F.col("kind") == "burn", -F.col("amount"))
            .otherwise(F.lit(0))
            .cast(RAW),
        )
    )

    # segment state: the last swap's absolute payload (or the initial state)
    last_swap = lambda c: F.last(  # noqa: E731
        F.when(is_swap, F.col(c)), ignorenulls=True
    ).over(w)
    ev = (
        ev.withColumn("tick_post", F.coalesce(last_swap("tick"), F.col("init_tick")))
        .withColumn(
            "sqrt_price_post",
            F.coalesce(last_swap("sqrt_price_x96"), F.col("init_sqrt")).cast(RAW),
        )
        .withColumn(
            "base_liq", F.coalesce(last_swap("liquidity"), F.col("init_liq")).cast(RAW)
        )
    )

    # in-range mint/burn liquidity, segment-relative cumsum without a second
    # shuffle: total cumsum minus its value at the segment-opening swap row
    # (the swap row's own ldelta_eff is 0, so its cumsum IS the segment base)
    ldelta_eff = F.when(
        ~is_swap
        & (F.col("tick_post") > F.col("tick_lower"))
        & (F.col("tick_post") < F.col("tick_upper")),
        F.col("ldelta"),
    ).otherwise(F.lit(0)).cast(RAW)
    ev = ev.withColumn("lcum", F.sum(ldelta_eff).over(w)).withColumn(
        "seg_lcum",
        F.coalesce(
            F.last(F.when(is_swap, F.col("lcum")), ignorenulls=True).over(w),
            F.lit(0).cast(RAW),
        ),
    )

    state = (
        ev.withColumn(
            "liquidity_post",
            (F.col("base_liq") + F.col("lcum") - F.col("seg_lcum")).cast(RAW),
        )
        .withColumn("r0_post", (F.col("init_r0") + F.sum("d0").over(w)).cast(RAW))
        .withColumn("r1_post", (F.col("init_r1") + F.sum("d1").over(w)).cast(RAW))
    )
    pre = lambda c, init_c: F.coalesce(  # noqa: E731
        F.lag(F.col(c)).over(w_lag), F.col(init_c)
    )
    return state.select(
        "pool", "block_number", "tx_index", "trace_idx", "kind",
        pre("r0_post", "init_r0").cast(RAW).alias("r0_pre"),
        pre("r1_post", "init_r1").cast(RAW).alias("r1_pre"),
        "r0_post", "r1_post",
        pre("liquidity_post", "init_liq").cast(RAW).alias("liquidity_pre"),
        "liquidity_post",
        pre("tick_post", "init_tick").alias("tick_pre"),
        "tick_post",
        pre("sqrt_price_post", "init_sqrt").cast(RAW).alias("sqrt_price_pre"),
        "sqrt_price_post",
    )


def univ3_tick_liquidity(events: DataFrame) -> DataFrame:
    """Per (pool, tick): net liquidity referenced across still-open
    positions — the batch analog of the reference's tick table maintenance
    (`update_position`/`update_tick`, mod.rs:387-461): each mint adds
    +amount at tick_lower and −amount at tick_upper (liquidityNet), burns
    the reverse; fully-cancelled ticks drop out (the reference's
    `flipped → ticks.remove`)."""
    mb = events.filter(F.col("kind").isin("mint", "burn"))
    signed = F.when(F.col("kind") == "mint", F.col("amount")).otherwise(
        -F.col("amount")
    )
    per_bound = mb.select(
        "pool",
        F.explode(
            F.array(
                F.struct(F.col("tick_lower").alias("tick"), signed.cast(RAW).alias("net")),
                F.struct(F.col("tick_upper").alias("tick"), (-signed).cast(RAW).alias("net")),
            )
        ).alias("b"),
    ).select("pool", "b.tick", "b.net")
    return (
        per_bound.groupBy("pool", "tick")
        .agg(F.sum("net").cast(RAW).alias("liquidity_net"))
        .filter(F.col("liquidity_net") != 0)
    )


def univ3_price(state: DataFrame, pools: DataFrame) -> DataFrame:
    """token0 price in token1 (decimal-adjusted) from the post-event tick —
    the reference's `calculate_price` (mod.rs:189-211): 1.0001^tick shifted
    by 10^(dec0−dec1), with the liquidity ≤ 10_000 rows priced null (the
    reference errors with LiquidityTooLow). The reference recomputes the
    tick from sqrt_price via get_tick_at_sqrt_ratio; for swap events both
    agree (the event tick satisfies the same floor invariant), so we use
    the replayed tick column and stay JVM-side."""
    dim = F.broadcast(pools.select("pool", "token0_decimals", "token1_decimals"))
    shift = (F.col("token0_decimals") - F.col("token1_decimals")).cast("int")
    return state.join(dim, "pool").withColumn(
        "price0_in_1",
        F.when(
            F.col("liquidity_post") > 10_000,
            F.pow(F.lit(1.0001), F.col("tick_post")) * F.pow(F.lit(10.0), shift),
        ),
    )
