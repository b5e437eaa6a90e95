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
* Tick math is the BIT-EXACT TickMath ladder (the published Q128 magic
  constants + the Solidity round-up conversion to Q64.96), matching the
  reference's tick_math.rs and on-chain behavior exactly — pinned by
  Uniswap's published boundary vectors in tests/test_univ3.py
  (MIN_SQRT_RATIO 4295128739 etc.), which are goldens INDEPENDENT of this
  implementation.
"""

from __future__ import annotations

from decimal import ROUND_FLOOR, Decimal, localcontext

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

RAW = "decimal(38,0)"

Q96 = 1 << 96
MIN_TICK, MAX_TICK = -887272, 887272

_PREC = 90

#: the published TickMath.sol Q128 ladder: constant for bit b is
#: ~2^128·1.0001^(−b/2), each the truncated product of the previous
#: doubling — reproducing them exactly is what makes the result bit-equal
#: to on-chain values (and to the reference's tick_math.rs port).
_TICK_MAGIC: tuple[tuple[int, int], ...] = (
    (0x2, 0xFFF97272373D413259A46990580E213A),
    (0x4, 0xFFF2E50F5F656932EF12357CF3C7FDCC),
    (0x8, 0xFFE5CACA7E10E4E61C3624EAA0941CD0),
    (0x10, 0xFFCB9843D60F6159C9DB58835C926644),
    (0x20, 0xFF973B41FA98C081472E6896DFB254C0),
    (0x40, 0xFF2EA16466C96A3843EC78B326B52861),
    (0x80, 0xFE5DEE046A99A2A811C461F1969C3053),
    (0x100, 0xFCBE86C7900A88AEDCFFC83B479AA3A4),
    (0x200, 0xF987A7253AC413176F2B074CF7815E54),
    (0x400, 0xF3392B0822B70005940C7A398E4B70F3),
    (0x800, 0xE7159475A2C29B7443B29C7FA6E889D9),
    (0x1000, 0xD097F3BDFD2022B8845AD8F792AA5825),
    (0x2000, 0xA9F746462D870FDF8A65DC1F90E061E5),
    (0x4000, 0x70D869A156D2A1B890BB3DF62BAF32F7),
    (0x8000, 0x31BE135F97D08FD981231505542FCFA6),
    (0x10000, 0x9AA508B5B7A84E1C677DE54F3E99BC9),
    (0x20000, 0x5D6AF8DEDB81196699C329225EE604),
    (0x40000, 0x2216E584F5FA1EA926041BEDFE98),
    (0x80000, 0x48A170391F7DC42444E8FA2),
)
_MAGIC_ODD = 0xFFFCB933BD6FAD37AA2D162D1A594001
_U256_MAX = (1 << 256) - 1


def get_sqrt_ratio_at_tick(tick: int) -> int:
    """sqrt(1.0001^tick)·2^96 as the BIT-EXACT TickMath.getSqrtRatioAtTick
    (reference tick_math.rs:21-107, itself the Solidity port): Q128 magic-
    constant ladder over the bits of |tick|, reciprocal for positive ticks,
    then the round-UP >>32 conversion to Q64.96. Matches the published
    boundary vectors (4295128739 at MIN_TICK, ...970342 at MAX_TICK)."""
    if not MIN_TICK <= tick <= MAX_TICK:
        raise ValueError(f"tick {tick} out of [{MIN_TICK}, {MAX_TICK}]")
    abs_tick = abs(tick)
    ratio = _MAGIC_ODD if abs_tick & 1 else 1 << 128
    for bit, magic in _TICK_MAGIC:
        if abs_tick & bit:
            ratio = (ratio * magic) >> 128
    if tick > 0:
        ratio = _U256_MAX // ratio
    # Solidity: (ratio >> 32) rounded UP, so getTickAtSqrtRatio(result)
    # of the price-increase direction stays consistent
    return (ratio >> 32) + (1 if ratio & 0xFFFFFFFF else 0)


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
