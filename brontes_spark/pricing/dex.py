"""DEX price derivation + sanity filtering — SURVEY.md §2.6 G5 (v0) and
§2.4 A4.

G5 (v0 realized-rate pricing, SURVEY.md §7.2): the reference maintains a
stateful pool-math engine (UniV2/V3 tick math) to emit pre/post prices per
tx index (`brontes-pricing/src/lib.rs:297-358`). The v0 Spark derivation
prices each pool at its *realized* swap rate (amount_out/amount_in —
`normalized_actions/swaps.rs:70-76`) and exposes pre/post via lag windows
per pool ordered by tx index, with the reference's drastic-move guard.
Divergence from full pool-math is documented; the v1 path is per-pool
event-sourced state via applyInPandasWithState.

A4 (`mev_inspectors/shared_utils.rs:546-653` valid_pricing): reject prices
whose implied rate disagrees with the trusted price table by more than
`max_deviation` when the pool is thin or poorly connected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

MAX_BLOCK_MOVEMENT = 0.99999  # pricing/src/lib.rs:73 drastic-move cap
CONNECTION_TH = 2             # shared_utils.rs:34
LOW_LIQ_TH_USD = 50_000       # shared_utils.rs:35


def realized_pool_prices(actions: DataFrame) -> DataFrame:
    """G5-lite: per (block, pool, tx_idx): realized rate token_out/token_in
    with pre (lag) and post (current) state columns, plus the drastic-move
    guard flag."""
    swaps = actions.filter(F.col("action_type").isin("swap", "swap_with_fee")).select(
        "block_number",
        F.col("tx_index").alias("tx_idx"),
        F.col("swap.pool").alias("pool"),
        F.col("swap.token_in").alias("token_in"),
        F.col("swap.token_out").alias("token_out"),
        F.col("swap.amount_in").alias("amount_in"),
        F.col("swap.amount_out").alias("amount_out"),
    ).filter(F.col("amount_in") > 0)
    rate = (F.col("amount_out").cast("double") / F.col("amount_in").cast("double"))
    w = W.partitionBy("pool", "token_in", "token_out").orderBy("block_number", "tx_idx")
    out = (
        swaps.withColumn("post_state", rate)
        .withColumn("pre_state", F.lag("post_state").over(w))
        .withColumn(
            "rel_move",
            F.when(
                F.col("pre_state").isNotNull() & (F.col("pre_state") != 0),
                F.abs(F.col("post_state") - F.col("pre_state")) / F.col("pre_state"),
            ),
        )
        .withColumn(
            "drastic_move",
            F.coalesce(F.col("rel_move") > MAX_BLOCK_MOVEMENT, F.lit(False)),
        )
    )
    return out.select(
        "block_number", "tx_idx", "pool", "token_in", "token_out",
        "pre_state", "post_state", "drastic_move",
    )


def valid_pricing(
    priced: DataFrame,
    trusted: DataFrame,   # (token, trusted_price)
    price_col: str = "price_usd",
    max_deviation: float = 2.0,
) -> DataFrame:
    """A4: keep rows whose price is within `max_deviation`x of the trusted
    price, unless the pool is deep AND well-connected (deep liquid pools are
    trusted even when they disagree — the reference's asymmetric rule)."""
    j = priced.join(F.broadcast(trusted), "token", "left")
    ratio = F.col(price_col).cast("double") / F.col("trusted_price").cast("double")
    deviant = (ratio > max_deviation) | (ratio < 1.0 / max_deviation)
    thin = (F.col("pool_liquidity").cast("double") < LOW_LIQ_TH_USD) | (
        F.col("first_hop_connections") <= CONNECTION_TH
    )
    return j.filter(
        F.col("trusted_price").isNull() | ~(deviant & thin)
    ).drop("trusted_price")


def per_tx_path_ticks(
    state: DataFrame,   # (pool, block_number, tx_index, tick_post) — G4 output
    paths: DataFrame,   # (token, hop_idx, pool, sign) — driver-built dim
    grid: DataFrame,    # (block_number, tx_index) — tx universe to price at
) -> DataFrame:
    """G5 full per-tx price emission (lib.rs:297-358 DexQuotes), exact
    integer core: for every (token, block, tx) in the grid, the tick sum
    along the token's verified pricing path, with each hop's pool state
    forward-filled as-of that tx.

    price_in_quote = 1.0001^path_tick (composition of per-hop V3 prices
    1.0001^(sign·tick) — sign +1 when the hop runs token0→token1, −1
    inverted). Emitting the tick SUM keeps the column exact-integer; the
    caller exponentiates (per_tx_dex_quotes) where a double is wanted.

    Plan shape: probes = grid × path-pools (broadcast nested-loop on a
    bounded dim, no shuffle), unioned with the sparse state updates; ONE
    window per pool forward-fills last-known tick; a broadcast join attaches
    (token, sign) and one exact groupBy sums the path. At cluster scale the
    only shuffles are the per-pool window and the final (token, block, tx)
    aggregation."""
    pool_dim = paths.select("pool").distinct()
    probes = grid.join(F.broadcast(pool_dim)).select(
        "pool", "block_number", "tx_index",
        F.lit(None).cast("int").alias("tick_evt"), F.lit(1).alias("is_probe"),
    )
    updates = state.select(
        "pool", "block_number", "tx_index",
        F.col("tick_post").alias("tick_evt"), F.lit(0).alias("is_probe"),
    )
    # updates sort before probes at the same (block, tx): post-tx semantics
    w = (
        W.partitionBy("pool")
        .orderBy("block_number", "tx_index", "is_probe")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = (
        updates.unionByName(probes)
        .withColumn("tick", F.last("tick_evt", ignorenulls=True).over(w))
        .filter((F.col("is_probe") == 1) & F.col("tick").isNotNull())
        .select("pool", "block_number", "tx_index", "tick")
    )
    hops = filled.join(
        F.broadcast(paths.select("token", "hop_idx", "pool", "sign")), "pool"
    )
    n_hops = paths.groupBy("token").agg(F.countDistinct("hop_idx").alias("n_hops"))
    return (
        hops.groupBy("token", "block_number", "tx_index")
        .agg(
            F.sum(F.col("sign") * F.col("tick")).alias("path_tick"),
            F.countDistinct("hop_idx").alias("hops_priced"),
        )
        .join(F.broadcast(n_hops), "token")
        # a token is only priced once EVERY hop has seen state (the
        # reference's lazy-subgraph readiness)
        .filter(F.col("hops_priced") == F.col("n_hops"))
        .select("token", "block_number", "tx_index", "path_tick")
    )


def per_tx_dex_quotes(
    state: DataFrame, paths: DataFrame, grid: DataFrame
) -> DataFrame:
    """G5 DexQuotes: per (token, block, tx) price in the path's quote asset
    as a double — 1.0001^path_tick (the V3 calculate_price composition,
    uniswap_v3/mod.rs:189-211). Decimal shifts between hop tokens cancel
    telescopically except at the endpoints; apply any endpoint shift in the
    caller's valuation join."""
    return per_tx_path_ticks(state, paths, grid).withColumn(
        "price_in_quote", F.pow(F.lit(1.0001), F.col("path_tick"))
    )
