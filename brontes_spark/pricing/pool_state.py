"""Event-sourced UniV2-style pool state — the batch half of reference G4
(SURVEY.md §2.6, `brontes-pricing/src/protocols/uniswap_v2/mod.rs` +
`update_known_state` lib.rs:443-577).

Key insight that makes this a pure DataFrame plan: constant-product (x·y=k)
reserves evolve ADDITIVELY — each swap adds amount_in to one reserve and
removes amount_out from the other; mints add both; burns remove both. So
per-pool reserve state at any tx index is a cumulative window sum over the
pool's action deltas, and the spot price (reserve1/reserve0) falls out per
tx index — the reference's stateful pool engine becomes one shuffle on pool
+ one ordered window. (UniswapV3 tick-crossing math is NOT additive; that
variant needs the applyInPandasWithState path and stays deferred —
SURVEY.md §7.3 hard part 1.)

Determinism: reserves are exact decimal sums; spot prices divide exact
decimals into doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

AMOUNT = "decimal(38,18)"


def _signed_side_amount(side_col: str):
    """±amount of the pool's canonical `side_col` token in a mint/burn row.

    `array_position` returns 0 when the token is absent (single-sided
    mint/burn, or a token-address mismatch vs the pools dim), and Spark's
    `element_at(arr, 0)` RAISES — so the position is guarded and an absent
    side contributes a 0 delta instead of killing the stage.
    """
    pos = F.array_position(F.col("tokens"), F.col(side_col)).cast("int")
    amt = F.when(pos > 0, F.element_at(F.col("amounts"), pos)).otherwise(
        F.lit(0).cast(AMOUNT)
    )
    sign = F.when(F.col("kind") == "mint", F.lit(1)).otherwise(F.lit(-1))
    return (sign * amt).cast(AMOUNT)


def univ2_reserve_deltas(actions: DataFrame, pools: DataFrame) -> DataFrame:
    """Per (pool, block, tx_index, trace_idx): the (d0, d1) reserve deltas
    contributed by each swap/mint/burn action, oriented by the pool's
    canonical (token0, token1)."""
    dim = F.broadcast(pools.select("pool", "token0", "token1"))
    swaps = (
        actions.filter(F.col("action_type").isin("swap", "swap_with_fee"))
        .select(
            "block_number", "tx_index", "trace_idx",
            F.col("swap.pool").alias("pool"),
            F.col("swap.token_in").alias("token_in"),
            F.col("swap.amount_in").alias("amount_in"),
            F.col("swap.amount_out").alias("amount_out"),
        )
        .join(dim, "pool")
        .select(
            "pool", "block_number", "tx_index", "trace_idx",
            F.when(F.col("token_in") == F.col("token0"), F.col("amount_in"))
            .otherwise(-F.col("amount_out"))
            .cast(AMOUNT)
            .alias("d0"),
            F.when(F.col("token_in") == F.col("token0"), -F.col("amount_out"))
            .otherwise(F.col("amount_in"))
            .cast(AMOUNT)
            .alias("d1"),
        )
    )
    mbc = (
        actions.filter(F.col("action_type").isin("mint", "burn"))
        .select(
            "block_number", "tx_index", "trace_idx",
            F.col("action_type").alias("kind"),
            F.col("mint_burn_collect.pool").alias("pool"),
            F.col("mint_burn_collect.tokens").alias("tokens"),
            F.col("mint_burn_collect.amounts").alias("amounts"),
        )
        .join(dim, "pool")
        .select(
            "pool", "block_number", "tx_index", "trace_idx",
            _signed_side_amount("token0").alias("d0"),
            _signed_side_amount("token1").alias("d1"),
        )
    )
    return swaps.unionByName(mbc)


def univ2_pool_state(
    actions: DataFrame,
    pools: DataFrame,
    initial_reserves: DataFrame,  # (pool, r0, r1) at range start
) -> DataFrame:
    """Per pool action: reserves BEFORE (pre) and AFTER (post) the action,
    plus constant-product spot prices (token1 per token0). One shuffle on
    pool, one ordered cumulative window — G4 without a state machine."""
    deltas = univ2_reserve_deltas(actions, pools)
    w = (
        W.partitionBy("pool")
        .orderBy("block_number", "tx_index", "trace_idx")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    init = F.broadcast(initial_reserves.select("pool", "r0", "r1"))
    state = (
        deltas.join(init, "pool")
        .withColumn("r0_post", (F.col("r0") + F.sum("d0").over(w)).cast(AMOUNT))
        .withColumn("r1_post", (F.col("r1") + F.sum("d1").over(w)).cast(AMOUNT))
        .withColumn("r0_pre", (F.col("r0_post") - F.col("d0")).cast(AMOUNT))
        .withColumn("r1_pre", (F.col("r1_post") - F.col("d1")).cast(AMOUNT))
    )
    spot = lambda r1, r0: F.when(  # noqa: E731
        F.col(r0) != 0, F.col(r1).cast("double") / F.col(r0).cast("double")
    )
    return state.select(
        "pool", "block_number", "tx_index", "trace_idx",
        "r0_pre", "r1_pre", "r0_post", "r1_post",
        spot("r1_pre", "r0_pre").alias("spot_pre"),
        spot("r1_post", "r0_post").alias("spot_post"),
    )
