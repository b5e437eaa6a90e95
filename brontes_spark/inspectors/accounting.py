"""Shared inspector accounting — the A-operators of SURVEY.md §2.4:

  A1/A2  action → ±(address, token, amount) deltas with coverage dedup
         (normalized_actions/accounting.rs:19-57; swap deltas
         swaps.rs:106-117; transfer deltas transfer.rs:31-40)
  A3     USD valuation via per-tx-index DEX price join
         (mev_inspectors/shared_utils.rs:59-119 usd_delta_by_address)
  A6     gas accounting (tree/root.rs:362-380 gas_paid + coinbase)

Spark shape: each variant contributes a filtered projection exploded to
delta rows; coverage dedup is an anti-join (T6); valuation is an equi-join
against `dex_prices` (every tx index is priced in our model, so no as-of
needed — operators/asof.py provides it where price grids are sparse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEI = 10**18


def _covered_transfers(actions: DataFrame) -> DataFrame:
    """Transfers whose value a swap in the same tx already accounts for
    (ActionCmp::is_same_coverage, normalized_actions/comparison.rs:312+):
    the in-leg (from→pool of token_in/amount_in) and the out-leg
    (pool→recipient of token_out/amount_out)."""
    t = actions.filter(F.col("action_type") == "transfer").select(
        "block_number", "tx_hash", "trace_idx", F.col("transfer.*")
    )
    s = actions.filter(F.col("action_type").isin("swap", "swap_with_fee")).select(
        "block_number", "tx_hash", F.col("swap.*")
    )
    in_leg = t.join(
        s,
        (t["tx_hash"] == s["tx_hash"])
        & (t["from"] == s["from"])
        & (t["to"] == s["pool"])
        & (t["token"] == s["token_in"])
        & (t["amount"] == s["amount_in"]),
        "left_semi",
    )
    out_leg = t.join(
        s,
        (t["tx_hash"] == s["tx_hash"])
        & (t["from"] == s["pool"])
        & (t["to"] == s["recipient"])
        & (t["token"] == s["token_out"])
        & (t["amount"] == s["amount_out"]),
        "left_semi",
    )
    return in_leg.unionByName(out_leg).select("tx_hash", "trace_idx").distinct()


def action_deltas(actions: DataFrame) -> DataFrame:
    """(block_number, tx_hash, tx_index, address, token, amount) signed rows."""
    covered = _covered_transfers(actions)
    acts = actions.join(covered, ["tx_hash", "trace_idx"], "left_anti")

    def explode_deltas(df: DataFrame, entries) -> DataFrame:
        return df.select(
            "block_number",
            "tx_hash",
            "tx_index",
            F.explode(F.array(*[
                F.struct(a.alias("address"), t.alias("token"), amt.alias("amount"))
                for (a, t, amt) in entries
            ])).alias("d"),
        ).select(
            "block_number", "tx_hash", "tx_index",
            "d.address", "d.token", "d.amount",
        )

    sw = explode_deltas(
        # swap_with_fee keeps the (fee-adjusted) swap struct — same deltas
        acts.filter(F.col("action_type").isin("swap", "swap_with_fee")),
        [
            (F.col("swap.from"), F.col("swap.token_in"), -F.col("swap.amount_in")),
            (F.col("swap.recipient"), F.col("swap.token_out"), F.col("swap.amount_out")),
        ],
    )
    tr = explode_deltas(
        acts.filter(F.col("action_type") == "transfer"),
        [
            (
                F.col("transfer.from"),
                F.col("transfer.token"),
                -(F.col("transfer.amount") + F.col("transfer.fee")),
            ),
            (F.col("transfer.to"), F.col("transfer.token"), F.col("transfer.amount")),
        ],
    )
    # mint: `from` pays tokens in, the POOL receives them; burn/collect: the
    # POOL pays out, `recipient` receives (falling back to `from` when the
    # decoder saw no distinct recipient) — both sides booked, exactly the
    # reference's per-variant impls (liquidity.rs:34-88 apply_delta pairs)
    holder = F.when(
        F.col("action_type") == "mint", F.col("mint_burn_collect.from")
    ).otherwise(
        F.coalesce(F.col("mint_burn_collect.recipient"), F.col("mint_burn_collect.from"))
    )
    sign = F.when(F.col("action_type") == "mint", F.lit(-1)).otherwise(F.lit(1))
    mbc = (
        acts.filter(F.col("action_type").isin("mint", "burn", "collect"))
        .select(
            "block_number",
            "tx_hash",
            "tx_index",
            holder.alias("holder"),
            F.col("mint_burn_collect.pool").alias("pool"),
            sign.alias("sign"),
            F.explode(
                F.arrays_zip(
                    F.col("mint_burn_collect.tokens").alias("token"),
                    F.col("mint_burn_collect.amounts").alias("amt"),
                )
            ).alias("z"),
        )
        .select(
            "block_number",
            "tx_hash",
            "tx_index",
            F.explode(
                F.array(
                    F.struct(
                        F.col("holder").alias("address"),
                        F.col("z.token").alias("token"),
                        (F.col("sign") * F.col("z.amt")).alias("amount"),
                    ),
                    F.struct(
                        F.col("pool").alias("address"),
                        F.col("z.token").alias("token"),
                        (-F.col("sign") * F.col("z.amt")).alias("amount"),
                    ),
                )
            ).alias("d"),
        )
        .select(
            "block_number", "tx_hash", "tx_index",
            "d.address", "d.token", "d.amount",
        )
        .filter(F.col("address").isNotNull())
    )
    lq = explode_deltas(
        acts.filter(F.col("action_type") == "liquidation"),
        [
            (
                F.col("liquidation.liquidator"),
                F.col("liquidation.collateral_asset"),
                F.col("liquidation.liquidated_collateral"),
            ),
            (
                F.col("liquidation.liquidator"),
                F.col("liquidation.debt_asset"),
                -F.col("liquidation.covered_debt"),
            ),
        ],
    )
    return sw.unionByName(tr).unionByName(mbc).unionByName(lq)


def usd_deltas(deltas: DataFrame, dex_prices: DataFrame) -> DataFrame:
    """A3: value deltas at the planted per-tx-index price."""
    return (
        deltas.join(
            dex_prices.select(
                "block_number", F.col("tx_idx").alias("tx_index"), "token", "price_usd"
            ),
            ["block_number", "tx_index", "token"],
        )
        .withColumn("usd", (F.col("amount") * F.col("price_usd")).cast("decimal(38,18)"))
    )


def gas_usd(tx_info: DataFrame, block_info: DataFrame) -> DataFrame:
    """A6: per-tx gas cost in USD (gas_paid = used*price + coinbase bribe)."""
    eth_paid = (
        (F.col("gas_used") * F.col("effective_gas_price")).cast("decimal(38,0)")
        / F.lit(WEI).cast("decimal(19,0)")
    ).cast("decimal(38,18)") + F.coalesce(
        F.col("coinbase_transfer"), F.lit(0).cast("decimal(38,18)")
    )
    return tx_info.join(
        F.broadcast(block_info.select("block_number", "eth_price")), "block_number"
    ).select(
        "block_number",
        "tx_hash",
        "tx_index",
        "eoa",
        "mev_contract",
        (eth_paid * F.col("eth_price")).cast("decimal(38,18)").alias("gas_usd"),
        "priority_fee",
        "is_private",
    )


def searcher_addresses(tx_info: DataFrame) -> DataFrame:
    """Address set attributable to each tx's searcher: eoa + mev contract
    (+ sibling searchers via the searcher dim, tree/tx_info.rs:84-105)."""
    return tx_info.select(
        "tx_hash",
        F.array_compact(F.array("eoa", "mev_contract")).alias("addresses"),
    )
