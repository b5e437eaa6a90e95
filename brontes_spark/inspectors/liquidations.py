"""Liquidation inspector — reference I12 (SURVEY.md §2.7):
`mev_inspectors/liquidations.rs:39-168`: txs containing liquidation actions;
revenue = USD(seized collateral) − USD(covered debt); profit = revenue − gas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .accounting import action_deltas, gas_usd, searcher_addresses, usd_deltas


def liquidation_bundles(
    actions: DataFrame,
    tx_info: DataFrame,
    dex_prices: DataFrame,
    block_info: DataFrame,
    deltas: DataFrame | None = None,
    gas: DataFrame | None = None,
) -> DataFrame:
    # ONE bundle per tx (the reference emits one per TxInfo,
    # liquidations.rs:56-76): a tx with liquidation actions by several
    # liquidator addresses must not fan out into per-liquidator bundles
    # each charged the tx's full gas. Revenue accrues to the tx's searcher
    # address set (eoa + mev_contract — collect_address_set_for_accounting).
    liq_txs = (
        actions.filter(F.col("action_type") == "liquidation")
        .select("block_number", "tx_hash")
        .distinct()
    )
    if deltas is None:
        deltas = usd_deltas(action_deltas(actions), dex_prices)
    searchers = searcher_addresses(tx_info).withColumnRenamed(
        "addresses", "searcher_set"
    )
    rev = (
        liq_txs.join(deltas, ["block_number", "tx_hash"])
        .join(searchers, "tx_hash")
        .filter(F.array_contains(F.col("searcher_set"), F.col("address")))
        .groupBy("block_number", "tx_hash")
        .agg(F.sum("usd").alias("revenue_usd"))
    )
    if gas is None:
        gas = gas_usd(tx_info, block_info)
    return (
        rev.join(gas.select("tx_hash", "eoa", "mev_contract", "gas_usd"), "tx_hash")
        .withColumn("profit_usd", (F.col("revenue_usd") - F.col("gas_usd")).cast("decimal(38,18)"))
        .select(
            "block_number",
            F.array("tx_hash").alias("tx_hashes"),
            "eoa",
            "mev_contract",
            F.lit("liquidation").alias("mev_type"),
            "profit_usd",
            F.col("revenue_usd").cast("decimal(38,18)").alias("revenue_usd"),
            F.col("gas_usd").cast("decimal(38,18)").alias("gas_usd"),
        )
    )
