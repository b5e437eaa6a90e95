"""Atomic-arbitrage inspector — reference I6/I7 (SURVEY.md §2.7):
`mev_inspectors/atomic_arb.rs:107-447`.

Per tx: order its swaps by trace_idx, classify the sequence by token
continuity (`identify_arb_sequence` atomic_arb.rs:398-424):

  * Triangle   — consecutive swaps chain token_out → token_in and the
    sequence returns to its starting token
  * CrossPair  — chain broken once but first/last tokens match
  * LongTail   — anything else

Validation (I7, atomic_arb.rs:239-397 simplified): keep bundles that are
profitable after gas, or whose eoa is a known searcher; cap absurd profits
(the reference's $50M false-positive guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .accounting import action_deltas, gas_usd, usd_deltas

MAX_PROFIT_USD = 50_000_000


def atomic_arb_bundles(
    actions: DataFrame,
    tx_info: DataFrame,
    dex_prices: DataFrame,
    block_info: DataFrame,
    searcher_info: DataFrame,
    deltas: DataFrame | None = None,
    gas: DataFrame | None = None,
) -> DataFrame:
    swaps = actions.filter(F.col("action_type") == "swap").select(
        "block_number", "tx_hash", "tx_index", "trace_idx", F.col("swap.*")
    )
    seqs = (
        swaps.groupBy("block_number", "tx_hash", "tx_index")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("trace_idx", "token_in", "token_out", "pool"))
            ).alias("seq")
        )
        .filter(F.size("seq") >= 2)
    )
    chained = F.forall(
        F.zip_with(
            F.slice("seq", 1, F.size("seq") - 1),
            F.slice("seq", 2, F.size("seq") - 1),
            lambda a, b: a["token_out"] == b["token_in"],
        ),
        lambda x: x,
    )
    closes = (
        F.element_at("seq", 1)["token_in"] == F.element_at("seq", -1)["token_out"]
    )
    classified = seqs.select(
        "block_number",
        "tx_hash",
        "tx_index",
        F.when(chained & closes, "triangle")
        .when(closes, "cross_pair")
        .otherwise("long_tail")
        .alias("arb_kind"),
        F.size("seq").alias("n_swaps"),
    )

    # searcher revenue = net USD delta of the tx's own eoa/contract addresses
    if deltas is None:
        deltas = usd_deltas(action_deltas(actions), dex_prices)
    if gas is None:
        gas = gas_usd(tx_info, block_info)
    addr_sets = tx_info.select(
        "tx_hash", F.array_compact(F.array("eoa", "mev_contract")).alias("searcher_set")
    )
    rev = (
        deltas.join(addr_sets, "tx_hash")
        .filter(F.array_contains(F.col("searcher_set"), F.col("address")))
        .groupBy("tx_hash")
        .agg(F.sum("usd").alias("revenue_usd"))
    )
    known = searcher_info.select(F.col("address").alias("eoa"), F.lit(True).alias("is_known"))
    out = (
        classified.join(rev, "tx_hash", "left")
        .join(gas.select("tx_hash", "eoa", "mev_contract", "gas_usd"), "tx_hash")
        .join(F.broadcast(known), "eoa", "left")
        .withColumn("revenue_usd", F.coalesce("revenue_usd", F.lit(0).cast("decimal(38,18)")))
        .withColumn("profit_usd", (F.col("revenue_usd") - F.col("gas_usd")).cast("decimal(38,18)"))
    )
    valid = out.filter(
        (F.col("profit_usd") > 0) | F.coalesce(F.col("is_known"), F.lit(False))
    ).filter(F.col("profit_usd") < MAX_PROFIT_USD)
    return valid.select(
        "block_number",
        F.array("tx_hash").alias("tx_hashes"),
        "eoa",
        "mev_contract",
        F.concat(F.lit("atomic_arb:"), F.col("arb_kind")).alias("mev_type"),
        "profit_usd",
        "revenue_usd",
        "gas_usd",
    )
