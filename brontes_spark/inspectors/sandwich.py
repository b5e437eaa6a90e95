"""Sandwich inspector — reference I1/I3/I5 (SURVEY.md §2.7):
`mev_inspectors/sandwich/mod.rs`.

Candidate generation (I1, mod.rs:1014-1135): within a block, consecutive txs
by the same actor (eoa, and separately mev_contract) ordered by tx_index form
(frontrun, backrun) pairs; txs strictly between are the victim set.

Pool-overlap check (I3, mod.rs:556-740): the backrun must swap a pool the
frontrun swapped in the opposite direction, and ≥50% of victim txs must swap
that pool in the frontrun's direction.

PnL (I5, mod.rs:168-446): searcher address-set USD deltas over front+back
minus both txs' gas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .accounting import action_deltas, gas_usd, usd_deltas


def sandwich_bundles(
    actions: DataFrame,
    tx_info: DataFrame,
    dex_prices: DataFrame,
    block_info: DataFrame,
    deltas: DataFrame | None = None,
    gas: DataFrame | None = None,
) -> DataFrame:
    swaps = actions.filter(F.col("action_type") == "swap").select(
        "block_number", "tx_hash", "tx_index", F.col("swap.*")
    )
    swap_txs = swaps.select("block_number", "tx_hash", "tx_index").distinct()
    actors = tx_info.withColumn(
        "actor", F.coalesce("mev_contract", "eoa")
    ).join(swap_txs.select("tx_hash"), "tx_hash", "left_semi")

    w = W.partitionBy("block_number", "actor").orderBy("tx_index")
    cand = (
        actors.select("block_number", "actor", "tx_hash", "tx_index", "eoa", "mev_contract")
        .withColumn("back_hash", F.lead("tx_hash").over(w))
        .withColumn("back_index", F.lead("tx_index").over(w))
        .filter(F.col("back_hash").isNotNull() & (F.col("back_index") > F.col("tx_index") + 1))
        .select(
            "block_number",
            "actor",
            "eoa",
            "mev_contract",
            F.col("tx_hash").alias("front_hash"),
            F.col("tx_index").alias("front_index"),
            "back_hash",
            "back_index",
        )
    )

    front = swaps.select(
        F.col("tx_hash").alias("front_hash"),
        F.col("pool").alias("f_pool"),
        F.col("token_in").alias("f_in"),
        F.col("token_out").alias("f_out"),
    ).distinct()
    back = swaps.select(
        F.col("tx_hash").alias("b_hash"),
        F.col("pool").alias("b_pool"),
        F.col("token_in").alias("b_in"),
        F.col("token_out").alias("b_out"),
    ).distinct()
    overlap = (
        cand.join(front, "front_hash")
        .join(
            back,
            (F.col("back_hash") == F.col("b_hash"))
            & (F.col("f_pool") == F.col("b_pool"))
            & (F.col("f_in") == F.col("b_out"))
            & (F.col("f_out") == F.col("b_in")),
        )
        .select(
            "block_number", "actor", "eoa", "mev_contract",
            "front_hash", "front_index", "back_hash", "back_index",
            "f_pool", "f_in",
        )
        .distinct()
    )

    victims = swaps.select(
        F.col("block_number").alias("v_block"),
        F.col("tx_hash").alias("v_hash"),
        F.col("tx_index").alias("v_index"),
        F.col("pool").alias("v_pool"),
        F.col("token_in").alias("v_in"),
    )
    vstats = (
        overlap.join(
            victims,
            (F.col("v_block") == F.col("block_number"))
            & (F.col("v_index") > F.col("front_index"))
            & (F.col("v_index") < F.col("back_index")),
        )
        .groupBy("block_number", "actor", "front_hash", "back_hash")
        .agg(
            F.countDistinct("v_hash").alias("n_victims"),
            F.countDistinct(
                F.when(
                    (F.col("v_pool") == F.col("f_pool")) & (F.col("v_in") == F.col("f_in")),
                    F.col("v_hash"),
                )
            ).alias("n_overlap_victims"),
            F.sort_array(F.collect_set("v_hash")).alias("victim_hashes"),
        )
        .filter(
            (F.col("n_victims") > 0)
            & (F.col("n_overlap_victims") * 2 >= F.col("n_victims"))
        )
    )
    verified = overlap.join(
        vstats, ["block_number", "actor", "front_hash", "back_hash"]
    )

    # PnL over the searcher address set across front+back
    if deltas is None:
        deltas = usd_deltas(action_deltas(actions), dex_prices)
    if gas is None:
        gas = gas_usd(tx_info, block_info)
    pair_txs = verified.select(
        "block_number", "actor", "eoa", "mev_contract",
        "front_hash", "back_hash", "victim_hashes",
        F.explode(F.array("front_hash", "back_hash")).alias("tx_hash"),
    )
    searcher_set = F.array_compact(F.array("eoa", "mev_contract", F.col("actor")))
    rev = (
        pair_txs.join(deltas.select("tx_hash", "address", "usd"), "tx_hash")
        .filter(F.array_contains(searcher_set, F.col("address")))
        .groupBy("block_number", "actor", "front_hash", "back_hash")
        .agg(F.sum("usd").alias("revenue_usd"))
    )
    gcost = (
        pair_txs.join(gas.select("tx_hash", "gas_usd"), "tx_hash")
        .groupBy("block_number", "actor", "front_hash", "back_hash")
        .agg(F.sum("gas_usd").alias("gas_usd"))
    )
    return (
        verified.join(rev, ["block_number", "actor", "front_hash", "back_hash"])
        .join(gcost, ["block_number", "actor", "front_hash", "back_hash"])
        .withColumn("profit_usd", (F.col("revenue_usd") - F.col("gas_usd")).cast("decimal(38,18)"))
        .filter(F.col("profit_usd") > 0)
        .select(
            "block_number",
            F.concat(
                F.array("front_hash"), F.col("victim_hashes"), F.array("back_hash")
            ).alias("tx_hashes"),
            "eoa",
            "mev_contract",
            F.lit("sandwich").alias("mev_type"),
            "profit_usd",
            F.col("revenue_usd").cast("decimal(38,18)").alias("revenue_usd"),
            F.col("gas_usd").cast("decimal(38,18)").alias("gas_usd"),
        )
    )
