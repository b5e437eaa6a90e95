"""Composer — reference O1-O4 (SURVEY.md §2.8):
`brontes-inspect/src/composer/mod.rs:71-343`, `composer/utils.rs:15-242`.

  O1  run every inspector, union bundles (independent DAG branches — Spark
      schedules them; the shared `actions` input is cached by the caller)
  O3  precedence dedup (composer/mev_filters.rs:32-110): bundles of a
      subordinate MEV type sharing any tx with a dominant bundle are dropped
  O4  per-block MevBlock header rollup (bundle counts/profits by type +
      builder gas take)

O2 (sandwich+jit → jit_sandwich merge) follows the same explode/self-join
shape as O3 and lands with the multi-pattern fixtures in a later round.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .accounting import action_deltas, gas_usd, usd_deltas
from .atomic_arb import atomic_arb_bundles
from .cex_dex import cex_dex_bundles
from .jit import jit_bundles
from .liquidations import liquidation_bundles
from .sandwich import sandwich_bundles

#: precedence: lower = dominant (mev_filters.rs MevType ordering, simplified)
PRIORITY = {
    "sandwich": 0,
    "jit_sandwich": 1,
    "jit": 2,
    "cex_dex": 3,
    "liquidation": 4,
    "atomic_arb:triangle": 5,
    "atomic_arb:cross_pair": 6,
    "atomic_arb:long_tail": 7,
}


def dedup_by_precedence(bundles: DataFrame) -> DataFrame:
    """O3: drop subordinate bundles sharing a tx with a dominant bundle."""
    prio = F.create_map(
        *[F.lit(x) for kv in PRIORITY.items() for x in kv]
    )
    b = bundles.withColumn("priority", prio[F.col("mev_type")]).withColumn(
        "bundle_id", F.monotonically_increasing_id()
    )
    exploded = b.select(
        "bundle_id", "priority", F.explode("tx_hashes").alias("tx_hash")
    )
    w = W.partitionBy("tx_hash").orderBy(F.col("priority").asc(), F.col("bundle_id").asc())
    dominated = (
        exploded.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") > 1)
        .select("bundle_id")
        .distinct()
    )
    return b.join(dominated, "bundle_id", "left_anti").drop("bundle_id", "priority")


def mev_block_header(bundles: DataFrame, tx_info: DataFrame, block_info: DataFrame) -> DataFrame:
    """O4: per-block rollup (composer/utils.rs build_mev_header)."""
    per_block = bundles.groupBy("block_number").agg(
        F.count(F.lit(1)).alias("n_bundles"),
        F.sum("profit_usd").cast("decimal(38,18)").alias("total_profit_usd"),
        F.sum("revenue_usd").cast("decimal(38,18)").alias("total_revenue_usd"),
        F.sum("gas_usd").cast("decimal(38,18)").alias("total_bribe_usd"),
        F.sort_array(F.collect_list("mev_type")).alias("mev_types"),
    )
    gas = gas_usd(tx_info, block_info)
    builder_take = gas.groupBy("block_number").agg(
        F.sum("gas_usd").cast("decimal(38,18)").alias("builder_gas_usd"),
        F.count(F.lit(1)).alias("n_txs"),
    )
    return (
        block_info.select("block_number", "block_timestamp", "beneficiary")
        .join(builder_take, "block_number", "left")
        .join(per_block, "block_number", "left")
        .withColumn("n_bundles", F.coalesce("n_bundles", F.lit(0)))
    )


def run_composer(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """O1 + O3 + O4 over the fixture-shaped tables."""
    actions = tables["actions"].cache()
    args = (actions, tables["tx_info"], tables["dex_prices"], tables["block_info"])
    # shared accounting inputs computed once (the reference likewise shares
    # the classified tree + metadata across inspectors, composer/mod.rs:71-120)
    deltas = usd_deltas(action_deltas(actions), tables["dex_prices"]).cache()
    gas = gas_usd(tables["tx_info"], tables["block_info"]).cache()
    all_bundles = [
        sandwich_bundles(*args, deltas=deltas, gas=gas),
        jit_bundles(*args, deltas=deltas, gas=gas),
        liquidation_bundles(*args, deltas=deltas, gas=gas),
        cex_dex_bundles(*args, cex_trades=tables["cex_trades"], gas=gas),
        atomic_arb_bundles(*args, searcher_info=tables["searcher_info"], deltas=deltas, gas=gas),
    ]
    # cache the union: precedence dedup references it on both sides of an
    # anti-join, which would otherwise re-execute every inspector's DAG
    unioned = reduce(lambda a, b: a.unionByName(b), all_bundles).cache()
    deduped = dedup_by_precedence(unioned).orderBy("block_number", "mev_type")
    header = mev_block_header(deduped, tables["tx_info"], tables["block_info"])
    return {"bundles": deduped, "mev_blocks": header}
