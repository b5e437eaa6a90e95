"""Composer — reference O1-O4 + I11/I13 (SURVEY.md §2.7/§2.8):
`brontes-inspect/src/composer/mod.rs:71-343`, `composer/utils.rs:15-242`.

  O1  run every inspector, union bundles (independent DAG branches — Spark
      schedules them; the shared `actions` input is cached by the caller)
  O2  compose: sandwich + JIT bundles sharing txs by the same searcher merge
      into jit_sandwich (composer/composer_filters.rs:21-49,
      mev/jit_sandwich.rs compose_sandwich_jit). Our delta accounting
      already sums ALL searcher deltas per tx set, so the sandwich bundle's
      numbers are the complete merged PnL — the merge takes them verbatim.
  I11 jit_cex_dex: JIT bundles whose searcher is labeled cex-dex
      (jit/jit_cex_dex.rs) re-tag
  O3  precedence dedup (composer/mev_filters.rs:32-110): bundles of a
      subordinate MEV type sharing any tx with a dominant bundle are dropped
  I13 searcher activity (mev_inspectors/searcher_activity.rs:40-200):
      known-searcher txs no bundle claims get profit-attributed bundles
  O4  per-block MevBlock header rollup (bundle counts/profits by type +
      builder gas take)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .accounting import action_deltas, gas_usd, usd_deltas
from .atomic_arb import atomic_arb_bundles
from .cex_dex import cex_dex_bundles, cex_dex_quotes_bundles
from .jit import jit_bundles
from .liquidations import liquidation_bundles
from .sandwich import sandwich_bundles

#: precedence: lower = dominant (mev_filters.rs MevType ordering, simplified)
PRIORITY = {
    "jit_sandwich": 0,
    "sandwich": 10,
    "sandwich:big_mac": 10,
    "jit_cex_dex": 20,
    "jit": 30,
    "cex_dex": 40,
    "cex_dex_quotes": 45,  # markout variant dominates (reference preference)
    "liquidation": 50,
    "atomic_arb:triangle": 60,
    "atomic_arb:cross_pair": 70,
    "atomic_arb:long_tail": 80,
    "searcher_tx": 90,
}

_BCOLS = [
    "block_number", "tx_hashes", "eoa", "mev_contract", "mev_type",
    "profit_usd", "revenue_usd", "gas_usd",
]


def compose_sandwich_jit(bundles: DataFrame) -> DataFrame:
    """O2: merge sandwich×jit pairs (same block + eoa, intersecting txs)
    into jit_sandwich; drop the children."""
    s = bundles.filter(F.col("mev_type").startswith("sandwich")).select(
        *[F.col(c).alias(f"s_{c}") for c in _BCOLS]
    )
    j = bundles.filter(F.col("mev_type").isin("jit", "jit_cex_dex")).select(
        *[F.col(c).alias(f"j_{c}") for c in _BCOLS]
    )
    pairs = s.join(
        j,
        (F.col("s_block_number") == F.col("j_block_number"))
        & (F.col("s_eoa") == F.col("j_eoa"))
        & (F.size(F.array_intersect("s_tx_hashes", "j_tx_hashes")) > 0),
    )
    merged = pairs.select(
        F.col("s_block_number").alias("block_number"),
        F.sort_array(F.array_distinct(F.concat("s_tx_hashes", "j_tx_hashes"))).alias(
            "tx_hashes"
        ),
        F.col("s_eoa").alias("eoa"),
        F.col("s_mev_contract").alias("mev_contract"),
        F.lit("jit_sandwich").alias("mev_type"),
        # sandwich PnL already spans the full searcher delta set (see module
        # docstring) — take it as the merged bundle's accounting
        F.col("s_profit_usd").alias("profit_usd"),
        F.col("s_revenue_usd").alias("revenue_usd"),
        F.col("s_gas_usd").alias("gas_usd"),
    )
    consumed = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("s_block_number").alias("bn"), F.col("s_tx_hashes").alias("txs")),
                F.struct(F.col("j_block_number").alias("bn"), F.col("j_tx_hashes").alias("txs")),
            )
        ).alias("c")
    ).select(F.col("c.bn").alias("block_number"), F.col("c.txs").alias("tx_hashes")).distinct()
    survivors = bundles.join(consumed, ["block_number", "tx_hashes"], "left_anti")
    return survivors.unionByName(merged)


def retag_jit_cex_dex(bundles: DataFrame, searcher_info: DataFrame) -> DataFrame:
    """I11: jit bundles by searchers labeled cex-dex become jit_cex_dex."""
    labeled = searcher_info.filter(
        F.array_contains(F.col("mev_types"), "cex_dex")
    ).select(F.col("address").alias("eoa"), F.lit(True).alias("__cd"))
    out = bundles.join(F.broadcast(labeled), "eoa", "left")
    return out.withColumn(
        "mev_type",
        F.when((F.col("mev_type") == "jit") & F.col("__cd"), "jit_cex_dex").otherwise(
            F.col("mev_type")
        ),
    ).drop("__cd")


def searcher_activity_bundles(
    claimed: DataFrame,
    tx_info: DataFrame,
    searcher_info: DataFrame,
    deltas: DataFrame,
    gas: DataFrame,
) -> DataFrame:
    """I13: profitable known-searcher txs not claimed by any bundle."""
    known = searcher_info.select(F.col("address").alias("eoa")).distinct()
    claimed_txs = claimed.select(F.explode("tx_hashes").alias("tx_hash")).distinct()
    candidates = (
        tx_info.join(F.broadcast(known), "eoa", "left_semi")
        .join(claimed_txs, "tx_hash", "left_anti")
        .select("block_number", "tx_hash", "eoa", "mev_contract")
    )
    searcher_set = F.array_compact(F.array("eoa", "mev_contract"))
    rev = (
        candidates.join(deltas.select("tx_hash", "address", "usd"), "tx_hash")
        .filter(F.array_contains(searcher_set, F.col("address")))
        .groupBy("block_number", "tx_hash", "eoa", "mev_contract")
        .agg(F.sum("usd").alias("revenue_usd"))
        .filter(F.col("revenue_usd") > 0)
    )
    return (
        rev.join(gas.select("tx_hash", "gas_usd"), "tx_hash")
        .withColumn(
            "profit_usd", (F.col("revenue_usd") - F.col("gas_usd")).cast("decimal(38,18)")
        )
        .filter(F.col("profit_usd") > 0)
        .select(
            "block_number",
            F.array("tx_hash").alias("tx_hashes"),
            "eoa",
            "mev_contract",
            F.lit("searcher_tx").alias("mev_type"),
            "profit_usd",
            F.col("revenue_usd").cast("decimal(38,18)").alias("revenue_usd"),
            F.col("gas_usd").cast("decimal(38,18)").alias("gas_usd"),
        )
    )


def dedup_by_precedence(bundles: DataFrame) -> DataFrame:
    """O3: drop subordinate bundles sharing a tx with a dominant bundle."""
    prio = F.create_map(*[F.lit(x) for kv in PRIORITY.items() for x in kv])
    b = bundles.withColumn("priority", prio[F.col("mev_type")]).withColumn(
        "bundle_id", F.monotonically_increasing_id()
    )
    exploded = b.select("bundle_id", "priority", F.explode("tx_hashes").alias("tx_hash"))
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
    """O1 → I11 → O2 → O3 → I13 → O4 over the fixture-shaped tables."""
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
        cex_dex_quotes_bundles(*args, cex_quotes=tables["cex_quotes"], gas=gas),
        atomic_arb_bundles(*args, searcher_info=tables["searcher_info"], deltas=deltas, gas=gas),
    ]
    # localCheckpoint (eager) at each composer stage boundary: the compose /
    # dedup self-joins replicate the whole 5-inspector DAG several times, and
    # the resulting analyzed-plan tree grows combinatorially — with a default
    # 1g driver heap that OOMs at ANALYSIS time. Checkpointing truncates
    # lineage to the (KB-sized) materialized bundles.
    unioned = reduce(lambda a, b: a.unionByName(b), all_bundles).localCheckpoint()
    composed = compose_sandwich_jit(
        retag_jit_cex_dex(unioned, tables["searcher_info"])
    ).localCheckpoint()
    deduped = dedup_by_precedence(composed).localCheckpoint()
    activity = searcher_activity_bundles(
        deduped, tables["tx_info"], tables["searcher_info"], deltas, gas
    )
    final = deduped.unionByName(activity).orderBy("block_number", "mev_type")
    header = mev_block_header(final, tables["tx_info"], tables["block_info"])
    return {"bundles": final, "mev_blocks": header}
