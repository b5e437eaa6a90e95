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

from ..functions.hashing import md5_long
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
    "atomic_arb:stablecoin": 75,  # weakest closed-arb signal (validation matrix)
    "atomic_arb:long_tail": 80,
    "searcher_tx": 90,
}

#: any mev_type not in PRIORITY must sort LAST, never first: a null priority
#: would win the nulls-first ascending rank and invert precedence
_PRIORITY_DEFAULT = 1000

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
    searcher_contracts: DataFrame | None = None,
) -> DataFrame:
    """I13: profitable known-searcher txs not claimed by any bundle.

    ``searcher_contracts`` (optional, `(address, ...)`) extends the known set
    with CONTRACT addresses — e.g. metadata-tagged solver protocols
    (classify.protocol_searcher_tags); those match on mev_contract, while
    searcher_info rows match on eoa (searcher_activity.rs checks both)."""
    known = searcher_info.select(F.col("address").alias("eoa")).distinct()
    claimed_txs = claimed.select(F.explode("tx_hashes").alias("tx_hash")).distinct()
    by_eoa = tx_info.join(F.broadcast(known), "eoa", "left_semi")
    if searcher_contracts is not None:
        kc = searcher_contracts.select(F.col("address").alias("mev_contract")).distinct()
        by_contract = tx_info.join(F.broadcast(kc), "mev_contract", "left_semi")
        matched = by_eoa.unionByName(by_contract).dropDuplicates(["tx_hash"])
    else:
        matched = by_eoa
    candidates = (
        matched
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
    """O3: drop subordinate bundles sharing a tx with a dominant bundle.

    The tie-break among equal-priority bundles sharing a tx is content-derived
    (mev_type, first tx hash, content hash) — never monotonically_increasing_id,
    which is partition-dependent and run-to-run nondeterministic (and unsafe as
    a self-join key because the plan is evaluated twice).
    """
    prio = F.create_map(*[F.lit(x) for kv in PRIORITY.items() for x in kv])
    # md5-derived id, per the repo-wide hash policy (functions/hashing.py):
    # this id is the final dedup tie-break, so an engine twin replaying the
    # same bundles must derive the identical id — xxhash64 would not.
    b = bundles.withColumn(
        "priority", F.coalesce(prio[F.col("mev_type")], F.lit(_PRIORITY_DEFAULT))
    ).withColumn(
        "bundle_id",
        md5_long(
            F.concat_ws(
                "|",
                "mev_type",
                F.concat_ws(",", "tx_hashes"),
                F.col("profit_usd").cast("string"),
                F.col("revenue_usd").cast("string"),
                "eoa",
            )
        ),
    )
    exploded = b.select(
        "bundle_id", "priority", "mev_type", "tx_hashes",
        F.explode("tx_hashes").alias("tx_hash"),
    )
    w = W.partitionBy("tx_hash").orderBy(
        F.col("priority").asc(),
        F.col("mev_type").asc(),
        F.array_min("tx_hashes").asc(),
        F.col("bundle_id").asc(),
    )
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


#: families of the wide BlockAnalysis blocks (db/block_analysis.rs:22-657):
#: "all" aggregates every family except searcher_tx (and excludes
#: liquidation from venue metrics), per ::new at 658-700
ANALYSIS_FAMILIES = [
    "all", "sandwich", "jit_sandwich", "jit", "atomic_arb", "cex_dex",
    "liquidation", "searcher_tx",
]


def block_analysis_wide(
    bundles: DataFrame, actions: DataFrame, searcher_info: DataFrame
) -> DataFrame:
    """O5 wide rollup — the Spark form of BlockAnalysis::new
    (db/block_analysis.rs:658-1680): per block, one column block per family
    with bundle counts, profit/revenue totals, average profit margin
    (block_analysis.rs:2024-2044: mean over bribe≠0 bundles of
    profit/|profit+bribe|), top searcher by profit and by revenue
    (single-bundle argmax, 1903-1950), unique eoa/contract/fund counts,
    top fund by summed profit AND by summed revenue, biggest bundle by
    profit AND by revenue, per-entity ranked vectors (searcher_eoa /
    mev_contract / fund ×{profit, revenue} lists with parallel amounts —
    the *_all_* families), and most-transacted pool/pair/dex by attributed
    profit AND by revenue (1976-2110) — the full metric surface of the
    reference's 369 literal columns, family-pivoted.

    Plan shape: bundles explode to (block, family) grain — each bundle
    feeds its own family plus `all` when eligible — every metric is computed
    at that grain with one groupBy or one keep_largest window, then a single
    pivot over the bounded family list assembles the wide row. All argmax
    picks tie-break lexicographically so the output is deterministic."""
    from ..functions.decimals import to_dbl
    from ..operators.windows import keep_largest

    DEC = "decimal(38,18)"
    b = (
        # family = mev_type sans subkind; the quotes variant counts under
        # cex_dex (the reference's cex_dex_* fields count MevType::CexDexQuotes,
        # block_analysis.rs:1521-1523). jit_cex_dex has NO per-family block in
        # the reference — those bundles feed only "all", matching here.
        bundles.withColumn(
            "family",
            F.when(
                F.col("mev_type") == "cex_dex_quotes", F.lit("cex_dex")
            ).otherwise(F.split("mev_type", ":")[0]),
        )
        .withColumn("head_tx", F.col("tx_hashes")[0])
        .join(
            F.broadcast(searcher_info.select(F.col("address").alias("eoa"), "fund")),
            "eoa",
            "left",
        )
    )
    # (block, fam) grain: own family + "all" (searcher_tx excluded from all)
    b2 = b.withColumn(
        "fam",
        F.explode(
            F.when(
                F.col("family") == "searcher_tx", F.array(F.col("family"))
            ).otherwise(F.array(F.col("family"), F.lit("all")))
        ),
    )

    margin = to_dbl("profit_usd") / F.abs(to_dbl("profit_usd") + to_dbl("gas_usd"))
    scal = b2.groupBy("block_number", "fam").agg(
        F.count(F.lit(1)).alias("bundle_count"),
        F.sum("profit_usd").cast(DEC).alias("total_profit"),
        F.sum("revenue_usd").cast(DEC).alias("total_revenue"),
        F.sum("gas_usd").cast(DEC).alias("total_bribe"),
        F.avg(F.when(F.col("gas_usd") != 0, margin)).alias("avg_profit_margin"),
        F.countDistinct("eoa").alias("searcher_count"),
        F.countDistinct("mev_contract").alias("mev_contract_count"),
        F.countDistinct("fund").alias("fund_count"),
    )

    top_prof = keep_largest(
        b2.select("block_number", "fam", "eoa", "profit_usd"),
        ["block_number", "fam"], F.col("profit_usd"), "eoa",
    ).select(
        "block_number", "fam",
        F.col("eoa").alias("top_searcher_profit"),
        F.col("profit_usd").alias("top_searcher_profit_amt"),
    )
    top_rev = keep_largest(
        b2.select("block_number", "fam", "eoa", "revenue_usd"),
        ["block_number", "fam"], F.col("revenue_usd"), "eoa",
    ).select(
        "block_number", "fam",
        F.col("eoa").alias("top_searcher_rev"),
        F.col("revenue_usd").alias("top_searcher_rev_amt"),
    )
    fund_sums = b2.filter(F.col("fund").isNotNull()).groupBy(
        "block_number", "fam", "fund"
    ).agg(
        F.sum("profit_usd").cast(DEC).alias("fund_profit"),
        F.sum("revenue_usd").cast(DEC).alias("fund_rev"),
    )
    top_fund = keep_largest(
        fund_sums, ["block_number", "fam"], F.col("fund_profit"), "fund"
    ).select(
        "block_number", "fam",
        F.col("fund").alias("top_fund_profit"),
        F.col("fund_profit").alias("top_fund_profit_amt"),
    )
    top_fund_rev = keep_largest(
        fund_sums, ["block_number", "fam"], F.col("fund_rev"), "fund"
    ).select(
        "block_number", "fam",
        F.col("fund").alias("top_fund_rev"),
        F.col("fund_rev").alias("top_fund_rev_amt"),
    )
    biggest = keep_largest(
        b2.select("block_number", "fam", "head_tx", "profit_usd"),
        ["block_number", "fam"], F.col("profit_usd"), "head_tx",
    ).select(
        "block_number", "fam",
        F.col("head_tx").alias("biggest_arb_tx"),
        F.col("profit_usd").alias("biggest_arb_profit"),
    )
    biggest_rev = keep_largest(
        b2.select("block_number", "fam", "head_tx", "revenue_usd"),
        ["block_number", "fam"], F.col("revenue_usd"), "head_tx",
    ).select(
        "block_number", "fam",
        F.col("head_tx").alias("biggest_arb_rev_tx"),
        F.col("revenue_usd").alias("biggest_arb_rev"),
    )

    # per-entity ranked vectors (block_analysis.rs: *_searcher_eoa_all_*,
    # *_mev_contract_all_*, *_fund_all_* — the full per-block ranking, not
    # just the argmax): entity lists sorted profit-desc (tie: entity asc)
    # with parallel amount arrays, one groupBy per entity kind.
    def entity_lists(entity: str, prefix: str) -> DataFrame:
        per = b2.filter(F.col(entity).isNotNull()).groupBy(
            "block_number", "fam", entity
        ).agg(
            F.sum("profit_usd").cast(DEC).alias("p"),
            F.sum("revenue_usd").cast(DEC).alias("r"),
        )

        def ranked(amt: str, out: str) -> list:
            sorted_structs = F.array_sort(
                F.collect_list(F.struct((-F.col(amt)).alias("neg"), F.col(entity).alias("e")))
            )
            return [
                F.transform(sorted_structs, lambda s: s["e"]).alias(f"{prefix}_{out}"),
                F.transform(sorted_structs, lambda s: -s["neg"]).alias(f"{prefix}_{out}_amt"),
            ]

        return per.groupBy("block_number", "fam").agg(
            *ranked("p", "all_profit"), *ranked("r", "all_rev")
        )

    # venue attribution: bundle txs → actions → (pool, pair, dex), distinct
    # per bundle, each venue accumulating the bundle's profit.
    # "all" excludes liquidation bundles here (block_analysis.rs:677-699).
    vb = b2.filter(
        ~((F.col("fam") == "all") & (F.col("family") == "liquidation"))
    ).select(
        "block_number", "fam", "head_tx", "profit_usd", "revenue_usd",
        F.explode("tx_hashes").alias("tx_hash"),
    )
    acts = actions.select(
        "block_number",
        "tx_hash",
        F.coalesce(
            F.col("swap.pool"), F.col("mint_burn_collect.pool"), F.col("liquidation.pool")
        ).alias("pool"),
        F.coalesce(
            F.when(
                F.col("swap").isNotNull(),
                F.array_join(
                    F.array_sort(F.array("swap.token_in", "swap.token_out")), "|"
                ),
            ),
            F.when(
                F.col("mint_burn_collect").isNotNull(),
                F.array_join(F.array_sort(F.col("mint_burn_collect.tokens")), "|"),
            ),
            F.when(
                F.col("liquidation").isNotNull(),
                F.array_join(
                    F.array_sort(
                        F.array(
                            "liquidation.collateral_asset", "liquidation.debt_asset"
                        )
                    ),
                    "|",
                ),
            ),
        ).alias("pair"),
        F.col("protocol").alias("dex"),
    ).filter(F.col("pool").isNotNull() | F.col("pair").isNotNull())
    venues = vb.join(acts, ["block_number", "tx_hash"])

    def most_arbed(col: str) -> DataFrame:
        per_bundle = venues.filter(F.col(col).isNotNull()).select(
            "block_number", "fam", "head_tx", "profit_usd", "revenue_usd", col
        ).distinct()
        per_venue = per_bundle.groupBy("block_number", "fam", col).agg(
            F.sum("profit_usd").cast(DEC).alias("vprofit"),
            F.sum("revenue_usd").cast(DEC).alias("vrev"),
        )
        by_profit = keep_largest(
            per_venue, ["block_number", "fam"], F.col("vprofit"), col
        ).select(
            "block_number", "fam",
            F.col(col).alias(f"most_arbed_{col}"),
            F.col("vprofit").alias(f"most_arbed_{col}_profit"),
        )
        by_rev = keep_largest(
            per_venue, ["block_number", "fam"], F.col("vrev"), col
        ).select(
            "block_number", "fam",
            F.col(col).alias(f"most_arbed_{col}_rev"),
            F.col("vrev").alias(f"most_arbed_{col}_rev_amt"),
        )
        return by_profit.join(by_rev, ["block_number", "fam"], "left")

    pool_counts = (
        venues.filter(F.col("pool").isNotNull())
        .groupBy("block_number", "fam")
        .agg(F.countDistinct("pool").alias("arbed_pool_count"))
    )

    grain = (
        scal.join(top_prof, ["block_number", "fam"], "left")
        .join(pool_counts, ["block_number", "fam"], "left")
        .join(top_rev, ["block_number", "fam"], "left")
        .join(top_fund, ["block_number", "fam"], "left")
        .join(top_fund_rev, ["block_number", "fam"], "left")
        .join(biggest, ["block_number", "fam"], "left")
        .join(biggest_rev, ["block_number", "fam"], "left")
        .join(entity_lists("eoa", "searcher_eoa"), ["block_number", "fam"], "left")
        .join(entity_lists("mev_contract", "mev_contract"), ["block_number", "fam"], "left")
        .join(entity_lists("fund", "fund"), ["block_number", "fam"], "left")
        .join(most_arbed("pool"), ["block_number", "fam"], "left")
        .join(most_arbed("pair"), ["block_number", "fam"], "left")
        .join(most_arbed("dex"), ["block_number", "fam"], "left")
    )
    metrics = [c for c in grain.columns if c not in ("block_number", "fam")]
    return (
        grain.groupBy("block_number")
        .pivot("fam", ANALYSIS_FAMILIES)
        .agg(*[F.first(m).alias(m) for m in metrics])
        .orderBy("block_number")
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
    # metadata-only solver tags (PropellerLabsSolver-class protocols) extend
    # the known-searcher set when the protocol dim is provided
    tags = None
    if "address_to_protocol" in tables:
        from ..classify import protocol_searcher_tags

        tags = protocol_searcher_tags(tables["address_to_protocol"])
    activity = searcher_activity_bundles(
        deduped, tables["tx_info"], tables["searcher_info"], deltas, gas,
        searcher_contracts=tags,
    )
    final = deduped.unionByName(activity).orderBy("block_number", "mev_type")
    header = mev_block_header(final, tables["tx_info"], tables["block_info"])
    return {"bundles": final, "mev_blocks": header}
