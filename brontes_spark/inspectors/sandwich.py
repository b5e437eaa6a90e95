"""Sandwich inspector — reference I1-I5 (SURVEY.md §2.7):
`mev_inspectors/sandwich/mod.rs`.

Candidate generation (I1, mod.rs:1014-1135): within a block, the ordered tx
chain of each repeated actor forms possible sandwiches — TWO scans, one
keyed by duplicate EOA and one by duplicate mev contract (the reference's
get_possible_sandwich_duplicate_senders / _duplicate_contracts), unioned
with identical chains deduplicated. Chains with multiple frontruns are the
"Big Mac" shape. A chain's txs may carry DIFFERENT eoa/mev_contract values
(e.g. one contract driven by several EOAs): attribution uses the first
searcher tx's identity, like the reference's bundle header.

Gap partitioning (I2, mod.rs:902-953): a chain splits wherever two
consecutive searcher txs have NO victim txs between them — each victim-backed
segment is an independent candidate.

Bounded shrink (I4, mod.rs:447-555): when a segment fails validation, the
reference recurses ≤6 times dropping head/tail txs. Set-based equivalent:
enumerate head/tail trims with head+tail ≤ MAX_SHRINK in one explode,
validate all trimmed variants at once, and keep the widest passing variant
per segment (keep_largest) — no iteration, same search space.

Pool-overlap validation (I3, mod.rs:556-740): the backrun must reverse a
pool/direction some frontrun swapped; ≥50% of swapping victims must swap a
frontrun pool in the frontrun direction; and ≥1 victim must FULLY overlap —
same pool + front direction AND opposite to the backrun
(verify_sandwich_victims' low_priority/high_priority split).

PnL (I5, mod.rs:168-446): searcher address-set USD deltas across the
segment's searcher txs minus their gas. The set spans every chain tx's
eoa + mev_contract (+ the scan actor). Documented divergence: the
reference additionally folds in sibling-searcher addresses from its
searcher db and zeroes profit behind a MAX_PRICE_DIFF(0.995) price-
reliability guard — our tx_info/dex_prices model carries neither signal,
so both are out of scope (the A4 valid_pricing filter is the engine's
price-sanity mechanism).

Scale: everything is (block, actor)-local — windows and small array ops per
group; the trim enumeration multiplies candidates by ≤28, a bounded constant;
the dual scan doubles candidate volume, still block-bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..operators.windows import keep_largest
from .accounting import action_deltas, gas_usd, usd_deltas

MAX_SHRINK = 6


def _scan_segments(
    swaps: DataFrame, tx_info: DataFrame, actor_col: Column, scan: str
) -> DataFrame:
    """One I1+I2 scan keyed by `actor_col`: per (block, actor), maximal
    searcher-tx chains split at empty victim gaps; one row per segment with
    the ordered searcher tx array (each element carrying its own
    eoa/mev_contract for attribution and the PnL searcher set).

    The gap test counts ALL txs between consecutive searcher txs (not only
    swap txs) — mod.rs:902-953 partitions on empty tx intervals, so a
    non-swap tx in the gap keeps the chain joined."""
    swap_txs = swaps.select("block_number", "tx_hash").distinct()
    actors = (
        tx_info.withColumn("actor", actor_col)
        .filter(F.col("actor").isNotNull())
        .join(swap_txs.select("tx_hash"), "tx_hash", "left_semi")
        .select("block_number", "actor", "eoa", "mev_contract", "tx_hash", "tx_index")
    )
    w = W.partitionBy("block_number", "actor").orderBy("tx_index")
    chains = (
        actors.withColumn("next_index", F.lead("tx_index").over(w))
        .withColumn(
            "n_chain", F.count(F.lit(1)).over(W.partitionBy("block_number", "actor"))
        )
        .filter(F.col("n_chain") >= 2)
    )
    victims = tx_info.select(
        F.col("block_number").alias("v_block"),
        F.col("tx_hash").alias("v_hash"),
        F.col("tx_index").alias("v_index"),
    ).distinct()
    gaps = (
        chains.join(
            victims,
            (F.col("v_block") == F.col("block_number"))
            & (F.col("v_index") > F.col("tx_index"))
            & (F.col("v_index") < F.col("next_index")),
            "left",
        )
        .groupBy(
            "block_number", "actor", "eoa", "mev_contract",
            "tx_hash", "tx_index", "next_index",
        )
        .agg(F.count("v_hash").alias("gap_victims"))
    )
    # segment id = running count of empty gaps strictly before this tx (I2)
    w2 = W.partitionBy("block_number", "actor").orderBy("tx_index")
    empty_gap_after = F.when(
        F.col("next_index").isNotNull() & (F.col("gap_victims") == 0), 1
    ).otherwise(0)
    seg = gaps.withColumn("empty_prev", F.lag(empty_gap_after, 1, 0).over(w2)).withColumn(
        "segment", F.sum("empty_prev").over(w2)
    )
    # NOTE: eoa/mev_contract stay per-ELEMENT, never in the group key — a
    # contract-keyed chain whose txs come from different EOAs is ONE chain
    # (grouping by eoa would fragment it and mislabel the searcher's own
    # txs as victims); segment attribution = the first tx's identity
    return (
        seg.groupBy("block_number", "actor", "segment")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("tx_index", "tx_hash", "eoa", "mev_contract")
                )
            ).alias("chain")
        )
        .filter(F.size("chain") >= 2)
        .select(
            "block_number", "actor", "segment", "chain",
            F.element_at("chain", 1)["eoa"].alias("eoa"),
            F.element_at("chain", 1)["mev_contract"].alias("mev_contract"),
            F.lit(scan).alias("scan"),
        )
    )


def _candidate_segments(swaps: DataFrame, tx_info: DataFrame) -> DataFrame:
    """I1 dual scan: duplicate-EOA chains ∪ duplicate-contract chains
    (reference runs both and dedups; an EOA that fronts directly but backs
    through a contract only shows up in the EOA scan). Identical chains
    found by both scans dedup to the contract-scan row."""
    by_eoa = _scan_segments(swaps, tx_info, F.col("eoa"), "eoa")
    by_contract = _scan_segments(swaps, tx_info, F.col("mev_contract"), "contract")
    both = by_contract.unionByName(by_eoa)
    chain_key = F.md5(
        F.concat_ws(",", F.transform("chain", lambda s: s["tx_hash"]))
    )
    w = W.partitionBy("block_number", chain_key).orderBy("scan")  # contract < eoa
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "scan")
    )


def sandwich_bundles(
    actions: DataFrame,
    tx_info: DataFrame,
    dex_prices: DataFrame,
    block_info: DataFrame,
    deltas: DataFrame | None = None,
    gas: DataFrame | None = None,
) -> DataFrame:
    swaps = actions.filter(F.col("action_type").isin("swap", "swap_with_fee")).select(
        "block_number", "tx_hash", "tx_index", F.col("swap.*")
    ).cache()  # probed by candidates, fronts, backs, and victims below
    segments = _candidate_segments(swaps, tx_info)

    # I4: enumerate head/tail trims (head + tail <= MAX_SHRINK) in one explode
    trims = segments.select(
        "*",
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(MAX_SHRINK)),
                        lambda h: F.transform(
                            F.sequence(F.lit(0), F.lit(MAX_SHRINK)),
                            lambda t: F.struct(h.alias("h"), t.alias("t")),
                        ),
                    )
                ),
                lambda s: (s["h"] + s["t"] <= MAX_SHRINK)
                & (F.size("chain") - s["h"] - s["t"] >= 2),
            )
        ).alias("trim"),
    ).withColumn(
        "sub_chain",
        F.slice(
            "chain", F.col("trim.h") + 1, F.size("chain") - F.col("trim.h") - F.col("trim.t")
        ),
    )
    cand = trims.select(
        "block_number", "actor", "segment",
        "sub_chain",
        # trim attribution follows the trimmed chain's FIRST tx
        F.element_at("sub_chain", 1)["eoa"].alias("eoa"),
        F.element_at("sub_chain", 1)["mev_contract"].alias("mev_contract"),
        F.size("sub_chain").alias("span"),
        F.transform(
            F.slice("sub_chain", 1, F.size("sub_chain") - 1), lambda s: s["tx_hash"]
        ).alias("front_hashes"),
        F.element_at("sub_chain", 1)["tx_index"].alias("first_index"),
        F.element_at("sub_chain", -1)["tx_index"].alias("back_index"),
        F.element_at("sub_chain", -1)["tx_hash"].alias("back_hash"),
    ).cache()  # consumed by the validation joins and the PnL stage
    # candidate identity must pin the exact trim: two equal-span trims of the
    # same segment (h=1,t=0 vs h=0,t=1) are DIFFERENT candidates with
    # different victim intervals, and (first_index, back_index) disambiguates
    # them — keying on span alone would merge their victim/overlap sets and
    # validate each trim against the union (reference validates per recursion
    # branch, mod.rs:447-555)
    ckeys = ["block_number", "actor", "segment", "span", "first_index", "back_index"]

    # I3a: backrun must reverse some frontrun's pool + direction
    fronts = cand.select(
        *ckeys, "back_hash", F.explode("front_hashes").alias("f_hash")
    ).join(
        swaps.select(
            F.col("tx_hash").alias("f_hash"),
            F.col("pool").alias("f_pool"),
            F.col("token_in").alias("f_in"),
            F.col("token_out").alias("f_out"),
        ),
        "f_hash",
    )
    backs = swaps.select(
        F.col("tx_hash").alias("bk_hash"),
        F.col("pool").alias("b_pool"),
        F.col("token_in").alias("b_in"),
        F.col("token_out").alias("b_out"),
    )
    reversed_ok = (
        fronts.join(
            backs,
            (F.col("back_hash") == F.col("bk_hash"))
            & (F.col("f_pool") == F.col("b_pool"))
            & (F.col("f_in") == F.col("b_out"))
            & (F.col("f_out") == F.col("b_in")),
        )
        .select(*ckeys)
        .distinct()
    )
    front_pools = fronts.select(*ckeys, "f_pool", "f_in").distinct()
    # back swaps per candidate, keyed for the full-overlap check: a victim
    # fully overlaps when it swaps OPPOSITE to the back (v_in == back's out)
    back_opp = (
        cand.select(*ckeys, "back_hash")
        .join(
            backs.select(
                F.col("bk_hash").alias("back_hash"),
                F.col("b_pool"),
                F.col("b_out"),
            ),
            "back_hash",
        )
        .select(*ckeys, F.col("b_pool").alias("v_pool"), F.col("b_out").alias("v_in"))
        .distinct()
    )

    # victims inside the candidate interval = ALL txs between first and back
    # searcher tx (mod.rs PossibleSandwich victim sets list every in-between
    # tx), excluding the searcher's own txs; the ≥50% overlap ratio is still
    # computed over the victims that swap (verify_sandwich_victims)
    victims = tx_info.select(
        F.col("block_number").alias("v_block"),
        F.col("tx_hash").alias("v_hash"),
        F.col("tx_index").alias("v_index"),
    ).distinct()
    searcher_txs = cand.select(
        *ckeys, F.explode(F.transform("sub_chain", lambda s: s["tx_hash"])).alias("s_hash")
    )
    in_interval = (
        cand.join(
            victims,
            (F.col("v_block") == F.col("block_number"))
            & (F.col("v_index") > F.col("first_index"))
            & (F.col("v_index") < F.col("back_index")),
        )
        .join(
            searcher_txs.select(*ckeys, F.col("s_hash").alias("v_hash")),
            [*ckeys, "v_hash"],
            "left_anti",
        )
        .select(*ckeys, "v_hash", "v_index")
    )
    all_victims = in_interval.groupBy(*ckeys).agg(
        F.sort_array(F.collect_set(F.struct("v_index", "v_hash"))).alias(
            "victim_structs"
        )
    )
    victim_swaps = in_interval.join(
        swaps.select(
            F.col("tx_hash").alias("v_hash"),
            F.col("pool").alias("v_pool"),
            F.col("token_in").alias("v_in"),
        ).distinct(),
        "v_hash",
    )
    swap_victim_counts = victim_swaps.groupBy(*ckeys).agg(
        F.countDistinct("v_hash").alias("n_victims")
    )
    front_matched = victim_swaps.join(
        front_pools.withColumnRenamed("f_pool", "v_pool").withColumnRenamed(
            "f_in", "v_in"
        ),
        [*ckeys, "v_pool", "v_in"],
        "left_semi",
    )
    overlap = front_matched.groupBy(*ckeys).agg(
        F.countDistinct("v_hash").alias("n_overlap")
    )
    # I3c: ≥1 FULL overlap — a victim matching the front direction whose
    # pool/direction the backrun reverses (v_in == b_out on the same pool)
    full_overlap = (
        front_matched.join(back_opp, [*ckeys, "v_pool", "v_in"], "left_semi")
        .select(*ckeys)
        .distinct()
    )
    validated = (
        cand.join(reversed_ok, ckeys, "left_semi")
        .join(full_overlap, ckeys, "left_semi")
        .join(overlap, ckeys)
        .join(swap_victim_counts, ckeys)
        .join(all_victims, ckeys)
        .filter((F.col("n_victims") > 0) & (F.col("n_overlap") * 2 >= F.col("n_victims")))
    )
    # I4: the widest passing trim per segment wins
    best = keep_largest(
        validated, ["block_number", "actor", "segment"], F.col("span"), "back_hash"
    ).cache()

    # I5: PnL over the searcher set across the segment's searcher txs; the
    # set spans EVERY chain tx's identity (a multi-EOA contract chain books
    # all its EOAs' deltas, like collect_address_set_for_accounting per tx)
    if deltas is None:
        deltas = usd_deltas(action_deltas(actions), dex_prices)
    if gas is None:
        gas = gas_usd(tx_info, block_info)
    searcher_set = F.array_distinct(
        F.array_compact(
            F.concat(
                F.transform("sub_chain", lambda s: s["eoa"]),
                F.transform("sub_chain", lambda s: s["mev_contract"]),
                F.array(F.col("actor")),
            )
        )
    )
    seg_txs = best.select(
        "block_number", "actor", "eoa", "mev_contract", "segment",
        "sub_chain", "front_hashes", "back_hash", "victim_structs",
        searcher_set.alias("searcher_set"),
        F.explode(F.transform("sub_chain", lambda s: s["tx_hash"])).alias("tx_hash"),
    )
    rev = (
        seg_txs.join(deltas.select("tx_hash", "address", "usd"), "tx_hash")
        .filter(F.array_contains(F.col("searcher_set"), F.col("address")))
        .groupBy("block_number", "actor", "segment")
        .agg(F.sum("usd").alias("revenue_usd"))
    )
    gcost = (
        seg_txs.join(gas.select("tx_hash", "gas_usd"), "tx_hash")
        .groupBy("block_number", "actor", "segment")
        .agg(F.sum("gas_usd").alias("gas_usd"))
    )
    # tx_hashes in BLOCK order (searcher txs + victims interleaved by
    # tx_index) — a Big Mac's victims sit between their own frontruns, and
    # consumers read the array as the block-ordered bundle
    ordered_hashes = F.transform(
        F.sort_array(
            F.concat(
                F.transform(
                    "sub_chain",
                    lambda s: F.struct(
                        s["tx_index"].alias("v_index"), s["tx_hash"].alias("v_hash")
                    ),
                ),
                F.col("victim_structs"),
            )
        ),
        lambda s: s["v_hash"],
    )
    return (
        best.join(rev, ["block_number", "actor", "segment"])
        .join(gcost, ["block_number", "actor", "segment"])
        .withColumn(
            "profit_usd", (F.col("revenue_usd") - F.col("gas_usd")).cast("decimal(38,18)")
        )
        .filter(F.col("profit_usd") > 0)
        .select(
            "block_number",
            ordered_hashes.alias("tx_hashes"),
            "eoa",
            "mev_contract",
            F.when(F.size("front_hashes") > 1, "sandwich:big_mac")
            .otherwise("sandwich")
            .alias("mev_type"),
            "profit_usd",
            F.col("revenue_usd").cast("decimal(38,18)").alias("revenue_usd"),
            F.col("gas_usd").cast("decimal(38,18)").alias("gas_usd"),
        )
    )
