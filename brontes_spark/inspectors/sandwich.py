"""Sandwich inspector — reference I1-I5 (SURVEY.md §2.7):
`mev_inspectors/sandwich/mod.rs`.

Candidate generation (I1, mod.rs:1014-1135): within a block, the ordered tx
chain of each repeated actor (mev_contract if present, else eoa) forms
possible sandwiches; chains with multiple frontruns are the "Big Mac" shape.

Gap partitioning (I2, mod.rs:902-953): a chain splits wherever two
consecutive searcher txs have NO victim txs between them — each victim-backed
segment is an independent candidate.

Bounded shrink (I4, mod.rs:447-555): when a segment fails validation, the
reference recurses ≤6 times dropping head/tail txs. Set-based equivalent:
enumerate head/tail trims with head+tail ≤ MAX_SHRINK in one explode,
validate all trimmed variants at once, and keep the widest passing variant
per segment (keep_largest) — no iteration, same search space.

Pool-overlap validation (I3, mod.rs:556-740): the backrun must reverse a
pool/direction some frontrun swapped, and ≥50% of victim txs must swap a
frontrun pool in the frontrun direction.

PnL (I5, mod.rs:168-446): searcher address-set USD deltas across the
segment's searcher txs minus their gas.

Scale: everything is (block, actor)-local — windows and small array ops per
group; the trim enumeration multiplies candidates by ≤28, a bounded constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..operators.windows import keep_largest
from .accounting import action_deltas, gas_usd, usd_deltas

MAX_SHRINK = 6


def _candidate_segments(swaps: DataFrame, tx_info: DataFrame) -> DataFrame:
    """I1+I2: per (block, actor): maximal searcher-tx chains split at empty
    victim gaps; one row per segment with the ordered searcher tx array.

    The gap test counts ALL txs between consecutive searcher txs (not only
    swap txs) — mod.rs:902-953 partitions on empty tx intervals, so a
    non-swap tx in the gap keeps the chain joined."""
    swap_txs = swaps.select("block_number", "tx_hash").distinct()
    actors = (
        tx_info.withColumn("actor", F.coalesce("mev_contract", "eoa"))
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
    return (
        seg.groupBy("block_number", "actor", "eoa", "mev_contract", "segment")
        .agg(F.sort_array(F.collect_list(F.struct("tx_index", "tx_hash"))).alias("chain"))
        .filter(F.size("chain") >= 2)
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
        "block_number", "actor", "eoa", "mev_contract", "segment",
        "sub_chain",
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
        F.transform(
            F.sort_array(F.collect_set(F.struct("v_index", "v_hash"))),
            lambda s: s["v_hash"],
        ).alias("victim_hashes")
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
    overlap = (
        victim_swaps.join(
            front_pools.withColumnRenamed("f_pool", "v_pool").withColumnRenamed(
                "f_in", "v_in"
            ),
            [*ckeys, "v_pool", "v_in"],
            "left_semi",
        )
        .groupBy(*ckeys)
        .agg(F.countDistinct("v_hash").alias("n_overlap"))
    )
    validated = (
        cand.join(reversed_ok, ckeys, "left_semi")
        .join(overlap, ckeys)
        .join(swap_victim_counts, ckeys)
        .join(all_victims, ckeys)
        .filter((F.col("n_victims") > 0) & (F.col("n_overlap") * 2 >= F.col("n_victims")))
    )
    # I4: the widest passing trim per segment wins
    best = keep_largest(
        validated, ["block_number", "actor", "segment"], F.col("span"), "back_hash"
    ).cache()

    # I5: PnL over the searcher set across the segment's searcher txs
    if deltas is None:
        deltas = usd_deltas(action_deltas(actions), dex_prices)
    if gas is None:
        gas = gas_usd(tx_info, block_info)
    seg_txs = best.select(
        "block_number", "actor", "eoa", "mev_contract", "segment",
        "front_hashes", "back_hash", "victim_hashes",
        F.explode(F.transform("sub_chain", lambda s: s["tx_hash"])).alias("tx_hash"),
    )
    searcher_set = F.array_compact(F.array("eoa", "mev_contract", F.col("actor")))
    rev = (
        seg_txs.join(deltas.select("tx_hash", "address", "usd"), "tx_hash")
        .filter(F.array_contains(searcher_set, F.col("address")))
        .groupBy("block_number", "actor", "segment")
        .agg(F.sum("usd").alias("revenue_usd"))
    )
    gcost = (
        seg_txs.join(gas.select("tx_hash", "gas_usd"), "tx_hash")
        .groupBy("block_number", "actor", "segment")
        .agg(F.sum("gas_usd").alias("gas_usd"))
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
            F.concat(
                F.col("front_hashes"), F.col("victim_hashes"), F.array("back_hash")
            ).alias("tx_hashes"),
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
