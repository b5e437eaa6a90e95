"""Driver-gated MEV pipeline queries.

The inspector stack (SURVEY.md §2.7/§2.8) runs on the blockchain-shaped
fixture tables (sources/fixtures.py), not on the TPC-H star schema — but its
outputs are closed-form, so the DuckDB oracle is the literal golden VALUES
relation. A hash match here means candidate generation, coverage-deduped
delta accounting, USD valuation, expanding-window VWAP, gas accounting, and
composer precedence all computed exactly the planted numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.decimals import to_dbl
from ..inspectors.composer import mev_block_header, run_composer
from ..sources.fixtures import load_fixtures
from .registry import register

_memo: dict[int, tuple[dict, dict]] = {}


def _composed(spark: SparkSession):
    """Run the composer once per session; fixture data is KB-sized, so also
    drop shuffle parallelism (hundreds of 32-task stages dominate wall time
    otherwise — pure scheduler overhead, not compute)."""
    key = id(spark)
    if key not in _memo:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            tables = load_fixtures(spark)
            out = run_composer(tables)
            out["bundles"] = out["bundles"].cache()
            out["bundles"].count()  # materialize under the low-parallelism conf
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        _memo[key] = (tables, out)
    return _memo[key]

_DEC = "DECIMAL(38,18)"


def _bundle_values() -> str:
    # tx_hashes is the comma-joined ordered list (the driver's canonicalizer
    # hashes scalar cells, so array cells ride as strings on both sides)
    rows = [
        ("100", "'0xf0,0xv1,0xv2,0xb0'", "'0xsearcher1'", "'0xmev1'",
         "'sandwich'", "88", "90", "2"),
        ("101", "'0xarb'", "'0xsearcher2'", "NULL", "'atomic_arb:triangle'",
         "49", "50", "1"),
        ("102", "'0xjf,0xjv,0xjb'", "'0xsearcher2'", "'0xmev2'", "'jit'",
         "4", "6", "2"),
        ("103", "'0xliq'", "'0xliquidator'", "NULL", "'liquidation'",
         "19", "20", "1"),
        ("104", "'0xcd'", "'0xsearcher1'", "NULL", "'cex_dex'", "4", "5", "1"),
        ("107", "'0xbm_f1,0xbm_v1,0xbm_f2,0xbm_v2,0xbm_b'",
         "'0xsearcher3'", "NULL", "'sandwich:big_mac'", "97", "100", "3"),
        ("108", "'0xg_f1,0xg_v1,0xg_b1'", "'0xsearcher4'", "NULL",
         "'sandwich'", "3", "5", "2"),
        ("108", "'0xg_f2,0xg_v2,0xg_b2'", "'0xsearcher4'", "NULL",
         "'sandwich'", "3", "5", "2"),
        ("109", "'0xjs_b,0xjs_f,0xjs_v'", "'0xsearcher2'", "NULL",
         "'jit_sandwich'", "17", "19", "2"),
        ("110", "'0xsa'", "'0xsearcher1'", "NULL", "'searcher_tx'",
         "29", "30", "1"),
    ]
    values = ",\n      ".join(
        f"({bn}, {txs}, {eoa}, {mc}, {mt}, "
        f"CAST({p} AS DOUBLE), CAST({r} AS DOUBLE), CAST({g} AS DOUBLE))"
        for (bn, txs, eoa, mc, mt, p, r, g) in rows
    )
    return f"""
    SELECT CAST(block_number AS BIGINT) AS block_number, tx_hashes,
           eoa, mev_contract, mev_type, profit_usd, revenue_usd, gas_usd
    FROM (VALUES
      {values}
    ) AS t(block_number, tx_hashes, eoa, mev_contract, mev_type,
           profit_usd, revenue_usd, gas_usd)
    """


@register(
    "mev_composer_bundles",
    oracle=_bundle_values(),
    survey_ref="I1-I15 + O1/O3 end-to-end (composer/mod.rs:71-343); golden "
    "VALUES oracle from the closed-form planted PnL (FIXTURES.md §9)",
)
def mev_composer_bundles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixture-driven: sf_dir is unused — the MEV inputs are the planted
    # blockchain-shaped tables, mirroring the reference's golden-fixture tests
    _, out = _composed(spark)
    return out["bundles"].select(
        "block_number",
        F.concat_ws(",", "tx_hashes").alias("tx_hashes"),
        "eoa", "mev_contract", "mev_type",
        to_dbl("profit_usd").alias("profit_usd"),
        to_dbl("revenue_usd").alias("revenue_usd"),
        to_dbl("gas_usd").alias("gas_usd"),
    )


@register(
    "mev_block_headers",
    oracle="""
    SELECT CAST(bn AS BIGINT) AS block_number,
           CAST(n_bundles AS BIGINT) AS n_bundles,
           CAST(profit AS DOUBLE) AS total_profit_usd,
           CAST(gas AS DOUBLE) AS builder_gas_usd
    FROM (VALUES
      (100, 1, 88, 4),
      (101, 1, 49, 2),
      (102, 1, 4,  3),
      (103, 1, 19, 1),
      (104, 1, 4,  1),
      (105, 0, NULL, NULL),
      (106, 0, NULL, NULL),
      (107, 1, 97, 5),
      (108, 2, 6,  6),
      (109, 1, 17, 3),
      (110, 1, 29, 1)
    ) AS t(bn, n_bundles, profit, gas)
    """,
    survey_ref="O4 MevBlock header build (composer/utils.rs:15-242)",
)
def mev_block_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables, out = _composed(spark)
    header = mev_block_header(out["bundles"], tables["tx_info"], tables["block_info"])
    return header.select(
        "block_number", "n_bundles",
        to_dbl("total_profit_usd").alias("total_profit_usd"),
        to_dbl("builder_gas_usd").alias("builder_gas_usd"),
    )


@register(
    "mev_block_analysis",
    oracle="""
    SELECT CAST(bn AS BIGINT) AS block_number,
           CAST(nb AS BIGINT) AS n_bundles,
           CAST(nsw AS BIGINT) AS n_sandwich, CAST(njs AS BIGINT) AS n_jit_sandwich,
           CAST(njit AS BIGINT) AS n_jit, CAST(narb AS BIGINT) AS n_atomic_arb,
           CAST(ncd AS BIGINT) AS n_cex_dex, CAST(nliq AS BIGINT) AS n_liquidation,
           CAST(nsa AS BIGINT) AS n_searcher_tx,
           top_eoa AS top_searcher,
           CAST(topp AS DOUBLE) AS top_searcher_profit_usd,
           CAST(totp AS DOUBLE) AS total_profit_usd,
           CAST(totb AS DOUBLE) AS total_bribe_usd
    FROM (VALUES
      (100, 1, 1,0,0,0,0,0,0, '0xsearcher1', 88, 88, 2),
      (101, 1, 0,0,0,1,0,0,0, '0xsearcher2', 49, 49, 1),
      (102, 1, 0,0,1,0,0,0,0, '0xsearcher2', 4, 4, 2),
      (103, 1, 0,0,0,0,0,1,0, '0xliquidator', 19, 19, 1),
      (104, 1, 0,0,0,0,1,0,0, '0xsearcher1', 4, 4, 1),
      (107, 1, 1,0,0,0,0,0,0, '0xsearcher3', 97, 97, 3),
      (108, 2, 2,0,0,0,0,0,0, '0xsearcher4', 3, 6, 4),
      (109, 1, 0,1,0,0,0,0,0, '0xsearcher2', 17, 17, 2),
      (110, 1, 0,0,0,0,0,0,1, '0xsearcher1', 29, 29, 1)
    ) AS t(bn, nb, nsw, njs, njit, narb, ncd, nliq, nsa, top_eoa, topp, totp, totb)
    """,
    survey_ref="O5 BlockAnalysis wide rollup over bundles (db/block_analysis.rs:22-2667): "
    "per-type counts + top-searcher max_by + profit/bribe totals",
)
def mev_block_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import keep_largest

    _, out = _composed(spark)
    b = out["bundles"].withColumn("family", F.split("mev_type", ":")[0])

    def cnt(fam):
        return F.sum(F.when(F.col("family") == fam, 1).otherwise(0)).alias(f"n_{fam}")

    agg = b.groupBy("block_number").agg(
        F.count(F.lit(1)).alias("n_bundles"),
        cnt("sandwich"), cnt("jit_sandwich"), cnt("jit"), cnt("atomic_arb"),
        cnt("cex_dex"), cnt("liquidation"), cnt("searcher_tx"),
        F.sum("profit_usd").cast("decimal(38,18)").alias("total_profit_usd"),
        F.sum("gas_usd").cast("decimal(38,18)").alias("total_bribe_usd"),
    )
    top = keep_largest(
        b.select("block_number", "eoa", "profit_usd"),
        ["block_number"], F.col("profit_usd"), "eoa",
    ).select(
        "block_number",
        F.col("eoa").alias("top_searcher"),
        F.col("profit_usd").alias("top_searcher_profit_usd"),
    )
    return agg.join(top, "block_number").select(
        "block_number", "n_bundles",
        "n_sandwich", "n_jit_sandwich", "n_jit", "n_atomic_arb",
        "n_cex_dex", "n_liquidation", "n_searcher_tx",
        "top_searcher",
        to_dbl("top_searcher_profit_usd").alias("top_searcher_profit_usd"),
        to_dbl("total_profit_usd").alias("total_profit_usd"),
        to_dbl("total_bribe_usd").alias("total_bribe_usd"),
    )


def _wide_values() -> str:
    """Golden cells for the wide BlockAnalysis projection, hand-derived from
    the bundle table in _bundle_values plus the fixture actions/searcher
    dims (venue ties break lexicographically; 'all' excludes searcher_tx
    everywhere and liquidation from venue metrics)."""
    N = "NULL"
    rows = [
        # bn, all:(nb, prof, rev, tsp, tsp_amt, tsr, tsr_amt, fund, fund_amt,
        #          fund_cnt, searcher_cnt, contract_cnt, big_tx, big_prof,
        #          pool, pool_prof, pair, dex), sandwich:(nb, prof), stx:(nb, prof)
        (100, 1, 88, 90, "'0xsearcher1'", 88, "'0xsearcher1'", 90, "'fund_1'", 88,
         1, 1, 1, "'0xf0'", 88, "'0xpool1'", 88, "'0xtoka|0xtokb'", "'UniswapV2'",
         1, 88, N, N, "'fund_1'", 90, "'0xf0'", 90, "'0xpool1'", 90),
        (101, 1, 49, 50, "'0xsearcher2'", 49, "'0xsearcher2'", 50, "'fund_2'", 49,
         1, 1, 0, "'0xarb'", 49, "'0xpool1'", 49, "'0xtoka|0xtokb'", "'UniswapV2'",
         N, N, N, N, "'fund_2'", 50, "'0xarb'", 50, "'0xpool1'", 50),
        (102, 1, 4, 6, "'0xsearcher2'", 4, "'0xsearcher2'", 6, "'fund_2'", 4,
         1, 1, 1, "'0xjf'", 4, "'0xpool2'", 4, "'0xtoka|0xtokb'", "'UniswapV2'",
         N, N, N, N, "'fund_2'", 6, "'0xjf'", 6, "'0xpool2'", 6),
        (103, 1, 19, 20, "'0xliquidator'", 19, "'0xliquidator'", 20, N, N,
         0, 1, 0, "'0xliq'", 19, N, N, N, N, N, N, N, N,
         N, N, "'0xliq'", 20, N, N),
        (104, 1, 4, 5, "'0xsearcher1'", 4, "'0xsearcher1'", 5, "'fund_1'", 4,
         1, 1, 0, "'0xcd'", 4, "'0xpool1'", 4, "'0xtoka|0xusd'", "'UniswapV2'",
         N, N, N, N, "'fund_1'", 5, "'0xcd'", 5, "'0xpool1'", 5),
        (107, 1, 97, 100, "'0xsearcher3'", 97, "'0xsearcher3'", 100, N, N,
         0, 1, 0, "'0xbm_f1'", 97, "'0xpool1'", 97, "'0xtoka|0xtokb'", "'UniswapV2'",
         1, 97, N, N, N, N, "'0xbm_f1'", 100, "'0xpool1'", 100),
        (108, 2, 6, 10, "'0xsearcher4'", 3, "'0xsearcher4'", 5, N, N,
         0, 1, 0, "'0xg_f1'", 3, "'0xpool1'", 6, "'0xtoka|0xtokb'", "'UniswapV2'",
         2, 6, N, N, N, N, "'0xg_f1'", 5, "'0xpool1'", 10),
        (109, 1, 17, 19, "'0xsearcher2'", 17, "'0xsearcher2'", 19, "'fund_2'", 17,
         1, 1, 0, "'0xjs_b'", 17, "'0xpool2'", 17, "'0xtoka|0xtokb'", "'UniswapV2'",
         N, N, N, N, "'fund_2'", 19, "'0xjs_b'", 19, "'0xpool2'", 19),
        (110, N, N, N, N, N, N, N, N, N, N, N, N, N, N, N, N, N, N,
         N, N, 1, 29, N, N, N, N, N, N),
    ]
    values = ",\n      ".join("(" + ", ".join(str(v) for v in r) + ")" for r in rows)
    return f"""
    SELECT CAST(bn AS BIGINT) AS block_number,
           CAST(anb AS BIGINT) AS all_bundle_count,
           CAST(ap AS DOUBLE) AS all_total_profit,
           CAST(ar AS DOUBLE) AS all_total_revenue,
           tsp AS all_top_searcher_profit,
           CAST(tspa AS DOUBLE) AS all_top_searcher_profit_amt,
           tsr AS all_top_searcher_rev,
           CAST(tsra AS DOUBLE) AS all_top_searcher_rev_amt,
           fnd AS all_top_fund_profit,
           CAST(fnda AS DOUBLE) AS all_top_fund_profit_amt,
           CAST(fc AS BIGINT) AS all_fund_count,
           CAST(sc AS BIGINT) AS all_searcher_count,
           CAST(cc AS BIGINT) AS all_mev_contract_count,
           btx AS all_biggest_arb_tx,
           CAST(bpa AS DOUBLE) AS all_biggest_arb_profit,
           pool AS all_most_arbed_pool,
           CAST(poolp AS DOUBLE) AS all_most_arbed_pool_profit,
           pair AS all_most_arbed_pair,
           dex AS all_most_arbed_dex,
           CAST(snb AS BIGINT) AS sandwich_bundle_count,
           CAST(sp AS DOUBLE) AS sandwich_total_profit,
           CAST(xnb AS BIGINT) AS searcher_tx_bundle_count,
           CAST(xp AS DOUBLE) AS searcher_tx_total_profit,
           fndr AS all_top_fund_rev,
           CAST(fndra AS DOUBLE) AS all_top_fund_rev_amt,
           brtx AS all_biggest_arb_rev_tx,
           CAST(bra AS DOUBLE) AS all_biggest_arb_rev,
           poolr AS all_most_arbed_pool_rev,
           CAST(poolra AS DOUBLE) AS all_most_arbed_pool_rev_amt
    FROM (VALUES
      {values}
    ) AS t(bn, anb, ap, ar, tsp, tspa, tsr, tsra, fnd, fnda, fc, sc, cc,
           btx, bpa, pool, poolp, pair, dex, snb, sp, xnb, xp,
           fndr, fndra, brtx, bra, poolr, poolra)
    """


@register(
    "mev_block_analysis_wide",
    oracle=_wide_values(),
    survey_ref="O5 wide BlockAnalysis (db/block_analysis.rs:22-2667): "
    "per-family column blocks; this gate projects the deterministic "
    "all/sandwich/searcher_tx cells (margins are pytest-gated doubles)",
)
def mev_block_analysis_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..inspectors.composer import block_analysis_wide

    tables, out = _composed(spark)
    wide = block_analysis_wide(
        out["bundles"], tables["actions"], tables["searcher_info"]
    )
    d = lambda c: to_dbl(c).alias(c)  # noqa: E731
    return wide.select(
        "block_number",
        "all_bundle_count", d("all_total_profit"), d("all_total_revenue"),
        "all_top_searcher_profit", d("all_top_searcher_profit_amt"),
        "all_top_searcher_rev", d("all_top_searcher_rev_amt"),
        "all_top_fund_profit", d("all_top_fund_profit_amt"),
        "all_fund_count", "all_searcher_count", "all_mev_contract_count",
        "all_biggest_arb_tx", d("all_biggest_arb_profit"),
        "all_most_arbed_pool", d("all_most_arbed_pool_profit"),
        "all_most_arbed_pair", "all_most_arbed_dex",
        "sandwich_bundle_count", d("sandwich_total_profit"),
        "searcher_tx_bundle_count", d("searcher_tx_total_profit"),
        # revenue twins (round 4: full metric surface of block_analysis.rs)
        "all_top_fund_rev", d("all_top_fund_rev_amt"),
        "all_biggest_arb_rev_tx", d("all_biggest_arb_rev"),
        "all_most_arbed_pool_rev", d("all_most_arbed_pool_rev_amt"),
    )


def _searcher_stats_values() -> str:
    rows = [
        ("'0xliquidator'", 1, "19", "1"),
        ("'0xsearcher1'", 3, "121", "4"),
        ("'0xsearcher2'", 3, "70", "5"),
        ("'0xsearcher3'", 1, "97", "3"),
        ("'0xsearcher4'", 2, "6", "4"),
    ]
    values = ",\n      ".join(
        f"({eoa}, {n}, CAST({p} AS DOUBLE), CAST({b} AS DOUBLE))"
        for (eoa, n, p, b) in rows
    )
    return f"""
    SELECT eoa, CAST(n AS BIGINT) AS n_bundles,
           p AS total_profit_usd, b AS total_bribe_usd
    FROM (VALUES
      {values}
    ) AS t(eoa, n, p, b)
    """


@register(
    "mev_searcher_stats",
    oracle=_searcher_stats_values(),
    survey_ref="S10 searcher-stats upsert as idempotent recompute "
    "(processors/mev.rs:111-148): per-eoa bundle counts + PnL totals over "
    "the composed bundle set (bundle_counts map pytest-gated — map string "
    "reprs differ across engines)",
)
def mev_searcher_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import searcher_stats

    _tables, out = _composed(spark)
    return searcher_stats(out["bundles"]).select(
        "eoa", "n_bundles",
        to_dbl("total_profit_usd").alias("total_profit_usd"),
        to_dbl("total_bribe_usd").alias("total_bribe_usd"),
    )
