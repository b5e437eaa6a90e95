"""Named query-plan registry: every implemented operator from SURVEY.md §2
registers (a) a Spark plan builder and (b) a DuckDB oracle SQL twin. The
driver contract (__spark_entry__.py) and the pytest parity harness both
consume this registry, so a query is "done" exactly when it is registered
and hash-matches its oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB over the same parquet views
    survey_ref: str     # SURVEY.md §2 operator ids + reference file:line


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, survey_ref: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco


#: The driver verifies only the FIRST 50 registry entries per round, so ordering
#: is part of the correctness contract. Risk-first: gates that have never had a
#: driver row (g4/g5/x5/x6), gates whose last driver word was FAIL, and gates
#: whose implementation changed this round come first; gates with a green prior
#: round row and an unchanged implementation rotate to the tail (they stay
#: covered by the local sf0.01 oracle-parity suite, tests/test_oracle_parity.py).
DRIVER_ORDER: list[str] = [
    # never driver-checked (VERDICT r2 "What's missing" #1) / failed in r1
    "g4_univ3_state",
    "g4_univ3_tick_liquidity",
    "g4_univ3_swap_quotes",
    "g5_path_ticks",
    "x5_intermediary_price",
    "x6_optimistic_vwap",
    # timeseries module: rotated out of the r2 window entirely
    "x1_asof_join",
    "x4_expanding_vwap",
    "s3_grid_downsample",
    "s4_volume_rank",
    "c9_window_dedup",
    "c11_group_stats",
    "i14_outlier_discovery",
    "i15_rolling_window",
    "i1_sandwich_pairs",
    "i6_sequence_classify",
    "o4_daily_rollup",
    "x8_sessionize",
    # changed this round: must re-verify
    "q12_priority_pivot",    # oracle HUGEINT -> BIGINT cast
    "ann_lsh_buckets",       # sign-dim now spark.range(dim)
    "ann_ivf_topk",          # centroid seeds from component-bearing ids
    "mev_composer_bundles",  # bundle_id xxhash64 -> md5; sandwich trim keys
    "mev_block_headers",
    "mev_block_analysis",
    "mev_block_analysis_wide",
    "mev_searcher_stats",
    # r2-green, re-attest while slots remain
    "x2_most_liquid_quote",
    "x3_fee_adjusted_quote",
    "dedup_cc_clusters",
    "q1_pricing_summary",
    "q3_top_urgent",
    "q5_region_revenue",
    "q14_promo_share",
    "a7_overlap_dedup",
    "a1_delta_accounting",
    "o5_wide_rollup",
    "q18_big_orders",
    "q10_returned_items",
    "q7_nation_volume",
    "q22_global_sales_opportunity",
    "q4_priority_ontime",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q21_waiting_supplier",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q8_market_share",
    "q20_majority_supplier",
    # ---- entry 50 boundary: everything below rotates out this round ----
    # (all r2-green with unchanged implementations; still run by the local
    # parity suite every test cycle)
    "ann_cosine_topk",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_exact",
    "dedup_simhash",
    "txt_quality_score",
    "txt_lang_id",
    "txt_token_count",
    "txt_fingerprint",
    "sample_stratified",
    "mm_frame_sample",
    "corpus_select",
    "t1_filter_project",
    "q6_forecast_revenue",
    "t8_exists_semijoin",
    "t6_anti_join",
    "q13_order_count_distribution",
]


def _ordered() -> list[str]:
    """Registry names in driver order; anything not in DRIVER_ORDER appends in
    registration order so a newly-registered gate is never silently dropped."""
    known = [n for n in DRIVER_ORDER if n in REGISTRY]
    extra = [n for n in REGISTRY if n not in DRIVER_ORDER]
    return known + extra


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].build for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }


#: shared oracle prelude: events with epoch-ns bigint timestamps, matching
#: the Spark side's nanosAsLong read (sources/testdata.py).
EV_CTE = (
    "ev AS (SELECT event_id, epoch_ns(ts) AS ts_ns, user_id, event_type, value, props "
    "FROM events)"
)
