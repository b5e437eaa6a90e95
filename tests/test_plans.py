"""Physical-plan quality gates — the 100 TB discipline checks (SURVEY.md §4).

These tests pin the OPTIMIZER behavior, not results: filters must reach the
parquet scan, scans must prune columns, dimension joins must broadcast,
global top-k must plan as TakeOrderedAndProject (never a single-partition
window), the hot aggregations must sit inside WholeStageCodegen, and no
testdata-backed query may degenerate into a CartesianProduct. A regression
in any of these is invisible at sf0.01 correctness but catastrophic at
cluster scale — exactly the class of bug a results-only gate can't catch.
"""

from __future__ import annotations

import pytest

from brontes_spark.plans import registry

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str, mode: str = "formatted") -> str:
    df = registry.REGISTRY[name].build(spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def test_scan_pushdown_and_column_pruning(spark):
    plan = _plan(spark, "t1_filter_project")
    assert "PushedFilters:" in plan
    # the shipdate/discount/quantity predicates must reach the scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # projection needs 6 columns; the scan must not read the rest
    schema_part = plan.split("ReadSchema")[1][:400]
    assert "l_returnflag" not in schema_part
    assert "l_tax" not in schema_part


def test_dimension_joins_broadcast(spark):
    plan = _plan(spark, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan
    plan3 = _plan(spark, "q3_top_urgent")
    assert "BroadcastHashJoin" in plan3


def test_topk_plans_as_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "q3_top_urgent")


def test_hot_aggregation_in_codegen(spark):
    # AQE's pre-execution formatted plan hides codegen spans; the codegen
    # explain mode compiles the stages and reports the subtree count
    plan = _plan(spark, "q1_pricing_summary", "codegen")
    assert "WholeStageCodegen" in plan
    assert "HashAggregate" in _plan(spark, "q1_pricing_summary")


def test_semi_anti_join_shapes(spark):
    assert "LeftSemi" in _plan(spark, "t8_exists_semijoin", "extended")
    assert "LeftAnti" in _plan(spark, "t6_anti_join", "extended")


@pytest.mark.parametrize(
    "name",
    [
        n
        for n in registry.REGISTRY
        # fixture-backed MEV/univ3 queries execute at build time (cached
        # composer); the testdata-backed set is the scan-plan surface
        if not n.startswith(("mev_", "g4_", "g5_"))
    ],
)
def test_no_cartesian_product(spark, name):
    """A CartesianProduct anywhere is a scale bug; intentional 1-row scalar
    cross joins must come through broadcast (BroadcastNestedLoopJoin)."""
    plan = _plan(spark, name, "simple")
    assert "CartesianProduct" not in plan


def _n_shuffles(plan: str) -> int:
    """Distinct shuffle Exchange nodes in a formatted plan (broadcast and
    reused exchanges excluded)."""
    import re

    return len(
        {
            m.group(1)
            for line in plan.splitlines()
            for m in [re.match(r"\((\d+)\) Exchange$", line.strip())]
            if m
        }
    )


def test_lsh_sign_join_no_corpus_shuffle(spark):
    """The planes x dim sign table must broadcast; the only shuffle allowed
    is the per-id signature groupBy (a corpus-derived sign dim would add a
    full-table Exchange before the join — the r2 scale bug)."""
    plan = _plan(spark, "ann_lsh_buckets")
    assert "BroadcastExchange" in plan
    assert _n_shuffles(plan) == 1


def test_cosine_topk_shuffle_budget(spark):
    """Brute-force cosine pairs via broadcast + in-row array dots: exactly
    the explicit parallelism repartition and the final top-k window may
    shuffle — a pos-join/groupBy formulation would add x dim-row exchanges."""
    plan = _plan(spark, "ann_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert _n_shuffles(plan) == 2


def test_decay_vwap_rides_the_unweighted_shuffles(spark):
    """The X4/X6 decay-weight option must not add exchanges: the quantized
    weight is a per-row projection folded into the existing per-step /
    taken-set aggregations, so weighted and unweighted plans shuffle
    identically (and neither touches Python)."""
    for weighted, plain in (
        ("x4_decay_vwap", "x4_expanding_vwap"),
        ("x6_decay_vwap", "x6_optimistic_vwap"),
    ):
        pw = _plan(spark, weighted)
        pp = _plan(spark, plain)
        assert pw.count("Exchange") == pp.count("Exchange"), weighted
        assert "Python" not in pw, weighted


def test_funnel_single_shuffle(spark):
    """x9_funnel_stages: the sorted-fold formulation pays exactly ONE
    exchange (the user_id groupBy) — the 3-join textbook shape would pay
    three full-stream shuffles plus joins."""
    plan = _plan(spark, "x9_funnel_stages")
    assert _n_shuffles(plan) == 1
    assert "Join" not in plan


def test_retention_one_scan_two_exchanges(spark):
    """x10_retention_cohorts: one parquet scan (no second-branch rescan),
    the up-front user_id repartition serving both the (user, day) distinct
    and the cohort-min window, plus only the final (cohort, offset) agg
    exchange."""
    import re

    plan = _plan(spark, "x10_retention_cohorts")
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert _n_shuffles(plan) == 2
    assert "Join" not in plan


def test_chunk_windows_zero_shuffle(spark):
    """txt_chunk_windows: chunking is pure per-row column math — chunk rows
    must leave the scan partition with NO exchange and NO Python."""
    plan = _plan(spark, "txt_chunk_windows")
    assert _n_shuffles(plan) == 0
    assert "Python" not in plan


def test_semantic_dedup_broadcasts_centroids(spark):
    """dedup_semantic: the K-row centroid dim rides BroadcastExchange; no
    cartesian product anywhere. (The dropped-id set is deliberately NOT
    broadcast-hinted — it is O(N) at real drop rates; see the OOM rationale
    in operators/similarity.py — so this test asserts nothing about it.)"""
    plan = _plan(spark, "dedup_semantic")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def _frozen_history_dir(tmp_path, upto: int) -> str:
    """Copy only CORRECTNESS_r01..r{upto} into a tmpdir so a seating pin
    replays the history it claims to pin — hermetic to later driver
    deposits (the r9 defect: the live-read pin broke the moment the
    driver's own CORRECTNESS_r09.json landed in the graded worktree)."""
    import glob
    import os
    import re
    import shutil

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m and int(m.group(1)) <= upto:
            shutil.copy(p, tmp_path)
    return str(tmp_path)


def _wave_names(module_name: str) -> set:
    from brontes_spark.plans.registry import REGISTRY

    return {
        n for n, s in REGISTRY.items() if s.build.__module__ == module_name
    }


def _promoted_after(round_no: int) -> set:
    """Gates registered by a promotion wave LATER than ``round_no`` (module
    plans.waveN with N > round_no). A seating pin replays the registry as
    it stood at its round, so later waves — which sort at staleness -1
    under any frozen history — must be excluded, and the rule must keep
    excluding wave11, wave12, ... without edits to the older pins."""
    import re

    from brontes_spark.plans.registry import REGISTRY

    out = set()
    for n, s in REGISTRY.items():
        m = re.match(r"brontes_spark\.plans\.wave(\d+)$", s.build.__module__)
        if m and int(m.group(1)) > round_no:
            out.add(n)
    return out


def test_r9_window_seating(tmp_path):
    """The r9 promotion playbook's window math, replayed against a FROZEN
    copy of the r01..r08 driver history: the 50-slot window at r9 start
    seats exactly the 29 wave9-promoted gates (no driver history ->
    staleness -1) plus the 21 r6-deferred re-attestations the r8 plan
    promised would return. Gates registered AFTER r9 (wave10) are excluded
    from the replay — they did not exist when this window was computed —
    so the pin stays green as the registry and the live history grow."""
    from brontes_spark.plans.registry import _ordered
    from brontes_spark.plans import wave9  # noqa: F401 (registration)

    promoted = {
        "dedup_fuzzy_lsh_verified", "txt_url_psl_domain", "txt_bm25_topk",
        "sketch_hll_distinct", "x16_interval_join", "emb_gram_matrix",
        "txt_script_profile", "dedup_jaccard_join_exact",
        "sketch_kmv_containment", "g7_pagerank", "o8_zorder_index",
        "o9_table_profile", "txt_gopher_rules", "x17_salted_join",
        "sketch_percentiles_cont", "o10_scd2_history", "corpus_tv_drift",
        "g8_triangle_count", "txt_pmi_cooccur", "dedup_snm_pairs",
        "ev_markov_transitions", "x18_twap", "sample_stratified_n",
        "o11_skyline", "corpus_temperature_mix", "g9_kcore",
        "txt_bpe_pair_stats", "x19_ols_trend", "ev_attribution_linear",
    }
    r6_deferred = {
        "x6_optimistic_vwap", "x1_asof_join", "x4_expanding_vwap",
        "s3_grid_downsample", "s4_volume_rank", "c9_window_dedup",
        "c11_group_stats", "i14_outlier_discovery", "i15_rolling_window",
        "txt_boilerplate_score", "q6_forecast_revenue", "q8_market_share",
        "q11_important_stock", "q13_order_count_distribution",
        "q15_top_supplier", "q19_disjunctive_revenue",
        "q20_majority_supplier", "t1_filter_project", "t6_anti_join",
        "t8_exists_semijoin", "c2_classified_actions",
    }
    assert len(promoted) == 29 and len(r6_deferred) == 21
    ordered = _ordered(root=_frozen_history_dir(tmp_path, upto=8))
    post_r9 = _promoted_after(9)
    window = set([n for n in ordered if n not in post_r9][:50])
    assert window == promoted | r6_deferred, (
        f"ejected: {sorted((promoted | r6_deferred) - window)}; "
        f"intruders: {sorted(window - (promoted | r6_deferred))}"
    )


def test_r10_window_seating(tmp_path):
    """The r10 promotion's window math, replayed against a FROZEN copy of
    the r01..r09 driver history: the 50-slot window seats all 43
    wave10-promoted gates (staleness -1) plus the 7 stalest r7-attested
    re-attestations the r9 VERDICT pre-verified (mm_mp2_features, the five
    mev_* composer gates, x2_most_liquid_quote). Gates staged after r10
    (plans/pending.py) are excluded — they are not registered, and their
    promotion wave will pin its own window against its own frozen
    history."""
    from brontes_spark.plans.registry import _ordered

    promoted = _wave_names("brontes_spark.plans.wave10")
    assert len(promoted) == 43
    reattest = {
        "mm_mp2_features",
        "mev_composer_bundles",
        "mev_block_headers",
        "mev_block_analysis",
        "mev_block_analysis_wide",
        "mev_searcher_stats",
        "x2_most_liquid_quote",
    }
    ordered = _ordered(root=_frozen_history_dir(tmp_path, upto=9))
    window = set([n for n in ordered if n not in _promoted_after(10)][:50])
    assert window == promoted | reattest, (
        f"ejected: {sorted((promoted | reattest) - window)}; "
        f"intruders: {sorted(window - (promoted | reattest))}"
    )


#: the 38 re-attestation seats of the r11 window (with the 12 wave11
#: promotions at staleness -1) — derived by scripts/simulate_r11.py from
#: the real r01..r10 history, pinned by test_r11_window_seating against a
#: frozen copy, and checked against the driver's REALIZED r11 deposit by
#: test_r11_realized_window_matches_prediction (VERDICT r10 directive 5).
R11_REATTEST = {
    "x3_fee_adjusted_quote", "dedup_incremental_lsh",
    "dedup_keep_canonical", "ann_lsh_buckets", "ann_ivf_topk",
    "ann_cosine_topk", "dedup_embedding_cosine", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "a1_delta_accounting", "a7_overlap_dedup",
    "i1_sandwich_pairs", "i6_sequence_classify", "o4_daily_rollup",
    "o5_wide_rollup", "x8_sessionize", "q1_pricing_summary",
    "q2_min_cost_supplier", "q3_top_urgent", "q4_priority_ontime",
    "q5_region_revenue", "q7_nation_volume", "q9_product_profit",
    "q10_returned_items", "q12_priority_pivot", "q14_promo_share",
    "q16_supplier_variety", "q17_small_quantity_revenue",
    "q18_big_orders", "q21_waiting_supplier",
    "q22_global_sales_opportunity", "txt_pack_sequences",
    "corpus_mixture_sample", "txt_repetition_score", "txt_pii_scrub",
    "txt_decontaminate", "dedup_simhash_pairs_wide", "x4_decay_vwap",
}


def test_r11_window_seating(tmp_path):
    """The r11 promotion's window math, replayed against a FROZEN copy of
    the r01..r10 driver history. R11 is the LOW_FREQ activation round
    (this_round = 11 == LOW_FREQ_START), so this pin exercises the policy
    the r10 grade-time break proved untested: the 50-slot window seats all
    12 wave11-promoted gates (staleness -1) plus the 38 stalest
    DATA-BACKED re-attestations — the lg=7, change-round-7 block at
    effective staleness 6.5 (x3_fee_adjusted_quote, the dedup/ANN r7
    cohort, the 22 r7-reattested relational/accounting gates, and
    x4_decay_vwap, whose ambiguous change-round word keeps it OFF the
    low-freq cadence by design). The fixture-pinned LOW_FREQ gates ride
    their +2 boost and correctly queue behind (x6_decay_vwap leads the
    ride-to-r12 queue). The membership set is asserted exactly;
    scripts/simulate_r11.py prints the same derivation with per-seat
    staleness."""
    from brontes_spark.plans.registry import (
        LOW_FREQ,
        LOW_FREQ_START,
        _driver_history,
        _ordered,
        _this_round,
    )

    promoted = _wave_names("brontes_spark.plans.wave11")
    assert len(promoted) == 12
    root = _frozen_history_dir(tmp_path, upto=10)
    assert _this_round(_driver_history(root)) == LOW_FREQ_START  # activation
    ordered = [n for n in _ordered(root=root) if n not in _promoted_after(11)]
    window, queue = ordered[:50], ordered[50:]
    reattest = R11_REATTEST
    assert len(reattest) == 38
    assert set(window) == promoted | reattest, (
        f"ejected: {sorted((promoted | reattest) - set(window))}; "
        f"intruders: {sorted(set(window) - (promoted | reattest))}"
    )
    # the decay twins are both LOW_FREQ but both carry the ambiguous
    # lg == change-round word, which blocks the boost by design (an edited
    # fixture gate must still re-enter the window); they straddle the
    # 50-slot boundary on the registration-order tie-break, so x6 leads
    # the ride-to-r12 queue at the same 6.5 staleness
    assert "x4_decay_vwap" in LOW_FREQ and "x6_decay_vwap" in LOW_FREQ
    assert queue[0] == "x6_decay_vwap"


def test_r11_realized_window_matches_prediction():
    """VERDICT r10 directive 5: r11 is the LOW_FREQ activation round, so
    its REALIZED driver window must equal the forward simulation's
    prediction (the frozen-history seating pin's 50-gate set). Skips
    while no CORRECTNESS_r11.json exists (mid-round, pre-deposit); at
    grade time — and under scripts/grade_sim.py's synthesized deposit —
    the file exists and the realized key set is checked against the
    FROZEN expectation. Unlike the retired live-history test class, the
    expectation here is a pinned constant, not a live recomputation, so
    the deposit this test reads is exactly the artifact it validates."""
    import json
    import os

    import pytest

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "CORRECTNESS_r11.json")
    if not os.path.exists(path):
        pytest.skip("driver has not deposited CORRECTNESS_r11.json yet")
    with open(path) as f:
        realized = set(json.load(f))
    predicted = _wave_names("brontes_spark.plans.wave11") | R11_REATTEST
    assert realized == predicted, (
        f"unexpected: {sorted(realized - predicted)}; "
        f"missing: {sorted(predicted - realized)}"
    )
