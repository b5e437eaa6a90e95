"""Gate-change fingerprints (plans/fingerprints.py): the driver checks only
the first 50 registry entries per round, so a changed-but-unrefreshed gate
must sort risk-first automatically. These tests pin (a) the store file is
current with the code, (b) the dependency closure sees through module-level
imports (the exact round-3 `norm_text` -> `txt_fingerprint` miss), and
(c) a doctored gate jumps into the driver window.
"""

import json

import brontes_spark.plans  # noqa: F401  (populate REGISTRY)
from brontes_spark.plans import fingerprints, registry


def test_store_file_is_current():
    """GATE_FINGERPRINTS.json must match the live code. If this fails, run
    `python -m brontes_spark.plans.fingerprints --update` and commit."""
    stored = fingerprints.load_stored()
    live = fingerprints.compute_all()
    assert set(stored) == set(live), "gate set drifted — refresh the store"
    stale = [n for n in live if stored[n]["fp"] != live[n]]
    assert stale == [], f"stale fingerprints {stale} — refresh the store"


def test_closure_sees_through_helper_imports():
    """txt_fingerprint's builder lives in plans/llm_data.py but depends on
    functions/text.py (norm_text) — the module whose round-3 change the
    manual FORCE_RECHECK map missed. The closure must include it."""
    spec = registry.REGISTRY["txt_fingerprint"]
    closure = fingerprints._module_closure(spec.build.__module__)
    assert "brontes_spark.functions.text" in closure
    # the ordering-policy modules are excluded by design: editing them must
    # not flip every gate's fingerprint
    assert "brontes_spark.plans.registry" not in closure
    assert "brontes_spark.plans.fingerprints" not in closure


def test_dependency_edit_changes_fingerprint(monkeypatch):
    base = fingerprints.compute_all()["txt_fingerprint"]
    doctored = dict(fingerprints._source_cache)
    doctored["brontes_spark.functions.text"] = doctored.get(
        "brontes_spark.functions.text", ""
    ) + "\n# doctored"
    monkeypatch.setattr(fingerprints, "_source_cache", doctored)
    assert fingerprints.compute_all()["txt_fingerprint"] != base


def test_refresh_stamps_changed_gate_with_current_round(tmp_path):
    store = tmp_path / "fps.json"
    fingerprints.refresh(path=str(store), write=True)
    data = json.loads(store.read_text())
    assert all(v["round"] == -1 for v in data.values())  # initial seed
    # doctor one gate's stored fp -> next refresh stamps it changed-now
    data["q2_min_cost_supplier"]["fp"] = "0" * 32
    store.write_text(json.dumps(data))
    out = fingerprints.refresh(path=str(store), write=False)
    assert out["q2_min_cost_supplier"]["round"] == fingerprints.current_round()
    assert out["q1_pricing_summary"]["round"] == -1  # untouched carries over


def test_doctored_gate_jumps_the_driver_window(monkeypatch):
    """A gate with a green driver row whose fingerprint then changes must
    re-enter the front of the window, ahead of green-history gates."""
    victim = "q2_min_cost_supplier"
    ordered_before = registry._ordered()
    assert ordered_before.index(victim) >= 20  # rides its green history today

    monkeypatch.setattr(
        fingerprints, "change_rounds", lambda path=fingerprints.STORE_PATH: {victim: 99}
    )
    ordered_after = registry._ordered()
    assert ordered_after.index(victim) < 25  # sorted with the never-verified head
    assert ordered_after.index(victim) < ordered_after.index("q1_pricing_summary")


def test_r4_window_contains_all_rotated_gates():
    """Directive r3#2: the 20 gates without a round-3 driver row must all be
    inside the 50-entry window this round."""
    rotated = {
        "txt_fingerprint", "q11_important_stock", "q15_top_supplier",
        "q19_disjunctive_revenue", "q8_market_share", "q20_majority_supplier",
        "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_exact",
        "dedup_simhash", "txt_quality_score", "txt_lang_id", "txt_token_count",
        "sample_stratified", "corpus_select", "t1_filter_project",
        "q6_forecast_revenue", "t8_exists_semijoin", "t6_anti_join",
        "q13_order_count_distribution",
    }
    window = set(registry._ordered()[:50])
    assert rotated <= window, f"missing from window: {rotated - window}"
