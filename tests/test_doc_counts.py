"""Doc-count drift guard (ADVICE r7 item 1's suggestion made permanent):
the gate counts quoted in README.md and COVERAGE.md must match the live
REGISTRY / PENDING sizes, and the two registries must never collide."""

from __future__ import annotations

import os
import re

import brontes_spark.plans  # noqa: F401  (populate REGISTRY)
from brontes_spark.plans.pending import PENDING
from brontes_spark.plans.registry import REGISTRY

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name):
    with open(os.path.join(ROOT, name), encoding="utf-8") as f:
        return f.read()


def test_registry_and_pending_disjoint():
    assert not (REGISTRY.keys() & PENDING.keys())


def test_readme_quotes_live_counts():
    md = _read("README.md")
    m = re.search(r"\*\*(\d+) driver-checked queries\*\*", md)
    assert m, "README must quote the registry size"
    assert int(m.group(1)) == len(REGISTRY)
    m = re.search(r"plus (\d+) round-\d+ staged gates", md)
    assert m, "README must quote the staged-gate count"
    assert int(m.group(1)) == len(PENDING)


def test_coverage_staged_list_matches_pending():
    md = _read("COVERAGE.md")
    m = re.search(
        r"staged gates awaiting (?:r\d+ )?promotion \((\d+) —", md
    )
    assert m, "COVERAGE must quote the staged-gate count"
    assert int(m.group(1)) == len(PENDING)
    # every staged gate is named in the doc
    for name in PENDING:
        assert name in md, f"staged gate {name} missing from COVERAGE.md"


def test_coverage_staged_labels_are_live():
    """Every "staged `gate`" evidence cell in COVERAGE.md must name a gate
    that is STILL in plans/pending.py — promotions must relabel their rows
    to 'registered (promoted rN)' (the doc-drift class the r8 verdict
    flagged twice, made structurally impossible)."""
    md = _read("COVERAGE.md")
    staged_mentions = set(re.findall(r"staged `([a-z0-9_]+)`", md))
    stale = staged_mentions - set(PENDING)
    assert not stale, f"COVERAGE says 'staged' for registered gates: {sorted(stale)}"


def test_readme_registry_count():
    md = _read("README.md")
    m = re.search(r"\*\*(\d+) driver-checked queries\*\*", md)
    assert m and int(m.group(1)) == len(REGISTRY)


def test_coverage_seating_claim_matches_live_computation(tmp_path):
    """VERDICT r9 directive 5 (header-drift class, closed structurally):
    the COVERAGE.md round-10 header's seating sentence — "<P> staged gates
    at r10 promotion + <R> stalest-r7 re-attestations" — must be DERIVED
    from the same frozen-history replay the seating pin uses, not
    hand-written (the r9 header said 42+8; the real numbers were 43+7)."""
    import glob
    import shutil

    from brontes_spark.plans.registry import _ordered

    md = _read("COVERAGE.md")
    m = re.search(
        r"(\d+) staged gates at r10 promotion \+ (\d+) stalest-r7\s+"
        r"re-attestations",
        md,
    )
    assert m, "COVERAGE round-10 header must state the seating numbers"
    doc_promoted, doc_reattest = int(m.group(1)), int(m.group(2))

    for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        mm = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if mm and int(mm.group(1)) <= 9:
            shutil.copy(p, tmp_path)
    wave10 = {
        n
        for n, s in REGISTRY.items()
        if s.build.__module__ == "brontes_spark.plans.wave10"
    }
    later = {
        n
        for n, s in REGISTRY.items()
        if (mm := re.match(r"brontes_spark\.plans\.wave(\d+)$", s.build.__module__))
        and int(mm.group(1)) > 10
    }
    window = [n for n in _ordered(root=str(tmp_path)) if n not in later][:50]
    assert doc_promoted == sum(1 for n in window if n in wave10)
    assert doc_reattest == sum(1 for n in window if n not in wave10)


def test_coverage_rotation_numbers_derived(tmp_path):
    """VERDICT r10 directive 5 (doc-drift class, closed structurally):
    the rotation-policy period means COVERAGE.md quotes for the current
    registry must be DERIVED from scripts/rotation_sim.py's own
    simulation over a FROZEN r01..r10 history — the r10 doc hand-quoted
    a fixture-tier mean (5.67) that had drifted to 5.76 by judge time.
    Frozen replay means the driver's r11+ deposits cannot move the
    numbers this test pins."""
    import glob
    import importlib.util
    import shutil
    import sys

    md = _read("COVERAGE.md")
    m = re.search(
        r"data-backed period mean \*\*(\d+\.\d+)\*\* rounds \(max (\d+)\),\s+"
        r"fixture-pinned mean \*\*(\d+\.\d+)\*\* \(max (\d+)",
        md,
    )
    assert m, "COVERAGE must quote the derived rotation period numbers"
    doc_hot_mean, doc_hot_max = float(m.group(1)), int(m.group(2))
    doc_low_mean, doc_low_max = float(m.group(3)), int(m.group(4))

    spec = importlib.util.spec_from_file_location(
        "rotation_sim", os.path.join(ROOT, "scripts", "rotation_sim.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["rotation_sim"] = mod
    spec.loader.exec_module(mod)

    for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        mm = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if mm and int(mm.group(1)) <= 10:
            shutil.copy(p, tmp_path)
    got = mod.simulate_periods(str(tmp_path), end=22)
    assert got["first_round"] == 11
    assert got["never"] == 0
    assert (round(got["hot"]["mean"], 2), got["hot"]["max"]) == (
        doc_hot_mean,
        doc_hot_max,
    )
    assert (round(got["low_freq"]["mean"], 2), got["low_freq"]["max"]) == (
        doc_low_mean,
        doc_low_max,
    )


def test_coverage_r11_seating_claim_matches_frozen_computation(tmp_path):
    """The Round-11 header's seating sentence — "12 staged gates at r11
    promotion + 38 stalest data-backed re-attestations" — derived from
    the same frozen r01..r10 replay the seating pin uses (the r10
    pattern, carried forward)."""
    import glob
    import shutil

    from brontes_spark.plans.registry import _ordered

    md = _read("COVERAGE.md")
    m = re.search(
        r"(\d+) staged gates at r11 promotion \+ (\d+) stalest data-backed\s+"
        r"re-attestations",
        md,
    )
    assert m, "COVERAGE round-11 header must state the seating numbers"
    doc_promoted, doc_reattest = int(m.group(1)), int(m.group(2))

    for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        mm = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if mm and int(mm.group(1)) <= 10:
            shutil.copy(p, tmp_path)
    wave11 = {
        n
        for n, s in REGISTRY.items()
        if s.build.__module__ == "brontes_spark.plans.wave11"
    }
    later = {
        n
        for n, s in REGISTRY.items()
        if (mm := re.match(r"brontes_spark\.plans\.wave(\d+)$", s.build.__module__))
        and int(mm.group(1)) > 11
    }
    window = [n for n in _ordered(root=str(tmp_path)) if n not in later][:50]
    assert doc_promoted == sum(1 for n in window if n in wave11)
    assert doc_reattest == sum(1 for n in window if n not in wave11)
