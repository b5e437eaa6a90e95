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
