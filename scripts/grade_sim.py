"""Grade-state simulation guard (VERDICT r10 directive 1b — the
structural fix for three consecutive rounds of live-history test breaks:
r8 round-stamped assert, r9 seating pin, r10 window-jump invariant).

The judge grades a worktree in which the driver has ALREADY deposited
this round's artifacts — CORRECTNESS_r{N}.json over the predicted window
and BENCH_r{N}.json — so "pytest green at commit time" is not the bar;
"pytest green with next round's deposits on disk" is. This script
synthesizes exactly that state and runs the suite against it:

1. predict the next round N (one past the newest CORRECTNESS file) and
   its 50-gate window with the registry's own live ordering;
2. write an all-green CORRECTNESS_r{N}.json over that window plus a
   minimal BENCH_r{N}.json / BENCH_DETAIL_r{N}.json / BENCH_COMMON
   into the repo root (try/finally-removed);
3. run the full pytest suite (or a named subset) against that state.

Usage:
    python scripts/grade_sim.py              # synth state, full suite
    python scripts/grade_sim.py --fast       # synth state, the
                                             # history-sensitive modules
                                             # (fingerprints/plans/doc
                                             # counts) only
    python scripts/grade_sim.py --both       # baseline full suite first,
                                             # then synth-state full
                                             # suite (the directive's
                                             # literal done-bar)
Exit code 0 iff every requested run is green.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import brontes_spark.plans  # noqa: F401  (populate REGISTRY)
from brontes_spark.plans import registry as R

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAST_TARGETS = [
    "tests/test_fingerprints.py",
    "tests/test_plans.py",
    "tests/test_doc_counts.py",
]


def _next_round() -> int:
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def _pytest(targets: list[str]) -> int:
    cmd = [sys.executable, "-m", "pytest", *targets, "-q"]
    print(f"$ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, cwd=ROOT).returncode


def main() -> int:
    fast = "--fast" in sys.argv
    both = "--both" in sys.argv
    targets = FAST_TARGETS if fast else ["tests/"]

    if both:
        print("=== grade_sim: baseline run (no synthesized artifacts) ===")
        rc = _pytest(targets)
        if rc != 0:
            print("grade_sim: BASELINE RED — fix before simulating grade state")
            return rc

    nxt = _next_round()
    window = R._ordered()[:50]
    synth = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True,
            "err": None}
        for n in window
    }
    paths = {
        os.path.join(ROOT, f"CORRECTNESS_r{nxt:02d}.json"): json.dumps(synth),
        os.path.join(ROOT, f"BENCH_r{nxt:02d}.json"): json.dumps(
            {"metric": "headline_queries_total_wall", "value": 1.0,
             "unit": "sec", "queries": {}, "sf": 0.1,
             "synthetic": "grade_sim.py forward simulation"}
        ),
    }
    existing = [p for p in paths if os.path.exists(p)]
    if existing:
        print(f"grade_sim: refusing to overwrite real artifacts: {existing}")
        return 2

    print(f"=== grade_sim: synthesizing r{nxt:02d} deposits over the "
          f"predicted {len(window)}-gate window ===")
    try:
        for p, body in paths.items():
            with open(p, "w") as f:
                f.write(body)
        rc = _pytest(targets)
    finally:
        for p in paths:
            try:
                os.remove(p)
            except OSError:
                pass
    print(f"grade_sim: {'GREEN' if rc == 0 else 'RED'} under simulated "
          f"r{nxt:02d} grade state")
    return rc


if __name__ == "__main__":
    sys.exit(main())
