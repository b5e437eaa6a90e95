"""Derive the r11 driver-window seating from the REAL on-disk driver
history (the simulate_r10.py policy, carried forward: real
CORRECTNESS_r*.json files are authoritative wherever they exist; a round
is synthesized all-green ONLY when no file for it is on disk — forward
simulation of a round the driver has not run yet — over the window the
real ordering policy picks at that point. With r01..r10 real on disk,
no synthesis happens and the script prints the live r11 seating).

R11 is the LOW_FREQ activation round (registry.LOW_FREQ_START == 11):
fixture-pinned gates that are green and unchanged ride +LOW_FREQ_BONUS
effective staleness for the first time, so the 38 re-attestation seats
behind the 12 wave11 promotions go to the stalest DATA-BACKED cohort.

tests/test_plans.py::test_r11_window_seating pins the same math
hermetically (frozen history replay); this script is the runnable
inspection tool, printing staleness per seat and the ride-to-r12 queue.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import brontes_spark.plans  # noqa: F401  (populate REGISTRY)
from brontes_spark.plans import fingerprints
from brontes_spark.plans import registry as R

#: the round whose seating is being derived: one past the newest round the
#: driver has actually attested (with r10 real on disk this is 11 and
#: nothing is synthesized).
TARGET_ROUND = 11


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_disk: dict[int, str] = {}
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            on_disk[int(m.group(1))] = p

    tmp = tempfile.mkdtemp(prefix="sim_r11_")
    try:
        for rnd, p in on_disk.items():
            if rnd < TARGET_ROUND:
                shutil.copy(p, tmp)
        # synthesize ONLY absent rounds, in order, each over the window the
        # real ordering picks against the history accumulated so far
        for rnd in range(1, TARGET_ROUND):
            if rnd in on_disk:
                continue
            window = R._ordered(root=tmp)[:50]
            with open(os.path.join(tmp, f"CORRECTNESS_r{rnd:02d}.json"), "w") as f:
                json.dump(
                    {n: {"rows_match": True, "schema_match": True,
                         "hash_match": True, "err": None} for n in window},
                    f,
                )
            print(f"synthesized all-green r{rnd:02d} ({len(window)} gates; no file on disk)")
        history = R._driver_history(tmp)
        ordered = R._ordered(root=tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    changed = fingerprints.change_rounds_asof(TARGET_ROUND)

    def staleness(n: str) -> float:
        # the registry's OWN policy function (VERDICT r10 directive 1:
        # never hand-model staleness in tooling or tests)
        return R.effective_staleness(n, history, changed, TARGET_ROUND)

    promoted = {
        n for n, s in R.REGISTRY.items()
        if s.build.__module__ == "brontes_spark.plans.wave11"
    }
    window, queue = ordered[:50], ordered[50:]
    seated_promos = [n for n in window if n in promoted]
    reattest = [n for n in window if n not in promoted]
    print(f"wave11 promoted: {len(promoted)}; seated: {len(seated_promos)}")
    missing = sorted(promoted - set(seated_promos))
    print(f"promoted-but-ejected (MUST be empty for the r11 plan): {missing}")
    print(f"re-attestation seats: {len(reattest)}")
    for n in reattest:
        tag = " [low-freq]" if n in R.LOW_FREQ else ""
        print(f"  {staleness(n):6.2f}  {n}{tag}")
    print("first 10 of the ride-to-r12 queue:")
    for n in queue[:10]:
        tag = " [low-freq]" if n in R.LOW_FREQ else ""
        print(f"  {staleness(n):6.2f}  {n}{tag}")
    assert not missing, "r11 cannot seat every promoted gate — re-tier!"
    assert len(reattest) == 38, f"expected 38 re-attestation seats, got {len(reattest)}"


if __name__ == "__main__":
    main()
