"""Simulate the r10 driver-window seating (VERDICT r8 directive 4 carried
into r9's plan): synthesize an all-green CORRECTNESS_r09 for the 50 gates
the r9 window seats, hypothetically promote every r10-tier staged gate,
and run the REAL ordering policy (registry._ordered's staleness function,
including live fingerprint change-rounds) over the combined registry.

Prints the seated 50, the ejected re-attestation queue, and checks the
plan invariant: no r8-staged gate rides past r10 without a driver word.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import brontes_spark.plans  # noqa: F401  (populate REGISTRY)
from brontes_spark.plans import fingerprints
from brontes_spark.plans import registry as R
from brontes_spark.plans.pending import PENDING


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # r9's window = current _ordered()[:50] against the REAL history
    r9_window = [n for n in R._ordered()][:50]

    tmp = tempfile.mkdtemp(prefix="sim_r10_")
    try:
        for f in os.listdir(root):
            if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
                shutil.copy(os.path.join(root, f), tmp)
        with open(os.path.join(tmp, "CORRECTNESS_r09.json"), "w") as f:
            json.dump(
                {n: {"rows_match": True, "schema_match": True,
                     "hash_match": True, "err": None} for n in r9_window},
                f,
            )
        history = R._driver_history(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    changed = fingerprints.change_rounds()
    base = {n: i for i, n in enumerate(R.DRIVER_ORDER)}

    def staleness(n: str) -> float:
        lg = history.get(n, -1)
        forced = max(R.FORCE_RECHECK.get(n, -1), changed.get(n, -1))
        if lg == -1:
            return -1.0
        if lg < forced:
            return lg - 0.75
        if lg == forced:
            return lg - 0.5
        return float(lg)

    # hypothetical r10 registry = live registry + every pending gate
    names = [n for n in R.DRIVER_ORDER if n in R.REGISTRY]
    names += [n for n in R.REGISTRY if n not in base]
    names += sorted(PENDING)  # promoted at r10 start, no driver history
    ordered = sorted(names, key=lambda n: (staleness(n), base.get(n, len(base))))
    window, queue = ordered[:50], ordered[50:]

    promoted = sorted(PENDING)
    seated_promos = [n for n in window if n in PENDING]
    reattest = [n for n in window if n not in PENDING]
    print(f"pending promoted: {len(promoted)}; seated: {len(seated_promos)}")
    missing = sorted(set(promoted) - set(seated_promos))
    print(f"promoted-but-ejected (MUST be empty for the r9 plan): {missing}")
    print(f"re-attestation seats: {len(reattest)}")
    for n in reattest:
        print(f"  {staleness(n):6.2f}  {n}")
    print("first 10 of the ride-to-r11 queue:")
    for n in queue[:10]:
        print(f"  {staleness(n):6.2f}  {n}")
    assert not missing, "r10 cannot seat every staged gate — re-tier!"


if __name__ == "__main__":
    main()
