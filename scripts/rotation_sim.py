"""Forward-simulate the driver-window rotation r10..r{END} to measure
re-attestation latency under the r10 rotation policy (VERDICT r9
directive 6): fixture-pinned gates (registry.LOW_FREQ) ride a slower
cadence (+LOW_FREQ_BONUS effective staleness once green and unchanged,
active from LOW_FREQ_START), freeing window slots for the data-backed
cohort. Run with --baseline to measure the no-policy rotation for
comparison.

Each simulated round: compute the 50-slot window with the REAL ordering
policy over the accumulated (real + synthesized) history, record an
all-green CORRECTNESS file for it, advance. Reports, per tier, the
distribution of gaps between consecutive attestations across the
simulated span (the steady-state re-attestation period).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import brontes_spark.plans  # noqa: F401  (populate REGISTRY)
from brontes_spark.plans import registry as R

END = 22  # simulate through r{END}


def main() -> None:
    if "--baseline" in sys.argv:
        R.LOW_FREQ_START = 10**9  # policy never activates
        label = "BASELINE (no low-freq tier)"
    else:
        label = (
            f"POLICY (|LOW_FREQ|={len(R.LOW_FREQ)}, bonus=+{R.LOW_FREQ_BONUS:g},"
            f" from r{R.LOW_FREQ_START})"
        )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    attested: dict[str, list[int]] = {n: [] for n in R.REGISTRY}
    tmp = tempfile.mkdtemp(prefix="rotation_sim_")
    try:
        last_real = 0
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
            if m:
                shutil.copy(p, tmp)
                last_real = max(last_real, int(m.group(1)))
        for rnd in range(last_real + 1, END + 1):
            window = R._ordered(root=tmp)[:50]
            for n in window:
                attested[n].append(rnd)
            with open(os.path.join(tmp, f"CORRECTNESS_r{rnd:02d}.json"), "w") as f:
                json.dump(
                    {n: {"rows_match": True, "schema_match": True,
                         "hash_match": True, "err": None} for n in window},
                    f,
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    def gaps(tier: set[str]) -> list[int]:
        out = []
        for n in tier:
            rounds = attested.get(n, [])
            out.extend(b - a for a, b in zip(rounds, rounds[1:]))
        return out

    hot = set(R.REGISTRY) - set(R.LOW_FREQ)
    print(label)
    for name, tier in (("data-backed (hot)", hot), ("fixture-pinned (low-freq)", set(R.LOW_FREQ) & set(R.REGISTRY))):
        g = gaps(tier)
        if not g:
            print(f"  {name}: no re-attestations in span")
            continue
        print(
            f"  {name}: n_gates={len(tier)} period mean={statistics.mean(g):.2f}"
            f" median={statistics.median(g):.0f} max={max(g)}"
        )
    never = sorted(n for n, rs in attested.items() if not rs)
    print(f"  gates never attested in simulated span: {len(never)}")


if __name__ == "__main__":
    main()
