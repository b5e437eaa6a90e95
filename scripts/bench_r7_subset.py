"""Quiet-session re-measure of the r7 common bench set (VERDICT r8
directive 3 / "what's wrong" #2): the r8 headline ran 110 queries + four
k320 ANN twins in ONE JVM and the 48 shared rows came out 1.22x slower
than r7 (34.27s vs 28.16s; worst x1_asof_join 1.78x, dedup_minhash_lsh
1.75x, x4_expanding_vwap 1.71x). Hypothesis: session heap/GC pressure,
not code regressions — none of the worst rows' reached code changed in
r8 (symbol fingerprints flipped neither x1/x4 nor dedup_minhash_lsh).

This script reruns EXACTLY the r7-common rows (the 48 shared queries),
alone, same protocol as bench.py (5 runs, min + median + noise), and
prints the r7/r8/now three-way per row. Run on an otherwise idle box:

    python scripts/bench_r7_subset.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from brontes_spark.plans import queries  # noqa: E402
from brontes_spark.session import get_spark  # noqa: E402


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d7 = json.load(open(os.path.join(here, "BENCH_DETAIL_r07.json")))
    d8 = json.load(open(os.path.join(here, "BENCH_DETAIL_r08.json")))
    common = [k for k in d7["queries"] if k in d8["queries"]]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("brontes-spark-bench-r7subset")
    spark.sparkContext.setLogLevel("ERROR")
    q = {**queries(), **bench.EXTRA}

    q["q1_pricing_summary"](spark, sf_dir).count()
    q["o4_daily_rollup"](spark, sf_dir).count()
    q["txt_token_count"](spark, sf_dir).count()
    q["ann_lsh_buckets"](spark, sf_dir).count()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    now: dict[str, float] = {}
    noise: dict[str, float] = {}
    for name in common:
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            q[name](spark, sf_dir).count()
            samples.append(time.time() - t0)
        samples.sort()
        now[name] = round(samples[0], 3)
        noise[name] = round(statistics.median(samples) / samples[0], 2)

    rows = []
    for k in common:
        r7, r8 = d7["queries"][k], d8["queries"][k]
        rows.append((k, r7, r8, now[k], round(now[k] / r7, 2), noise[k]))
    rows.sort(key=lambda r: r[4], reverse=True)
    print(f"{'query':34s} {'r7':>7s} {'r8':>7s} {'now':>7s} {'now/r7':>7s} {'noise':>6s}")
    for k, r7, r8, nw, ratio, nz in rows:
        print(f"{k:34s} {r7:7.3f} {r8:7.3f} {nw:7.3f} {ratio:7.2f} {nz:6.2f}")
    t7 = sum(d7["queries"][k] for k in common)
    t8 = sum(d8["queries"][k] for k in common)
    tn = sum(now.values())
    print(json.dumps({
        "metric": "r7_common_subset_quiet_rerun",
        "n_queries": len(common),
        "r7_total": round(t7, 2),
        "r8_total": round(t8, 2),
        "now_total": round(tn, 2),
        "now_over_r7": round(tn / t7, 3),
        "runs": runs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
