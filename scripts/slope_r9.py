"""Round-9 slope measurements, reproducible (the numbers recorded in
SCALE.md's round-9 sections): x24's shared-pass cut computation and the
second-wave gates at 100x events (.scale_sf10 from
scripts/make_sf10_events.py). Min-of-2 on a quiet local[32] box.

    python scripts/slope_r9.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from brontes_spark.plans.pending import PENDING  # noqa: E402
from brontes_spark.plans.registry import REGISTRY  # noqa: E402
from brontes_spark.session import get_spark  # noqa: E402

QUERIES = [
    "x24_rfm_segments",
    "o25_welch_ttest",
    "o26_anova_oneway",
    "o27_two_proportion_z",
    "x28_pit_join",
    "x29_theil_sen",
]


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf10 = os.path.join(here, ".scale_sf10")
    spark = get_spark("slope-r9")
    spark.sparkContext.setLogLevel("ERROR")
    for name in QUERIES:
        spec = PENDING.get(name) or REGISTRY[name]
        for sf_dir in ("/root/testdata/sf0.1", sf10):
            if not os.path.isdir(sf_dir):
                print(json.dumps({"query": name, "sf_dir": sf_dir, "skipped": True}))
                continue
            samples = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                rows = spec.build(spark, sf_dir).count()
                samples.append(round(time.time() - t0, 2))
            print(json.dumps({
                "query": name, "sf_dir": sf_dir, "rows": rows,
                "min_s": min(samples), "samples": sorted(samples),
            }))
    spark.stop()


if __name__ == "__main__":
    main()
