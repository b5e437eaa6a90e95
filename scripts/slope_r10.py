"""Round-10 slope measurements, reproducible (the numbers recorded in
SCALE.md's round-10 section): the six new r11-tier staged gates at 10x
(sf0.01 -> sf0.1) and, where the 100x tiled fixtures from
scripts/make_sf10_events.py / make_sf10.py exist, at 100x. Min-of-2 on
a quiet local[32] box.

    python scripts/slope_r10.py
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

#: gate -> the 100x fixture table it scales on (events-tiled fixtures lack
#: the other tables, so only gates reading events/documents run at 100x)
QUERIES = [
    "x30_kendall_tau",
    "o28_chi2_independence",
    "o29_concentration",
    "ml_mrr_eval",
    "ev_item_cooccur",
    "g16_linkpred",
    "ml_auc",
    "ml_confusion",
    "ml_kappa",
    "ml_calibration",
]


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf10 = os.path.join(here, ".scale_sf10")
    spark = get_spark("slope-r10")
    spark.sparkContext.setLogLevel("ERROR")
    for name in QUERIES:
        spec = PENDING.get(name) or REGISTRY[name]
        for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1", sf10):
            if not os.path.isdir(sf_dir):
                print(json.dumps({"query": name, "sf_dir": sf_dir, "skipped": True}))
                continue
            samples = []
            try:
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    rows = spec.build(spark, sf_dir).count()
                    samples.append(round(time.time() - t0, 2))
            except Exception as e:  # 100x fixture may lack a table
                print(json.dumps({"query": name, "sf_dir": sf_dir,
                                  "error": repr(e)[:120]}))
                continue
            print(json.dumps({
                "query": name, "sf_dir": sf_dir, "rows": rows,
                "min_s": min(samples), "samples": sorted(samples),
            }))
    spark.stop()


if __name__ == "__main__":
    main()
