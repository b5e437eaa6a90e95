"""10x scale slopes for the round-8 third-wave families (triangle
counting, PMI co-occurrence, sorted-neighborhood dedup) — sf0.1 vs the
tiled sf1 set (scripts/make_sf1.py output at .scale_sf1). One JSON line
per (query, sf) pair for SCALE.md. Min-of-3 on a quiet box."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from brontes_spark.plans.pending import PENDING
from brontes_spark.plans.registry import REGISTRY  # promoted gates resolve here
from brontes_spark.session import get_spark

QUERIES = [
    "g8_triangle_count",
    "txt_pmi_cooccur",
    "dedup_snm_pairs",
]


def main() -> None:
    spark = get_spark("slope-r8b")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scale_sf1")
    for sf_dir in ("/root/testdata/sf0.1", sf1):
        if not os.path.isdir(sf_dir):
            print(json.dumps({"sf_dir": sf_dir, "skipped": "not on disk"}))
            continue
        for name in QUERIES:
            best, rows = 1e9, 0
            for _ in range(3):
                spark.catalog.clearCache()
                t = time.time()
                rows = (PENDING.get(name) or REGISTRY[name]).build(spark, sf_dir).count()
                best = min(best, time.time() - t)
            print(json.dumps(
                {"query": name, "sf_dir": sf_dir, "rows": rows,
                 "sec": round(best, 2)}
            ))
    spark.stop()


if __name__ == "__main__":
    main()
