"""10x scale slopes for the round-8 fifth-wave families (CUSUM, BFS,
chi2 features, k-anonymity, Benford, NB train, RFM) — sf0.1 vs the tiled
sf1 set (scripts/make_sf1.py output at .scale_sf1). One JSON line per
(query, sf) pair for SCALE.md. Min-of-3 on a quiet box."""

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
    "x23_cusum",
    "g12_bfs_hops",
    "txt_chi2_features",
    "o15_k_anonymity",
    "o16_benford",
    "txt_nb_train",
    "x24_rfm_segments",
    "x25_autocorr",
    "o17_compaction_plan",
    "o18_assoc_rules",
    "o19_pareto",
    "g13_sssp_weighted",
    "o20_skew_profile",
    "txt_readability",
    "g14_ppr",
    "o21_corr_matrix",
    "o22_mann_whitney",
    "o23_ks_test",
    "o24_spearman",
    "ev_json_extract",
    "x26_seasonality",
    "x27_quantile_normalize",
    "ml_fold_assign",
]


def main() -> None:
    spark = get_spark("slope-r8d")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_sf1",
    )
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
