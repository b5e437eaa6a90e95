"""Pin the _NP_KERNEL_MIN_K=64 dispatch boundary with a K×N grid
(VERDICT r11 directive 7): time the NumPy mapInPandas kernel arm vs the
relational broadcast-NLJ+window arm of the top-1 centroid assignment at
K in {16, 32, 64, 128} for TWO vector counts (the base embeddings table
and the 10x bench tile), min-of-3 per cell, same session, clearCache
between samples. Usage: python scripts/kernel_boundary_r12.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import _tiled_embeddings
    from brontes_spark.operators.similarity import (
        _flat_top1_relational,
        _np_top1_assign,
        _seeded_centroids,
        _uvectors,
    )
    from brontes_spark.plans.llm_data import load_table
    from brontes_spark.session import get_spark

    spark = get_spark("kernel-boundary", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    geoms = {
        "base": load_table(spark, SF, "embeddings"),
        "tiled10x": _tiled_embeddings(spark, SF),
    }
    print(f"{'geom':10s} {'N':>7s} {'K':>4s} {'np_kernel':>10s} {'relational':>11s} winner")
    for gname, emb in geoms.items():
        uv = _uvectors(emb, "vec_id", "embedding").localCheckpoint()
        n = uv.count()
        for k in (16, 32, 64, 128):
            cents = _seeded_centroids(uv, k).localCheckpoint()
            cents.count()
            res = {}
            for arm, fn in (("np", _np_top1_assign), ("rel", _flat_top1_relational)):
                best = float("inf")
                for _ in range(3):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    fn(uv, cents).count()
                    best = min(best, time.time() - t0)
                res[arm] = best
            win = "np" if res["np"] < res["rel"] else "rel"
            print(f"{gname:10s} {n:7d} {k:4d} {res['np']:10.3f} {res['rel']:11.3f} {win}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
