"""Round-11 slope measurements, reproducible (the numbers recorded in
SCALE.md's round-11 section): the four new r12-tier staged gates at 10x
(sf0.01 -> sf0.1) and 100x (the tiled-events fixture from
scripts/make_sf10_events.py), plus the k-truss DEGREE-BOUNDED slope
VERDICT r10 directive 4 demanded: the g17 gate's planted fixture grows
its center clique quadratically with the document count, so sweeping it
over tiled docs measures the fixture, not the operator — here a
synthetic community graph holds max degree CONSTANT (~50) while edge
count scales 100x, so the wall ratio is the operator's.

Community graph: B blocks of 50 nodes; per block a chain (49 edges), a
hub star to the block center (49 edges, hub degree 49 independent of
B), and a K8 clique among the first 8 nodes (28 edges, degree 7). At
k=4 the chain/star mass peels in the first rounds and exactly the 28*B
clique edges survive — same peel depth at every B, so rounds are
constant and wall growth isolates the per-round wedge join + count.

    python scripts/slope_r11.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from brontes_spark.plans.pending import PENDING  # noqa: E402
from brontes_spark.plans.registry import REGISTRY  # noqa: E402
from brontes_spark.session import get_spark  # noqa: E402

QUERIES = [
    "ml_pr_auc",
    "ml_report_avg",
    "ml_ndcg",
    "sample_class_balanced",
    "ml_mcnemar",
    "o30_weighted_percentiles",
]

BLOCK = 50
CLIQUE = 8


def community_edges(spark, n_blocks: int):
    ids = spark.range(n_blocks * BLOCK).select(F.col("id").alias("i"))
    pos = F.col("i") % BLOCK
    base = (F.col("i") / BLOCK).cast("long") * BLOCK
    chain = ids.filter(pos != BLOCK - 1).select(
        F.col("i").alias("src"), (F.col("i") + 1).alias("dst")
    )
    star = ids.filter(pos != 0).select(
        F.col("i").alias("src"), base.alias("dst")
    )
    cl = ids.filter(pos < CLIQUE).select("i", base.alias("b"))
    clique = (
        cl.alias("a")
        .join(cl.alias("c"), F.col("a.b") == F.col("c.b"))
        .filter(F.col("a.i") < F.col("c.i"))
        .select(F.col("a.i").alias("src"), F.col("c.i").alias("dst"))
    )
    return chain.unionAll(star).unionAll(clique)


def ktruss_sweep(spark) -> None:
    from brontes_spark.operators.ktruss import k_truss

    for n_blocks in (200, 2_000, 20_000):
        edges = community_edges(spark, n_blocks)
        samples = []
        rows = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            rows = k_truss(edges, k=4, rounds=3).count()
            samples.append(round(time.time() - t0, 2))
        assert rows == 28 * n_blocks, (rows, n_blocks)  # exactly the cliques
        print(json.dumps({
            "query": "ktruss_community", "n_blocks": n_blocks,
            "n_edges": n_blocks * 126, "surviving": rows,
            "min_s": min(samples), "samples": sorted(samples),
        }))


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf10 = os.path.join(here, ".scale_sf10")
    spark = get_spark("slope-r11")
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
    ktruss_sweep(spark)
    spark.stop()


if __name__ == "__main__":
    main()
