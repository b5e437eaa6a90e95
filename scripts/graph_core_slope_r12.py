"""Core-scaling slope for the iterative-graph gates at a compute-dominant
geometry (VERDICT r11 directive 5): the r11 scaling block read core-ratios
~1.0 for g12/g13 at sf0.1 and ASSERTED "scheduling floor"; this measures
it. The same bfs/sssp operators run on a TILED trade graph (the sf0.1
graph replicated `copies`x with disjoint node-id namespaces, plus sparse
cross-tile bridge edges so the graph is connected and frontiers span
tiles), fixed 3 rounds, at the core count given by $SPARK_GRAFT_CPUS.
Run once with 32 and once with 8; commit the ratio rows to SCALE.md.

Usage: SPARK_GRAFT_CPUS=32 python scripts/graph_core_slope_r12.py [copies]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _tiled_graph(spark, copies: int):
    """The g12/g13 trade graph replicated copies x: node ids prefixed per
    tile (t<k>:), plus one bridge edge per (tile, tile+1) pair so the
    result is a single graph, not `copies` independent ones."""
    from brontes_spark.sources.testdata import load_table

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("s"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("t"),
        )
        .distinct()
    )
    cp = spark.range(copies).select(F.col("id").cast("int").alias("copy"))
    tiled = (
        pairs.crossJoin(F.broadcast(cp))
        .repartition(int(spark.sparkContext.defaultParallelism))
        .select(
            F.concat(F.lit("t"), F.col("copy"), F.lit(":"), F.col("s")).alias("s"),
            F.concat(F.lit("t"), F.col("copy"), F.lit(":"), F.col("t")).alias("t"),
        )
    )
    bridges = cp.filter(F.col("copy") > 0).select(
        F.concat(F.lit("t"), F.col("copy") - 1, F.lit(":s10")).alias("s"),
        F.concat(F.lit("t"), F.col("copy"), F.lit(":s10")).alias("t"),
    )
    base = tiled.unionAll(bridges)
    edges = base.unionAll(base.select(F.col("t").alias("s"), F.col("s").alias("t")))
    seeds = (
        load_table(spark, SF, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select(F.concat(F.lit("t0:s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    return edges, seeds


def main() -> None:
    from brontes_spark.operators.bfs import bfs_nearest_seed, sssp_bellman_ford
    from brontes_spark.session import get_spark

    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("graph-core-slope", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    edges, seeds = _tiled_graph(spark, copies)
    wedges = edges.withColumn(
        "w", (F.xxhash64("s", "t") % 100 + 100).cast("long")
    )

    runs = {
        "g12_bfs_tiled": lambda: bfs_nearest_seed(edges, seeds, rounds=3),
        "g13_sssp_tiled": lambda: sssp_bellman_ford(wedges, seeds, rounds=3),
    }
    for name, fn in runs.items():
        best = float("inf")
        for i in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn().count()
            dt = time.time() - t0
            best = min(best, dt)
            print(f"{name} cpus={cpus} copies={copies} run{i}: {dt:.2f}s rows={n}",
                  flush=True)
        print(f"{name} cpus={cpus} copies={copies} MIN {best:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
