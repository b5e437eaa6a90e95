"""Measured file-skipping benefit of z-order clustering (SCALE.md row).

Writes lineitem (sf0.1) as 64 parquet files three ways — unsorted,
range-sorted by l_orderkey, range-sorted by the z-interleave of
(l_orderkey, l_partkey) — then, for a 2-D box predicate (an orderkey range
AND a partkey range), counts how many FILES could contain matches from
their per-file min/max alone: exactly the pruning decision parquet
row-group stats + Spark's data-skipping make at scan time. Prints one
JSON line per layout."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from brontes_spark.operators.zorder import zorder_index
from brontes_spark.session import get_spark
from brontes_spark.sources.testdata import load_table

N_FILES = 64


def main() -> None:
    spark = get_spark("zorder-skip")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
                    "lineitem").select("l_orderkey", "l_partkey")
    lo_max = li.agg(F.max("l_orderkey")).collect()[0][0]
    lp_max = li.agg(F.max("l_partkey")).collect()[0][0]
    # a ~1/8 x 1/8 box in key space
    box = (lo_max // 2, lo_max // 2 + lo_max // 8,
           lp_max // 2, lp_max // 2 + lp_max // 8)

    layouts = {
        "unsorted": li.repartition(N_FILES),
        "sort_orderkey": li.repartitionByRange(N_FILES, "l_orderkey"),
        # zorder_index interleaves RAW bits, so the two dimensions must be
        # pre-normalized to a common scale (the operator's documented
        # contract: rank/bucket/truncated key) — interleaving a 2^18-range
        # key with a 2^15-range key leaves the top z-bits dominated by one
        # dimension and locality degrades to a single-key sort
        "zorder": li.select(
            "l_orderkey", "l_partkey",
            F.expr(f"(l_orderkey * 65536) div {lo_max + 1}").alias("_a"),
            F.expr(f"(l_partkey * 65536) div {lp_max + 1}").alias("_b"),
        )
        .withColumn("_z", zorder_index(["_a", "_b"], 16))
        .repartitionByRange(N_FILES, "_z")
        .select("l_orderkey", "l_partkey"),
    }
    base = tempfile.mkdtemp(prefix="zorder_skip_")
    try:
        for name, df in layouts.items():
            path = os.path.join(base, name)
            df.write.mode("overwrite").parquet(path)
            stats = (
                spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .agg(
                    F.min("l_orderkey").alias("o_min"), F.max("l_orderkey").alias("o_max"),
                    F.min("l_partkey").alias("p_min"), F.max("l_partkey").alias("p_max"),
                    F.count(F.lit(1)).alias("rows"),
                )
                .collect()
            )
            o_lo, o_hi, p_lo, p_hi = box
            cand_2d = sum(
                1 for r in stats
                if r.o_max >= o_lo and r.o_min <= o_hi
                and r.p_max >= p_lo and r.p_min <= p_hi
            )
            # the second dimension ALONE — where a single-key sort is
            # useless and z-order still prunes
            cand_partkey = sum(
                1 for r in stats if r.p_max >= p_lo and r.p_min <= p_hi
            )
            print(json.dumps({
                "layout": name, "files": len(stats),
                "candidate_files_2d_box": cand_2d,
                "candidate_files_partkey_only": cand_partkey,
            }))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
