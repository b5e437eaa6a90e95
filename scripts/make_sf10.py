"""Materialize an sf10-scale DOCUMENTS table (100x sf0.1, ~500k docs /
~1.7 GB text) for the VERDICT r7 directive-8 cliff check: the token-explode
family (tfidf / frequent_items / quantiles) is near-linear at 10x; one
100x point confirms no memory/spill cliff hides above sf1.

Same tiling semantics as scripts/make_sf1.py — doc_id offset per copy so
key cardinality scales, text through a per-copy Caesar cipher so token
vocabulary and dedup structure reflect corpus growth rather than 100-way
cloning (copy i and copy j share no shingles unless the base text did).
Only `documents` is written: the directive's family reads nothing else.

Output: /root/repo/.scale_sf10/documents.parquet (gitignored), 64
partitions so a local[32] run gets 2 waves of ~27 MB input splits —
the partition-sizing note SCALE.md records.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale_sf10")
COPIES = 100
OFF = 10_000_000

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("make-sf10")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("_copy"))
    # rotation index cycles the 26 Caesar shifts across the 100 copies
    shift = (F.col("_copy") % 26).cast("int")
    rotations = F.array(*[
        F.lit((ALPHA[i:] + ALPHA[:i]) + (ALPHA[i:] + ALPHA[:i]).upper())
        for i in range(26)
    ])
    tiled = (
        docs.crossJoin(F.broadcast(copies))
        .withColumn("_rot", F.element_at(rotations, shift + 1))
        .select(
            (F.col("doc_id") + F.col("_copy").cast("long") * OFF).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            # translate accepts non-foldable from/to expressions (verified);
            # _rot is this copy's cycled Caesar alphabet
            F.expr(f"translate(text, '{ALPHA + ALPHA.upper()}', _rot)").alias("text"),
        )
    )
    tiled.repartition(64).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")
    n = spark.read.parquet(f"{OUT}/documents.parquet").count()
    print(f"wrote {OUT}/documents.parquet: {n} docs")
    spark.stop()


if __name__ == "__main__":
    main()
