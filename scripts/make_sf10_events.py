"""Materialize an sf10-scale EVENTS table (100x sf0.1, ~10M rows) for the
fifth-wave cliff check: the ordered-window family (CUSUM, autocorr, RFM)
is flat at 10x; one 100x point confirms the single-exchange designs hit
no sort/spill cliff when per-key series and key counts both grow.

Tiling: user_id offset per copy (key cardinality scales 100x: 15k ->
1.5M keys), ts offset by one hour per copy in exact microseconds (the source
column is timestamp[us]; series stay totally ordered within a key),
event_id offset keeps the tiebreak unique. value is copied verbatim — the cents distribution is what the
detectors consume and it must not drift with the tiling.

Output: /root/repo/.scale_sf10/events.parquet (gitignored), 64
partitions (~2 waves of input splits on local[32]).
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
UOFF = 1_000_000
EOFF = 100_000_000
HOUR_US = 3_600 * 1_000_000


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("make-sf10-events")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    tiled = base.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") + F.col("copy") * EOFF).alias("event_id"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.col("copy") * HOUR_US
        ).cast("timestamp_ntz").alias("ts"),
        (F.col("user_id") + F.col("copy") * UOFF).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    tiled.repartition(64).write.mode("overwrite").parquet(
        os.path.join(OUT, "events.parquet")
    )
    print("rows:", spark.read.parquet(os.path.join(OUT, "events.parquet")).count())
    spark.stop()


if __name__ == "__main__":
    main()
