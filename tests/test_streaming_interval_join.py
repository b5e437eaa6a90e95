"""Stream-stream interval join (streaming/interval_join.py): pair parity
with the batch interval_overlap_join over the same rows, across a
checkpoint restart; exactly-once emission in append mode."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from brontes_spark.operators.range_join import interval_overlap_join
from brontes_spark.streaming.interval_join import interval_join_stream

L_DDL = "k string, lid long, lts timestamp"
R_DDL = "k string, rid long, rts timestamp"
BASE = dt.datetime(2024, 6, 1, 0, 0, 0)
HOUR_NS = 3_600_000_000_000


def _drain(spark, lsrc, rsrc, ckpt, out):
    ls = spark.readStream.schema(L_DDL).parquet(lsrc).withColumn(
        "ldur", F.expr("INTERVAL 2 HOURS")
    )
    rs = spark.readStream.schema(R_DDL).parquet(rsrc).withColumn(
        "rdur", F.expr("INTERVAL 1 HOUR")
    )
    q = (
        interval_join_stream(ls, rs, "lts", "rts", "ldur", "rdur", on=["k"])
        .drop("ldur", "rdur")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_stream_interval_join_parity(spark, tmp_path):
    rng = random.Random(21)
    lrows = [
        (k, i, BASE + dt.timedelta(minutes=rng.randrange(0, 360)))
        for k in ("u", "v", "w") for i in range(25)
    ]
    rrows = [
        (k, 1000 + i, BASE + dt.timedelta(minutes=rng.randrange(0, 360)))
        for k in ("u", "v") for i in range(25)
    ]
    lsrc, rsrc, ckpt, out = (str(tmp_path / d) for d in ("l", "r", "ck", "out"))
    spark.createDataFrame(lrows[:40], L_DDL).coalesce(1).write.mode("append").parquet(lsrc)
    spark.createDataFrame(rrows[:25], R_DDL).coalesce(1).write.mode("append").parquet(rsrc)
    _drain(spark, lsrc, rsrc, ckpt, out)
    spark.createDataFrame(lrows[40:], L_DDL).coalesce(1).write.mode("append").parquet(lsrc)
    spark.createDataFrame(rrows[25:], R_DDL).coalesce(1).write.mode("append").parquet(rsrc)
    _drain(spark, lsrc, rsrc, ckpt, out)  # restart from checkpoint

    got_rows = spark.read.parquet(out).select("k", "lid", "rid").collect()
    got = {(r.k, r.lid, r.rid) for r in got_rows}
    assert len(got_rows) == len(got), "append mode must emit each pair once"

    # batch reference on epoch-ns longs over ALL rows
    lb = spark.createDataFrame(lrows, L_DDL).select(
        "k", "lid",
        (F.unix_timestamp("lts") * 1_000_000_000).alias("ls"),
        (F.unix_timestamp("lts") * 1_000_000_000 + 2 * HOUR_NS).alias("le"),
    )
    rb = spark.createDataFrame(rrows, R_DDL).select(
        "k", "rid",
        (F.unix_timestamp("rts") * 1_000_000_000).alias("rs"),
        (F.unix_timestamp("rts") * 1_000_000_000 + HOUR_NS).alias("re"),
    )
    want = {
        (r.k, r.lid, r.rid)
        for r in interval_overlap_join(
            lb, rb, "ls", "le", "rs", "re", on=["k"], bucket=HOUR_NS
        ).collect()
    }
    # all inputs arrived in watermark order within each drain, so the
    # stream must produce the complete batch answer
    assert got == want
    assert want, "fixture produced no overlapping pairs"
