"""Streaming WAU visibility (streaming/wau.py): sink-aggregated parity
with batch rolling_distinct across a checkpoint restart, exactly-once
pair emission on re-drain."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from brontes_spark.operators.rolling_distinct import rolling_distinct
from brontes_spark.streaming.wau import wau_visibility_stream

DDL = "user_id long, ts_ns long"
DAY = 86_400_000_000_000
W = 7


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        wau_visibility_stream(stream, window_days=W)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _mk(seed, n=250, span=20, users=30):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(users), rng.randrange(span) * DAY + 1 + rng.randrange(DAY - 1))
        for _ in range(n)
    ]
    rows.sort(key=lambda r: r[1])
    return rows


def test_sink_aggregation_matches_batch_across_restart(spark, tmp_path):
    rows = _mk(41)
    half = len(rows) // 2
    while half < len(rows) and rows[half][1] == rows[half - 1][1]:
        half += 1
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)

    got = {
        r["rday"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("rday")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    batch = {
        r["day"]: r["n_active"]
        for r in rolling_distinct(
            spark.createDataFrame(rows, DDL), "user_id", "ts_ns", W
        ).collect()
        if r["n_active"] > 0  # stream can't know the silent-day grid
    }
    # the stream emits visibility beyond the batch span's last day (its
    # trailing windows); batch parity holds on the batch's own days
    assert {d: got[d] for d in batch} == batch


def test_exactly_once_on_redrain(spark, tmp_path):
    rows = _mk(42, n=80)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    n1 = spark.read.parquet(out).count()
    _drain(spark, src, ckpt, out)  # no new data: nothing re-emits
    assert spark.read.parquet(out).count() == n1
    # and no (key, rday) duplicates anywhere
    dup = (
        spark.read.parquet(out)
        .groupBy("key", "rday")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    assert dup == 0
