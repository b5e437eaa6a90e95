"""Streaming OHLC (streaming/ohlc.py): closed-candle parity with the
batch ohlc_downsample over the same rows, across micro-batches and a
checkpoint restart; append-mode close semantics (a candle emits once,
when the watermark passes it)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from brontes_spark.operators.windows import ohlc_downsample
from brontes_spark.streaming.ohlc import ohlc_stream

DDL = "key string, ts timestamp, p double"
HOUR_NS = 3_600_000_000_000
BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        ohlc_stream(stream, "key", "ts", "p", bucket="1 hour", lateness="5 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_ohlc_parity_and_single_emission(spark, tmp_path):
    rng = random.Random(13)
    rows = []
    # 3 keys x 6 hours of ticks, in-order enough for the watermark
    for h in range(6):
        for key in ("btc", "eth", "sol"):
            for m in sorted(rng.sample(range(60), 8)):
                rows.append(
                    (key, BASE + dt.timedelta(hours=h, minutes=m, seconds=rng.randrange(60)),
                     round(rng.uniform(10, 500), 2))
                )
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)  # restart from checkpoint

    got_rows = spark.read.parquet(out).collect()
    got = {(r.key, r.bucket_start): (r.open, r.high, r.low, r.close, r.n_ticks)
           for r in got_rows}
    # append mode: each candle emitted exactly once
    assert len(got_rows) == len(got)

    # batch reference over the SAME rows, on epoch-ns longs
    # fixture timestamps are whole seconds, so seconds*1e9 is exact
    batch_df = spark.createDataFrame(rows, DDL).select(
        "key",
        (F.unix_timestamp("ts") * 1_000_000_000).alias("ts_ns"),
        "p",
    )
    ref = {
        (r.key, dt.datetime.utcfromtimestamp(r.bucket_start / 1e9)):
            (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in ohlc_downsample(batch_df, "key", "ts_ns", "p", HOUR_NS).collect()
    }
    # the stream emits only candles the final watermark passed; every
    # emitted candle must match the batch value exactly, and at least the
    # first five hours must have closed
    assert got, "no candles closed"
    for k, v in got.items():
        assert ref[k] == v, k
    closed_hours = {bs.hour for (_, bs) in got}
    assert closed_hours >= set(range(5))
