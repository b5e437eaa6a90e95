"""Streaming autocorrelation: final-row parity with the batch operator
across a checkpoint restart, exactly-once, first-event seeding."""

from __future__ import annotations

import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from brontes_spark.operators.ols import autocorr
from brontes_spark.streaming.autocorr import autocorr_stream

DDL = "event_id long, ts_ns long, user_id long, cents long"
SEC = 1_000_000_000


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        autocorr_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _mk_rows(seed, n_users=6):
    rng = random.Random(seed)
    rows, eid = [], 0
    for uid in range(n_users):
        t = SEC
        for _ in range(rng.randrange(5, 25)):
            eid += 1
            rows.append((eid, t, uid, rng.randrange(0, 300)))
            t += rng.randrange(1, SEC)
    rows.sort(key=lambda r: r[1])
    return rows


def test_final_rows_match_batch_across_restart(spark, tmp_path):
    rows = _mk_rows(17)
    half = len(rows) // 2
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)

    emitted = spark.read.parquet(out)
    # the LAST emission per key is the full-history statistic
    last = {
        r["user_id"]: (r["n_pairs"], r["corr9"])
        for r in emitted.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.desc("n_pairs"))
            ),
        ).filter("rn = 1").collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["corr9"])
        for r in autocorr(
            spark.createDataFrame(rows, DDL),
            "user_id", ["ts_ns", "event_id"], "cents", lag=1,
        ).collect()
    }
    assert last == batch
    # one emission per event after each key's first
    from collections import Counter

    per_user = Counter(r[2] for r in rows)
    counts = {
        r["user_id"]: r["n"]
        for r in emitted.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {u: c - 1 for u, c in per_user.items() if c > 1}


def test_no_reemission_on_empty_drain(spark, tmp_path):
    rows = _mk_rows(29, n_users=3)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    _drain(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == len(rows) - 3
