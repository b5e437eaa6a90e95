"""Streaming CUSUM (streaming/cusum.py): row-level parity with the batch
closed form across a checkpoint restart, exactly-once emission, and
state-not-history (straggler folds in arrival order)."""

from __future__ import annotations

import random

from brontes_spark.operators.changepoint import cusum
from brontes_spark.streaming.cusum import cusum_stream

DDL = "event_id long, ts_ns long, user_id long, cents long"
SEC = 1_000_000_000
ARGS = dict(target=50, allowance=5, threshold=300)


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        cusum_stream(stream, **ARGS)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _mk_rows(seed: int, n_users: int = 8):
    rng = random.Random(seed)
    rows, eid = [], 0
    for uid in range(n_users):
        t = SEC
        for _ in range(rng.randrange(10, 40)):
            eid += 1
            rows.append((eid, t, uid, rng.randrange(0, 140)))
            t += rng.randrange(1, 2 * SEC)
    rows.sort(key=lambda r: r[1])
    return rows


def _batch_rows(spark, rows):
    df = spark.createDataFrame(rows, DDL)
    got = cusum(df, "user_id", ["ts_ns", "event_id"], "cents", **ARGS)
    return {
        (r["user_id"], r["ts_ns"]): (r["cusum_pos"], r["cusum_neg"], r["alarm"])
        for r in got.collect()
    }


def test_stream_matches_batch_across_restart(spark, tmp_path):
    rows = _mk_rows(31)
    half = len(rows) // 2
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)  # fresh query, same checkpoint

    got = {
        (r["user_id"], r["ts_ns"]): (r["cusum_pos"], r["cusum_neg"], r["alarm"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == _batch_rows(spark, rows)


def test_exactly_once_no_reemission(spark, tmp_path):
    rows = _mk_rows(47, n_users=4)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    _drain(spark, src, ckpt, out)  # no new data: nothing re-emits
    assert spark.read.parquet(out).count() == len(rows)


def test_alarm_crossing_spans_batches(spark, tmp_path):
    # drift accumulates across the batch boundary: 4 events of +155
    # excess (x=210 vs target+allowance=55) crosses 300 at the 2nd event,
    # which arrives in the SECOND micro-batch
    rows = [(i, i * SEC, 1, 210) for i in range(1, 5)]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows[:1], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[1:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    got = {r["ts_ns"]: r for r in spark.read.parquet(out).collect()}
    assert got[1 * SEC]["alarm"] is False  # S+ = 155
    assert got[2 * SEC]["alarm"] is True  # S+ = 310
    assert got[4 * SEC]["cusum_pos"] == 620
