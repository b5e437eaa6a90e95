"""Streaming HHI (streaming/concentration.py): last-row parity with the
batch operator across a checkpoint restart, and the zero-mass NULL
convention."""

from __future__ import annotations

import random

from brontes_spark.operators.concentration import group_concentration
from brontes_spark.streaming.concentration import hhi_stream

DDL = "event_id long, ts_ns long, user_id long, cents long"
SEC = 1_000_000_000


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        hhi_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _mk_rows(seed: int, n_users: int = 6):
    rng = random.Random(seed)
    rows, eid = [], 0
    for uid in range(n_users):
        t = SEC
        for _ in range(rng.randrange(5, 25)):
            eid += 1
            # zeros included: the zero-mass prefix must emit NULL hhi_9
            rows.append((eid, t, uid, rng.choice([0, 0, 5, 100, 2500])))
            t += rng.randrange(1, 2 * SEC)
    rows.sort(key=lambda r: r[1])
    return rows


def test_stream_last_row_matches_batch_across_restart(spark, tmp_path):
    rows = _mk_rows(17)
    half = len(rows) // 2
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)  # fresh query, same checkpoint

    got = spark.read.parquet(out)
    # exactly one emitted row per input event, exactly once
    assert got.count() == len(rows)
    last = {
        r["key"]: (r["n"], r["total"], r["hhi_9"])
        for r in got.orderBy("key", "ts_ns").collect()
    }  # dict keeps the LAST row per key
    df = spark.createDataFrame(rows, DDL)
    batch = {
        r["user_id"]: (r["n"], r["total"], r["hhi_9"])
        for r in group_concentration(df, "user_id", "cents").collect()
    }
    assert last == batch


def test_zero_mass_prefix_is_null(spark, tmp_path):
    rows = [(1, SEC, 7, 0), (2, 2 * SEC, 7, 0), (3, 3 * SEC, 7, 10)]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    got = sorted(
        (r["ts_ns"], r["hhi_9"]) for r in spark.read.parquet(out).collect()
    )
    assert got == [(SEC, None), (2 * SEC, None), (3 * SEC, 10**9)]
