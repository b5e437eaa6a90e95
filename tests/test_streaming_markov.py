"""Streaming Markov transition log (streaming/markov.py): aggregated
step-log parity with the batch transition_stats across a checkpoint
restart, first-event seeding, and exactly-once step emission."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from brontes_spark.operators.markov import transition_stats
from brontes_spark.streaming.markov import transition_stream

DDL = "event_id long, ts_ns long, user_id long, event_type string"
SEC = 1_000_000_000


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        transition_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _mk_rows(seed: int, n_users: int = 10):
    rng = random.Random(seed)
    rows, eid = [], 0
    for uid in range(n_users):
        t = (1 + rng.randrange(3)) * SEC
        for _ in range(rng.randrange(3, 15)):
            eid += 1
            rows.append((eid, t, uid, rng.choice(["a", "b", "c", "d"])))
            t += rng.randrange(1, 3 * SEC)
    rows.sort(key=lambda r: r[1])  # nondecreasing arrival
    return rows


def test_streaming_transition_log_matches_batch_across_restart(spark, tmp_path):
    rows = _mk_rows(11)
    half = len(rows) // 2
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)  # restart boundary: fresh query, same ckpt
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)

    steps = spark.read.parquet(out)
    got = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in steps.groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    batch = spark.createDataFrame(rows, DDL)
    want = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transition_stats(
            batch, "user_id", ["ts_ns", "event_id"], "event_type"
        ).collect()
    }
    assert got == want


def test_streaming_emits_per_key_step_counts_exactly_once(spark, tmp_path):
    rows = _mk_rows(23, n_users=6)
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    # re-drain with NO new data: nothing must re-emit
    _drain(spark, src, ckpt, out)

    per_user = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    from collections import Counter

    events_per_user = Counter(r[2] for r in rows)
    # n_steps = n_events - 1 per user (first event seeds, emits nothing)
    assert per_user == {u: n - 1 for u, n in events_per_user.items() if n > 1}


def test_single_event_users_emit_nothing(spark, tmp_path):
    rows = [(1, SEC, 1, "a"), (2, 2 * SEC, 2, "b")]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == 0
