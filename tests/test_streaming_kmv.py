"""Streaming KMV sketch (streaming/kmv.py): final-snapshot parity with the
batch kmv_distinct over the same rows, across micro-batches, a checkpoint
restart, and an adversarial arrival re-ordering (KMV union is commutative
and idempotent, so any order must fold to the same sketch)."""

from __future__ import annotations

import random

from brontes_spark.operators.sketches import kmv_distinct
from brontes_spark.streaming.kmv import kmv_distinct_stream

DDL = "event_id long, key string, v string"
K = 16


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        kmv_distinct_stream(stream, "key", "v", k=K)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _latest_snapshots(spark, out):
    # snapshots are monotone in n_seen; the latest per key has the max
    # (n_seen, est) — use the row with max n_seen, tie-broken by kth_min
    snap: dict = {}
    for r in spark.read.parquet(out).collect():
        cur = snap.get(r["key"])
        if cur is None or r["n_seen"] > cur[0] or (
            r["n_seen"] == cur[0] and (cur[1] or 0) >= (r["kth_min"] or 0)
        ):
            snap[r["key"]] = (r["n_seen"], r["kth_min"], r["est_distinct"])
    return snap


def _batch_reference(spark, rows):
    df = spark.createDataFrame(rows, DDL)
    return {
        r["key"]: (r["n_seen"], r["kth_min"], r["est_distinct"])
        for r in kmv_distinct(df, "key", "v", k=K).collect()
    }


def test_streaming_kmv_parity_and_restart(spark, tmp_path):
    rng = random.Random(19)
    rows = []
    eid = 0
    # key "big": 400 distinct values (estimator regime); key "small": 7
    # distinct values repeated (exact regime)
    for i in range(400):
        eid += 1
        rows.append((eid, "big", f"val{i}"))
    for i in range(60):
        eid += 1
        rows.append((eid, "small", f"s{i % 7}"))
    rng.shuffle(rows)
    half = len(rows) // 2
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, ckpt, out)  # resumes from checkpoint

    assert _latest_snapshots(spark, out) == _batch_reference(spark, rows)


def test_streaming_kmv_order_invariant(spark, tmp_path):
    rows = [(i, "k", f"v{i % 50}") for i in range(200)]
    ref = _batch_reference(spark, rows)

    reordered = list(reversed(rows))
    src, ckpt, out = (str(tmp_path / d) for d in ("src2", "ckpt2", "out2"))
    third = len(reordered) // 3
    for chunk in (reordered[:third], reordered[third: 2 * third], reordered[2 * third:]):
        spark.createDataFrame(chunk, DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _drain(spark, src, ckpt, out)

    assert _latest_snapshots(spark, out) == ref
    assert ref["k"][0] == 16  # 50 distinct > k: estimator regime exercised
