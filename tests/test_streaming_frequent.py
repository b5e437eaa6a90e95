"""Streaming sharded-MG heavy hitters (streaming/frequent.py): completeness
vs the batch reference across micro-batches and a checkpoint restart, and
the one-sided lower-bound count contract."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from brontes_spark.streaming.frequent import frequent_items_stream

DDL = "event_id long, v string"


def _drain(spark, src, ckpt, out, counters=8, shards=4):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        frequent_items_stream(stream, "v", counters=counters, shards=shards)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_frequent_complete_and_one_sided(spark, tmp_path):
    rng = random.Random(83)
    rows = []
    eid = 0
    # heavy: three values at ~20/9/6 percent; tail: distinct singletons
    for v, n in (("hot_a", 500), ("hot_b", 220), ("hot_c", 150)):
        for _ in range(n):
            eid += 1
            rows.append((eid, v))
    for i in range(1600):
        eid += 1
        rows.append((eid, f"noise{i}"))
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
    _drain(spark, src, ckpt, out)  # restart from checkpoint

    # latest snapshot per (shard, value): the max lb_count emission
    snap: dict = {}
    for r in spark.read.parquet(out).collect():
        k = (r["shard"], r["value"])
        snap[k] = max(snap.get(k, 0), r["lb_count"])
    by_value = {}
    for (_, v), c in snap.items():
        by_value[v] = max(by_value.get(v, 0), c)

    true_counts = {"hot_a": 500, "hot_b": 220, "hot_c": 150}
    df = spark.createDataFrame(rows, DDL)
    shard_rows = (
        df.withColumn(
            "shard",
            (F.conv(F.substring(F.md5(F.col("v")), 1, 15), 16, 10)
             .cast("long") % 4).cast("int"),
        )
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    )
    max_shard = max(r["n"] for r in shard_rows.collect())
    # completeness: every value heavier than the per-shard MG error bound
    # is in the final snapshot
    for v, n in true_counts.items():
        assert n > max_shard // (8 + 1), "fixture must exceed the bound"
        assert v in by_value, v
        # one-sided: the emitted bound never exceeds the true count
        assert by_value[v] <= n, v
    # one-sided for every candidate, incl. noise survivors
    truth = {r["v"]: r["n"] for r in df.groupBy("v").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for v, c in by_value.items():
        assert c <= truth[v], v


def test_streaming_frequent_single_batch_matches_batch_mg_bound(
    spark, tmp_path
):
    """One micro-batch, one shard: the emitted candidates are exactly the
    per-partition MG summary the batch operator's pass 1 would build (same
    compaction rule), so the sketch-then-verify split composes."""
    rows = [(i, "x") for i in range(50)] + [
        (100 + i, f"n{i}") for i in range(30)
    ]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, ckpt, out, counters=4, shards=1)
    snap = {
        r["value"]: r["lb_count"] for r in spark.read.parquet(out).collect()
    }
    # "x" dominates: survives with a bound <= 50; noise singletons are
    # compacted away down to <= counters survivors
    assert "x" in snap and 0 < snap["x"] <= 50
    assert len(snap) <= 4
