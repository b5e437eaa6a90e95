"""Streaming Benford (streaming/benford.py): the drained stream's latest
digit counts feed benford_report to reproduce the batch screen exactly,
across micro-batches and a checkpoint restart."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from brontes_spark.operators.benford import benford_report, benford_screen
from brontes_spark.streaming.benford import digit_count_stream

DDL = "event_id long, cents long"


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)

    def sink(batch_df, batch_id):
        batch_df.withColumn("b", F.lit(batch_id)).write.mode("append").parquet(out)

    q = (
        digit_count_stream(stream, "cents")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streamed_counts_give_batch_screen_across_restart(spark, tmp_path):
    rng = random.Random(41)
    # multiplicative-ish magnitudes plus excluded zero/negative rows
    rows = [(i, int(1.7 ** rng.randrange(2, 25))) for i in range(400)]
    rows += [(1000, 0), (1001, -7)]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)  # restart from checkpoint

    emitted = spark.read.parquet(out)
    latest = (
        emitted.groupBy("digit")
        .agg(F.max_by("n_obs", "b").alias("n_obs"))
    )
    got = {
        r["digit"]: (r["n_obs"], r["chi2_9"])
        for r in benford_report(latest).collect()
    }
    batch = spark.createDataFrame(rows, DDL)
    want = {
        r["digit"]: (r["n_obs"], r["chi2_9"])
        for r in benford_screen(batch, "cents").collect()
    }
    assert got == want
    assert len(want) == 9


def test_order_invariance(spark, tmp_path):
    """Reversed delivery order yields identical digit counts and chi2 —
    the per-digit count is a commutative SUM, so ordering cannot matter
    (unlike HLL there is NO duplication tolerance: counts are not
    idempotent, and replay safety comes from the checkpoint's
    exactly-once file-source tracking, pinned by the restart test above).
    VERDICT r8 directive 9's reorder leg."""
    rng = random.Random(43)
    rows = [(i, int(2.1 ** rng.randrange(2, 20))) for i in range(300)]
    outs = []
    for tag, data in (("fwd", rows), ("rev", rows[::-1])):
        src, ckpt, out = (str(tmp_path / f"{tag}_{d}") for d in ("src", "ck", "out"))
        spark.createDataFrame(data, DDL).coalesce(1).write.parquet(src)
        _drain(spark, src, ckpt, out)
        emitted = spark.read.parquet(out)
        latest = emitted.groupBy("digit").agg(F.max_by("n_obs", "b").alias("n_obs"))
        outs.append({
            r["digit"]: (r["n_obs"], r["chi2_9"])
            for r in benford_report(latest).collect()
        })
    assert outs[0] == outs[1]
