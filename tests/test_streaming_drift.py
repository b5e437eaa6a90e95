"""Streaming drift (streaming/drift.py): the drained stream's latest
token counts reproduce the batch TV distance exactly, across micro-batches
and a checkpoint restart."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from brontes_spark.operators.drift import token_counts, tv_drift
from brontes_spark.streaming.drift import token_count_stream

DDL = "k string, text string"


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)

    def sink(batch_df, batch_id):
        batch_df.withColumn("b", F.lit(batch_id)).write.mode("append").parquet(out)

    q = (
        token_count_stream(stream, "text", ["k"])
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streamed_counts_give_batch_tv_across_restart(spark, tmp_path):
    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(40)]
    rows = [("g", " ".join(rng.choices(vocab, k=12))) for _ in range(300)]
    ref_rows = [("g", " ".join(rng.choices(vocab[:30], k=12))) for _ in range(200)]

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)  # restart from checkpoint

    # latest emission per (k, tok) == the stream's cumulative counts
    emitted = spark.read.parquet(out)
    w_latest = emitted.groupBy("k", "tok").agg(
        F.max_by("cnt", "b").alias("cnt")
    )
    reference = token_counts(spark.createDataFrame(ref_rows, DDL), "text", ["k"])
    got = tv_drift(w_latest, reference, ["k"]).collect()[0]
    want = tv_drift(
        token_counts(spark.createDataFrame(rows, DDL), "text", ["k"]),
        reference,
        ["k"],
    ).collect()[0]
    assert (int(got.tv_num), got.tv) == (int(want.tv_num), want.tv)
    assert got.tv > 0  # the reference uses a narrower vocabulary: real drift
