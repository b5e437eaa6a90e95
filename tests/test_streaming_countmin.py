"""Streaming count-min (streaming/countmin.py): latest-cell parity with
the batch countmin_sketch over the same rows across micro-batches, a
checkpoint restart, and a re-ordered arrival (the matrix is additive, so
any order folds to the same cells)."""

from __future__ import annotations

import random

from brontes_spark.operators.sketches import countmin_sketch
from brontes_spark.streaming.countmin import countmin_stream

DDL = "event_id long, v string"
W_, D_ = 64, 3


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        countmin_stream(stream, "v", width=W_, depth=D_)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _latest_cells(spark, out):
    cells: dict = {}
    for r in spark.read.parquet(out).collect():
        k = (r["row"], r["col"])
        cells[k] = max(cells.get(k, 0), r["cnt"])  # counts are monotone
    return cells


def _batch_cells(spark, rows):
    df = spark.createDataFrame(rows, DDL)
    return {
        (r["row"], r["col"]): r["cnt"]
        for r in countmin_sketch(df, "v", width=W_, depth=D_).collect()
    }


def test_streaming_countmin_parity_restart_and_order(spark, tmp_path):
    rng = random.Random(47)
    rows = [(i, f"tok{rng.randint(0, 30)}") for i in range(800)]
    ref = _batch_cells(spark, rows)

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)  # restart from checkpoint
    assert _latest_cells(spark, out) == ref

    # adversarial re-ordering folds to the same matrix
    src2, ckpt2, out2 = (str(tmp_path / d) for d in ("s2", "c2", "o2"))
    rev = list(reversed(rows))
    third = len(rev) // 3
    for chunk in (rev[:third], rev[third: 2 * third], rev[2 * third:]):
        spark.createDataFrame(chunk, DDL).coalesce(1).write.mode("append").parquet(src2)
        _drain(spark, src2, ckpt2, out2)
    assert _latest_cells(spark, out2) == ref
