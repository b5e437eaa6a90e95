"""Streaming HLL (streaming/hll.py): register parity with the batch
hll_sketch across micro-batches and a checkpoint restart, and the
order-invariance the max-register algebra guarantees."""

from __future__ import annotations

import random

from brontes_spark.operators.sketches import hll_sketch
from brontes_spark.streaming.hll import hll_register_stream

DDL = "key string, v string"
P = 5


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)

    def sink(batch_df, batch_id):
        batch_df.withColumn("b", __import__("pyspark").sql.functions.lit(batch_id)) \
            .write.mode("append").parquet(out)

    q = (
        hll_register_stream(stream, "key", "v", p=P)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _latest(spark, out):
    rows = spark.read.parquet(out).collect()
    best = {}
    for r in rows:
        k = (r.key, r.bucket)
        if k not in best or r.b > best[k][1]:
            best[k] = (r.rho_max, r.b)
    return {k: v[0] for k, v in best.items()}


def test_streaming_registers_match_batch_across_restart(spark, tmp_path):
    rng = random.Random(5)
    rows = [(k, f"{k}_{rng.randrange(4000)}") for k in ("a", "b") for _ in range(3000)]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], DDL).coalesce(2).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(2).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)  # restart from checkpoint

    got = _latest(spark, out)
    want = {
        (r.key, r.bucket): r.rho_max
        for r in hll_sketch(
            spark.createDataFrame(rows, DDL), "key", "v", p=P
        ).collect()
    }
    assert got == want


def test_order_invariance(spark, tmp_path):
    """Feeding the same rows in reversed order yields identical final
    registers — max-algebra, not luck."""
    rng = random.Random(9)
    rows = [("k", f"x{rng.randrange(1000)}") for _ in range(1500)]
    outs = []
    for tag, data in (("fwd", rows), ("rev", rows[::-1])):
        src, ckpt, out = (str(tmp_path / f"{tag}_{d}") for d in ("src", "ckpt", "out"))
        spark.createDataFrame(data, DDL).coalesce(1).write.parquet(src)
        _drain(spark, src, ckpt, out)
        outs.append(_latest(spark, out))
    assert outs[0] == outs[1]


def test_duplication_tolerance(spark, tmp_path):
    """Replaying every row a second time yields bit-identical registers —
    max is idempotent, so HLL stays correct even past the checkpoint's
    exactly-once guarantee (at-least-once re-delivery, source replays).
    VERDICT r8 directive 9's replay leg; Benford's counts deliberately do
    NOT have this property (see test_streaming_benford.py) and rely on
    the checkpoint alone."""
    rng = random.Random(11)
    rows = [("k", f"x{rng.randrange(800)}") for _ in range(1200)]
    outs = []
    for tag, data in (("once", rows), ("twice", rows + rows)):
        src, ckpt, out = (str(tmp_path / f"{tag}_{d}") for d in ("src", "ckpt", "out"))
        spark.createDataFrame(data, DDL).coalesce(1).write.parquet(src)
        _drain(spark, src, ckpt, out)
        outs.append(_latest(spark, out))
    assert outs[0] == outs[1]
