"""Streaming McNemar (streaming/ml_eval.py): last-row parity with the
batch operator across a checkpoint restart, and the no-disagreement
NULL convention."""

from __future__ import annotations

import random

from brontes_spark.operators.ml_eval import mcnemar_test
from brontes_spark.streaming.ml_eval import mcnemar_stream

DDL = "event_id long, ts_ns long, key long, y string, pa string, pb string"
SEC = 1_000_000_000
CLASSES = ["click", "view", "purchase"]


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        mcnemar_stream(stream, key_col="key")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _mk_rows(seed: int, n_keys: int = 4):
    rng = random.Random(seed)
    rows, eid = [], 0
    for key in range(n_keys):
        t = SEC
        for _ in range(rng.randrange(8, 30)):
            eid += 1
            y = rng.choice(CLASSES)
            # A is decent, B is worse, NULLs appear on both sides
            pa = rng.choice([y, y, rng.choice(CLASSES), None])
            pb = rng.choice([y, rng.choice(CLASSES), None])
            rows.append((eid, t, key, y, pa, pb))
            t += rng.randrange(1, 2 * SEC)
    rows.sort(key=lambda r: r[1])
    return rows


def test_stream_last_row_matches_batch_across_restart(spark, tmp_path):
    rows = _mk_rows(23)
    half = len(rows) // 2
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)  # fresh query, same checkpoint

    got = spark.read.parquet(out)
    assert got.count() == len(rows)  # one row per event, exactly once
    last = {
        r["key"]: (
            r["n"], r["both_correct"], r["only_a"], r["only_b"],
            r["neither"], r["chi2_9"],
        )
        for r in got.orderBy("key", "ts_ns").collect()
    }  # dict keeps the LAST row per key
    df = spark.createDataFrame(rows, DDL)
    for key in {r[2] for r in rows}:
        b = mcnemar_test(
            df.filter(df["key"] == key), "y", "pa", "pb"
        ).collect()[0]
        assert last[key] == (
            b["n"], b["both_correct"], b["only_a"], b["only_b"],
            b["neither"], b["chi2_9"],
        ), key


def test_no_disagreement_prefix_is_null(spark, tmp_path):
    rows = [
        (1, SEC, 7, "a", "a", "a"),       # both correct -> no signal yet
        (2, 2 * SEC, 7, "a", "b", "b"),   # both wrong -> still none
        (3, 3 * SEC, 7, "a", "a", "b"),   # first disagreement
    ]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    got = sorted(
        (r["ts_ns"], r["chi2_9"]) for r in spark.read.parquet(out).collect()
    )
    assert got == [(SEC, None), (2 * SEC, None), (3 * SEC, 10**9)]
