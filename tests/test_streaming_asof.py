"""Streaming as-of enrichment (streaming/asof.py): row-for-row parity
with the batch backward as-of join across a checkpoint restart, the
same-instant tie rule, the no-reference-yet NULL face, and the
late-reference discard contract."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from brontes_spark.operators.asof import asof_join
from brontes_spark.streaming.asof import asof_enrich_stream
import pytest

DDL = "event_id long, ts_ns long, key long, is_ref boolean, value double"
SEC = 1_000_000_000


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        asof_enrich_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _batch_asof(spark, rows):
    df = spark.createDataFrame(rows, DDL)
    left = df.filter(~F.col("is_ref")).select(
        "key", F.col("event_id").alias("query_id"), "ts_ns"
    )
    right = df.filter(F.col("is_ref")).select(
        "key", F.col("ts_ns").alias("r_ts"), "event_id", "value"
    )
    j = asof_join(
        left, right, ["key"], "ts_ns", "r_ts",
        tiebreak="event_id", how="left",
    )
    return {
        r["query_id"]: (r["r_value"], r["r_r_ts"])
        for r in j.collect()
    }


def _mk_rows(seed: int):
    rng = random.Random(seed)
    rows, eid = [], 0
    for k in range(8):
        t = SEC
        for _ in range(rng.randrange(6, 25)):
            eid += 1
            t += rng.randrange(1, 2 * SEC)
            rows.append(
                (eid, t, k, rng.random() < 0.5, round(rng.uniform(1, 999), 2))
            )
    rows.sort(key=lambda r: r[1])
    return rows


@pytest.mark.slow
def test_streaming_asof_matches_batch_across_restart(spark, tmp_path):
    rows = _mk_rows(31)
    half = len(rows) // 2
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)

    got = {
        r["query_id"]: (r["ref_val"], r["ref_ts"])
        for r in spark.read.parquet(out).collect()
    }
    want = _batch_asof(spark, rows)
    assert got == want
    # every query emitted exactly once
    n_queries = sum(1 for r in rows if not r[3])
    assert len(got) == n_queries


def test_same_instant_reference_is_visible(spark, tmp_path):
    rows = [
        (1, 5 * SEC, 7, True, 100.0),
        (2, 5 * SEC, 7, False, 0.0),  # query at the SAME ts: sees ref 100
    ]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0]["ref_val"] == 100.0 and got[0]["gap_ns"] == 0


def test_query_before_any_reference_gets_nulls(spark, tmp_path):
    rows = [(1, SEC, 7, False, 0.0), (2, 2 * SEC, 7, True, 50.0),
            (3, 3 * SEC, 7, False, 0.0)]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    got = {r["query_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[1]["ref_val"] is None and got[1]["gap_ns"] is None
    assert got[3]["ref_val"] == 50.0


def test_late_older_reference_is_discarded(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    # batch 1: ref at t=10s
    spark.createDataFrame([(1, 10 * SEC, 7, True, 200.0)], DDL).coalesce(1)\
        .write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    # batch 2: LATE ref at t=5s (older than held state) + query at t=12s:
    # the query must see the t=10s value, state never moved backward
    spark.createDataFrame(
        [(2, 5 * SEC, 7, True, 111.0), (3, 12 * SEC, 7, False, 0.0)], DDL
    ).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0]["ref_val"] == 200.0 and got[0]["ref_ts"] == 10 * SEC
