"""Streaming sessionization (streaming/sessionize.py): batch parity across
checkpoint restarts, event-time-timeout closing of idle sessions, and the
exactly-once closed-session emission contract."""

from __future__ import annotations

import random

from brontes_spark.streaming.sessionize import sessionize_stream
import pytest

DDL = "event_id long, ts_ns long, user_id long, event_type string"
GAP_NS = 1_000_000_000  # 1s inactivity gap
SEC = 1_000_000_000


def _expected_sessions(rows, gap_ns=GAP_NS):
    """Pure-python replay of the batch x8 semantics: per-user ts-sorted
    split at gaps, one (user, seq, n, start, end, dur) per session."""
    by_user: dict = {}
    for eid, ts, uid, _ in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    out = set()
    for uid, evs in by_user.items():
        evs.sort()
        seq, cur = 0, []
        for ts, _ in evs:
            if cur and ts - cur[-1] > gap_ns:
                seq += 1
                out.add((uid, seq, len(cur), cur[0], cur[-1], cur[-1] - cur[0]))
                cur = []
            cur.append(ts)
        seq += 1
        out.add((uid, seq, len(cur), cur[0], cur[-1], cur[-1] - cur[0]))
    return out


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DDL).parquet(src)
    q = (
        sessionize_stream(stream, gap_ns=GAP_NS)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


@pytest.mark.slow
def test_streaming_sessionize_matches_batch_with_timeout_close(
    spark, tmp_path
):
    rng = random.Random(57)
    rows = []
    eid = 0
    for uid in range(12):
        # strictly past epoch 0: the engine's INITIAL watermark is epoch 0
        # and stateful ops drop rows at-or-before the watermark, so a ts=0
        # event would be discarded as late — an artifact of synthetic
        # epoch-anchored times, not of real event streams
        t = (1 + rng.randrange(0, 3)) * SEC
        for _ in range(rng.randrange(2, 12)):
            eid += 1
            rows.append((eid, t, uid, "view"))
            # mix of intra-session steps and deliberate >gap jumps
            t += rng.choice([100, 300_000_000, 900_000_000, 2 * SEC, 5 * SEC])
    rows.sort(key=lambda r: r[1])  # nondecreasing arrival
    # split batches at a STRICT ts boundary: an event whose ts EQUALS the
    # previous batch's max is at-the-watermark and would be dropped as
    # late (delay 0) — the standard Structured Streaming contract, which
    # nondecreasing arrival only guarantees to avoid across strict splits
    half = len(rows) // 2
    while half < len(rows) and rows[half][1] == rows[half - 1][1]:
        half += 1
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    spark.createDataFrame(rows[:half], DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows[half:], DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, ckpt, out)

    # two watermark pushers: the first advances event time far past every
    # horizon, the second forces one more micro-batch in which the (now
    # advanced) watermark fires the idle-session timeouts
    far = max(r[1] for r in rows) + 1000 * SEC
    for k, uid in ((1, 900), (2, 901)):
        spark.createDataFrame(
            [(100000 + k, far + k * 100 * SEC, uid, "view")], DDL
        ).coalesce(1).write.mode("append").parquet(src)
        _drain(spark, src, ckpt, out)

    got = {
        (r["user_id"], r["session_seq"], r["n_events"],
         r["session_start_ns"], r["session_end_ns"], r["duration_ns"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] < 900
    }
    want = _expected_sessions(rows)
    assert got == want
    # exactly-once: no duplicate (user, seq) emissions
    pairs = [
        (r["user_id"], r["session_seq"])
        for r in spark.read.parquet(out).collect()
    ]
    assert len(pairs) == len(set(pairs))


def test_streaming_sessionize_out_of_order_within_batch(spark, tmp_path):
    """Events shuffled WITHIN one micro-batch are re-sorted by the fold —
    one batch in any internal order reproduces the batch sessions; an
    event older than the open session's last_ns extends it with exact
    min/max aggregates."""
    rows = [
        (1, 10 * SEC, 5, "view"),
        (2, 10 * SEC + 100, 5, "view"),
        (3, 13 * SEC, 5, "view"),   # new session (3s > 1s gap)
        (4, 13 * SEC + 50, 5, "view"),
    ]
    shuffled = [rows[2], rows[0], rows[3], rows[1]]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(shuffled, DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(spark, src, ckpt, out)
    # only the FIRST session closed (second stays open, no pusher)
    got = {
        (r["session_seq"], r["n_events"], r["session_start_ns"],
         r["session_end_ns"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 2, 10 * SEC, 10 * SEC + 100)}
