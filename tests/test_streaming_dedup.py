"""Streaming incremental near-dedup (streaming/dedup.py): the Python
signature mirror must be value-identical to the batch column-math plan,
and the stateful first-kept-wins fold must reproduce the batch
minhash_lsh_pairs id_b side across a checkpoint RESTART for ascending-id
arrival."""

from __future__ import annotations

import pytest

from brontes_spark.operators.dedup import (
    _lsh_band_signatures,
    minhash_lsh_pairs,
)
from brontes_spark.sources.testdata import load_table
from brontes_spark.streaming.dedup import (
    band_signatures_stream,
    lsh_dedup_stream,
)

SF_DIR = "/root/testdata/sf0.001"
DOC_DDL = "doc_id long, text string"


def test_python_signatures_match_batch_plan(spark):
    """Exact parity of the mapInPandas signature mirror with the batch
    column-math plan over the real documents table — every (doc_id, band,
    band_sig) triple identical."""
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r["doc_id"], r["band"], r["band_sig"])
        for r in band_signatures_stream(docs).collect()
    }
    want = {
        (r["id"], r["band"], r["band_sig"])
        for r in _lsh_band_signatures(docs, "doc_id", "text", 3, 16, 4).collect()
    }
    assert got == want
    assert len(got) > 0


def _drain(spark, src, ckpt, out):
    stream = spark.readStream.schema(DOC_DDL).parquet(src)
    q = (
        lsh_dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_flags_match_batch_pairs_across_restart(spark, tmp_path):
    """Ascending-id arrival over two micro-batches with a stream restart
    between them: the distinct flagged doc_ids equal the batch pairs' id_b
    set (docs with any smaller-id bucket-mate), and each flag's witness
    shares a bucket with the flagged doc."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    median = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    docs.filter(f"doc_id <= {median}").coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    docs.filter(f"doc_id > {median}").coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)

    flags = spark.read.parquet(out).collect()
    flagged = {r["doc_id"] for r in flags}
    want = {
        r["id_b"] for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    assert flagged == want
    assert len(flagged) > 0
    # witnesses precede their duplicates (ascending arrival), and chasing
    # witness chains always terminates at a KEPT doc — a bucket survivor
    # can itself be flagged via a different bucket (batch mode resolves
    # this with connected components; online mode leaves the chain)
    witness = {}
    for r in flags:
        assert r["dup_of"] < r["doc_id"]
        witness.setdefault(r["doc_id"], r["dup_of"])
    for doc in flagged:
        seen = set()
        while doc in witness:
            assert doc not in seen
            seen.add(doc)
            doc = witness[doc]
        assert doc not in flagged


def test_streaming_first_kept_wins_out_of_order(spark, tmp_path):
    """When a SMALLER id arrives after its bucket is claimed, the earlier
    arrival stays the survivor and the newcomer is flagged against it —
    the documented online semantics (witness id may exceed the flagged
    id)."""
    a = "alpha beta gamma delta epsilon zeta"
    rows1 = [(10, a)]
    rows2 = [(3, a), (20, a)]
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    spark.createDataFrame(rows1, DOC_DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)
    spark.createDataFrame(rows2, DOC_DDL).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, out)

    flags = {(r["doc_id"], r["dup_of"]) for r in spark.read.parquet(out).collect()}
    assert flags == {(3, 10), (20, 10)}


def test_streaming_funnel_matches_batch_across_restart(spark, tmp_path):
    """Streaming funnel (streaming/funnel.py): nondecreasing-ts arrival over
    two micro-batches with a restart between them — the LAST emitted row
    per key equals batch funnel_stage_times(prefilter=True) exactly."""
    import random

    from brontes_spark.operators.funnel import funnel_stage_times
    from brontes_spark.streaming.funnel import funnel_stream

    rng = random.Random(71)
    stages = ["view", "click", "purchase"]
    rows = []
    eid = 0
    for user in range(25):
        for _ in range(rng.randrange(1, 14)):
            eid += 1
            rows.append((eid, rng.randrange(0, 8) * 100, user,
                         rng.choice(stages + ["error"])))
    rows.sort(key=lambda r: r[1])  # nondecreasing ts across the batch split
    ddl = "event_id long, ts_ns long, user_id long, event_type string"
    half = len(rows) // 2
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    def drain():
        stream = spark.readStream.schema(ddl).parquet(src)
        q = (
            funnel_stream(stream, stages)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(rows[:half], ddl).coalesce(1).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(rows[half:], ddl).coalesce(1).write.mode("append").parquet(src)
    drain()

    # LAST emitted row per key wins (update-mode stream into an append
    # file sink: later batches append; deepest stage is monotone, so take
    # the max-stage row, tie-broken by the most timestamps set)
    latest = {}
    for r in spark.read.parquet(out).collect():
        cur = latest.get(r["user_id"])
        if cur is None or r["stage"] >= cur["stage"]:
            latest[r["user_id"]] = r
    df = spark.createDataFrame(rows, ddl)
    want = {r["user_id"]: r for r in funnel_stage_times(
        df, stages, prefilter=True).collect()}
    assert set(latest) == set(want)
    for uid, w in want.items():
        g = latest[uid]
        assert (g["t1"], g["t2"], g["t3"], g["stage"]) == (
            w["t1"], w["t2"], w["t3"], w["stage"]), uid


@pytest.mark.slow
def test_streaming_funnel_out_of_order_understates_never_overstates(
    spark, tmp_path
):
    """Out-of-order arrival contract (VERDICT r6 directive 7), pinned in
    both directions:

    (a) a LATE stage-1 event with an earlier timestamp cannot retroactively
        move an already-satisfied t1 (first-qualifying-wins);
    (b) a stage-2 event that arrives BEFORE its stage-1 prerequisite is
        consumed without effect and is NOT retro-applied once stage 1
        lands — streaming depth UNDERSTATES the batch replay;
    (c) the inequality is one-sided: for random arrival orders, streaming
        stage depth <= batch depth for every key, and each satisfied
        streaming t_i >= the batch t_i (induction on the strict-> fold:
        any event that advances the stream state would also have advanced
        the batch fold at an equal-or-earlier timestamp)."""
    import random

    from brontes_spark.operators.funnel import funnel_stage_times
    from brontes_spark.streaming.funnel import funnel_stream

    stages = ["view", "click", "purchase"]
    ddl = "event_id long, ts_ns long, user_id long, event_type string"

    def run_stream(batches, tag):
        src, ckpt, out = (
            str(tmp_path / f"{tag}_{d}") for d in ("src", "ckpt", "out")
        )
        for b in batches:
            spark.createDataFrame(b, ddl).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q = (
                funnel_stream(
                    spark.readStream.schema(ddl).parquet(src), stages
                )
                .writeStream.format("parquet")
                .option("path", out)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        latest = {}
        for r in spark.read.parquet(out).collect():
            cur = latest.get(r["user_id"])
            if cur is None or r["stage"] >= cur["stage"]:
                latest[r["user_id"]] = r
        return latest

    # (a) late-but-earlier stage-1: t1 stays at the first arrival's ts
    got = run_stream(
        [[(1, 100, 7, "view"), (2, 200, 7, "click")], [(3, 50, 7, "view")]],
        "late1",
    )
    assert (got[7]["t1"], got[7]["t2"], got[7]["stage"]) == (100, 200, 2)

    # (b) prerequisite arrives after its dependent: depth understates batch
    got = run_stream([[(1, 200, 8, "click")], [(2, 100, 8, "view")]], "dep")
    assert (got[8]["t1"], got[8]["t2"], got[8]["stage"]) == (100, None, 1)
    batch = funnel_stage_times(
        spark.createDataFrame(
            [(1, 200, 8, "click"), (2, 100, 8, "view")], ddl
        ),
        stages,
    ).collect()[0]
    assert (batch["t2"], batch["stage"]) == (200, 2)

    # (c) random arrival orders: one-sided inequality vs the batch replay
    rng = random.Random(113)
    rows = []
    eid = 0
    for user in range(12):
        for _ in range(rng.randrange(2, 10)):
            eid += 1
            rows.append(
                (eid, rng.randrange(0, 6) * 100, user,
                 rng.choice(stages + ["noise"]))
            )
    arrival = rows[:]
    rng.shuffle(arrival)  # deliberately NOT time-ordered
    half = len(arrival) // 2
    got = run_stream([arrival[:half], arrival[half:]], "prop")
    want = {
        r["user_id"]: r
        for r in funnel_stage_times(
            spark.createDataFrame(rows, ddl), stages
        ).collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["stage"] <= w["stage"], uid
        for i in (1, 2, 3):
            if g[f"t{i}"] is not None:
                assert w[f"t{i}"] is not None and g[f"t{i}"] >= w[f"t{i}"], uid
