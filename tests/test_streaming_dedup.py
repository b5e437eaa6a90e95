"""Streaming incremental near-dedup (streaming/dedup.py): the Python
signature mirror must be value-identical to the batch column-math plan,
and the stateful first-kept-wins fold must reproduce the batch
minhash_lsh_pairs id_b side across a checkpoint RESTART for ascending-id
arrival."""

from __future__ import annotations

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
