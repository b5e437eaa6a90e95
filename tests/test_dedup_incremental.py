"""Incremental LSH dedup (new batch vs corpus) + corpus-frequency
boilerplate scoring (operators/dedup.py) — unit semantics on planted docs;
cross-engine exactness is covered by the registry gates
(dedup_incremental_lsh / txt_boilerplate_score)."""

from __future__ import annotations

from brontes_spark.operators.dedup import (
    minhash_lsh_incremental,
    minhash_lsh_pairs,
    shingle_df_score,
)

BOILER = "the quick brown fox jumps over the lazy dog again and again"
UNIQUE = "zygote quasar bumble fjord glyph vexing marrow pixel clank sprout"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_collides_new_with_corpus_only(spark):
    corpus = _docs(spark, [(1, BOILER), (2, BOILER), (3, UNIQUE)])
    new = _docs(spark, [(10, BOILER), (11, "totally fresh words nobody else wrote here today")])
    got = {(r["new_id"], r["dup_of"])
           for r in minhash_lsh_incremental(new, corpus, "doc_id", "text", n=5).collect()}
    # the boilerplate new doc collides with BOTH corpus copies; the fresh
    # doc with neither; corpus-corpus duplication (1,2) is NOT reported
    assert got == {(10, 1), (10, 2)}


def test_incremental_catches_intra_batch_duplicates(spark):
    """ADVICE r4: two near-duplicates arriving in the SAME ingestion batch
    collide with neither the corpus nor each other under a pure
    new-vs-corpus join — both would enter the corpus. The intra-batch pass
    reports the later one against the min-id batch survivor."""
    corpus = _docs(spark, [(1, UNIQUE)])
    new = _docs(spark, [(10, BOILER), (11, BOILER),
                        (12, "totally fresh words nobody else wrote here today")])
    got = {(r["new_id"], r["dup_of"])
           for r in minhash_lsh_incremental(new, corpus, "doc_id", "text", n=5).collect()}
    assert got == {(11, 10)}  # 11 dupes 10; survivor 10 and unique 12 pass
    # opt-out keeps the pure cross-boundary semantics
    off = minhash_lsh_incremental(
        new, corpus, "doc_id", "text", n=5, include_intra_batch=False
    ).collect()
    assert off == []


def test_incremental_agrees_with_self_join_on_cross_pairs(spark):
    """Collisions across the batch boundary must equal the full self-join's
    pairs restricted to (new, corpus) — the incremental path skips work,
    not results."""
    rows = [(i, BOILER) for i in (1, 2, 10)] + [(i, UNIQUE) for i in (3, 20)]
    docs = _docs(spark, rows)
    new = docs.filter("doc_id >= 10")
    corpus = docs.filter("doc_id < 10")
    inc = {(r["new_id"], r["dup_of"])
           for r in minhash_lsh_incremental(new, corpus, "doc_id", "text", n=5).collect()}
    full = minhash_lsh_pairs(docs, "doc_id", "text", n=5).collect()
    cross = {(max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
             for r in full
             if (r["id_a"] >= 10) != (r["id_b"] >= 10)}
    assert inc == cross
    assert (20, 3) in inc  # UNIQUE text dupes across the boundary too


def test_shingle_df_score_hand_computed(spark):
    # doc 1 and 2 identical (every shingle df=2); doc 3 disjoint (df=1);
    # doc 4 too short for a 5-gram -> no row
    docs = _docs(spark, [(1, BOILER), (2, BOILER), (3, UNIQUE), (4, "too short")])
    got = {r["id"]: r.asDict() for r in shingle_df_score(docs, "doc_id", "text", n=5).collect()}
    assert set(got) == {1, 2, 3}
    n_boiler = len(BOILER.split()) - 4  # distinct 5-grams (no repeats here)
    assert got[1]["n_shingles"] == n_boiler
    assert got[1]["boilerplate_score"] == 2.0  # every shingle shared with doc 2
    assert got[2]["boilerplate_score"] == 2.0
    assert got[3]["boilerplate_score"] == 1.0  # fully unique
    assert got[3]["n_shingles"] == len(UNIQUE.split()) - 4


def test_decontaminate_planted_phrase(spark):
    """A corpus doc containing an eval doc's phrase is flagged with the
    right hit counts; clean docs survive; eval-side docs never appear."""
    from brontes_spark.operators.dedup import decontaminate

    EVAL_PHRASE = "what is the capital of france paris obviously"
    corpus = _docs(spark, [
        (1, "some training text that quotes " + EVAL_PHRASE + " verbatim"),
        (2, UNIQUE),
    ])
    eval_docs = _docs(spark, [(100, EVAL_PHRASE), (101, "unrelated eval item")])
    out = {r["id"]: r.asDict()
           for r in decontaminate(corpus, eval_docs, "doc_id", "text", n=3).collect()}
    assert set(out) == {1}
    # 8-token phrase -> 6 distinct 3-grams shared, all from eval doc 100
    assert out[1]["n_hits"] == 6
    assert out[1]["n_eval_docs"] == 1


def test_decontaminate_eval_side_broadcasts(spark):
    """The eval shingle set must reach the join as a broadcast — the 100 TB
    contract: the corpus side streams with no pre-join shuffle."""
    from brontes_spark.operators.dedup import decontaminate

    corpus = _docs(spark, [(1, BOILER), (2, UNIQUE)])
    eval_docs = _docs(spark, [(100, BOILER)])
    plan = decontaminate(corpus, eval_docs, "doc_id", "text", n=3)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
