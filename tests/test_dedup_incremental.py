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


def test_scrub_pii_planted(spark):
    """Planted email/phone/IP are redacted with typed placeholders; counts
    match replacements; clean text rides through untouched."""
    from pyspark.sql import functions as F

    from brontes_spark.functions.text import scrub_pii

    df = _docs(spark, [
        (1, "mail a.b+c@x-corp.io or call +1 (415) 555-0099 from 10.0.0.1 now"),
        (2, "two mails x@y.io z@w.co and versions 1.2.3 (not 1.2.3.4.5 scheme)"),
        (3, UNIQUE),
    ])
    s, c = scrub_pii(F.col("text"))
    out = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", s.alias("t"),
        c["email"].alias("e"), c["ip"].alias("i"), c["phone"].alias("p"),
    ).collect()}
    assert out[1]["t"] == "mail <EMAIL> or call <PHONE> from <IP> now"
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (1, 1, 1)
    # version string "1.2.3" is not an IPv4; "1.2.3.4.5"'s leading 4 octets
    # ARE matched by the dotted-quad pattern (documented over-match of
    # \b-bounded IPv4 inside longer dotted runs)
    assert out[2]["e"] == 2 and out[2]["i"] == 1
    assert "<IP>.5" in out[2]["t"] and "1.2.3 " in out[2]["t"]
    assert out[3]["t"] == UNIQUE
    assert (out[3]["e"], out[3]["i"], out[3]["p"]) == (0, 0, 0)


def test_pack_sequences_hand_computed(spark):
    """Concat-and-chunk bookkeeping on a hand-packed shard: offsets are the
    running token sum, bin boundaries cut every context_len, a document
    crossing a boundary spans two bins, zero-token docs vanish, and shards
    pack independently."""
    from brontes_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a", 6), (2, "a", 3), (3, "a", 4), (4, "a", 0), (10, "b", 9)],
        "doc_id long, lang string, n_tokens int",
    )
    out = {r["id"]: r.asDict()
           for r in pack_sequences(docs, "doc_id", "n_tokens", "lang",
                                   context_len=8).collect()}
    assert set(out) == {1, 2, 3, 10}  # zero-token doc 4 dropped
    assert (out[1]["start_offset"], out[1]["bin_id"], out[1]["offset_in_bin"],
            out[1]["bins_spanned"]) == (0, 0, 0, 1)
    # doc 2 occupies [6, 9): starts in bin 0, crosses into bin 1
    assert (out[2]["start_offset"], out[2]["bin_id"], out[2]["offset_in_bin"],
            out[2]["bins_spanned"]) == (6, 0, 6, 2)
    assert (out[3]["start_offset"], out[3]["bin_id"]) == (9, 1)
    # shard b restarts at offset 0; 9 tokens span bins 0-1
    assert (out[10]["start_offset"], out[10]["bins_spanned"]) == (0, 2)


def test_pack_sequences_rejects_bad_context(spark):
    import pytest

    from brontes_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame([(1, "a", 5)], "doc_id long, lang string, n_tokens int")
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "n_tokens", "lang", context_len=0)


def test_repetition_score_hand_computed(spark):
    """Planted repetition: 'spam spam spam spam' is maximally repetitive
    (one distinct token, one distinct bigram), a no-repeat doc scores
    distinct ratio 1.0 and dup_bigram_frac 0."""
    import brontes_spark.plans  # noqa: F401
    from brontes_spark.plans.registry import REGISTRY

    build = REGISTRY["txt_repetition_score"].build
    import os
    import tempfile

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, UNIQUE), (3, "one"),
         (4, "a b a b a b")],
        "doc_id long, text string",
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["id"]: r.asDict() for r in build(spark, d).collect()}
    assert set(out) == {1, 2, 4}  # single-token doc 3 has no bigrams
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct_tokens"] == 1
    assert out[1]["distinct_token_ratio"] == 0.25
    assert out[1]["top_bigram_frac"] == 1.0      # 'spam spam' x3 of 3
    assert out[1]["dup_bigram_frac"] == 2 / 3    # 3 bigrams, 1 distinct
    assert out[2]["distinct_token_ratio"] == 1.0
    assert out[2]["dup_bigram_frac"] == 0.0
    # 'a b a b a b': bigrams [ab, ba, ab, ba, ab] -> top 'a b' 3/5
    assert out[4]["top_bigram_frac"] == 0.6


def test_mixture_sample_hits_target_composition(spark):
    """Keep-rates derive from live counts: with uniform 100-doc strata and
    target 50/30/20, N_out = min(100/0.5, 100/0.3, 100/0.2) = 200, so the
    binding stratum (a) keeps EVERYTHING (rate 1.0) and the others keep
    ~60%/~40% — md5-thresholded, so composition is approximate but
    deterministic; strata outside the target vanish."""
    from brontes_spark.operators.dedup import mixture_sample

    rows = [(s * 1000 + i, s_name) for s, s_name in enumerate(["a", "b", "c", "junk"])
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = mixture_sample(df, "doc_id", "src", {"a": 0.5, "b": 0.3, "c": 0.2})
    got = {r["src"]: r["cnt"] for r in
           out.groupBy("src").agg(__import__("pyspark").sql.functions.count("*").alias("cnt")).collect()}
    assert "junk" not in got
    assert got["a"] == 100                  # binding stratum: rate exactly 1.0
    assert 45 <= got["b"] <= 75             # ~60 expected, md5-binomial spread
    assert 25 <= got["c"] <= 55             # ~40 expected
    # determinism: same salt, same sample
    again = {r["doc_id"] for r in out.collect()}
    assert again == {r["doc_id"] for r in mixture_sample(
        df, "doc_id", "src", {"a": 0.5, "b": 0.3, "c": 0.2}).collect()}


def test_scrub_pii_adversarial_precedence(spark):
    """Overlapping-span and confusable fixtures pin the scrub order
    (email > ip > phone), the evolving-text count contract, and the
    documented ASCII scope (VERDICT r5 directive 8).

    - a digits-only email host is NOT an email (no alpha TLD): the IP
      pattern claims the quad, the mailbox prefix survives
    - a dotted quad is an IP, never a phone (order pins the overlap)
    - a dotted phone-like run that is NOT a valid quad falls through to
      the phone pattern
    - counts are taken on the text each pattern actually saw: an email
      whose local part is phone-shaped contributes 0 phones because the
      phone pass sees '<EMAIL>'
    - unicode-confusable addresses (fullwidth/Cyrillic) pass through
      unmatched: the ASCII-only scope is explicit, not an accident
    """
    from pyspark.sql import functions as F

    from brontes_spark.functions.text import scrub_pii

    rows = [
        (1, "user@192.168.1.1 logged in"),
        (2, "quad 10.20.30.40 vs phone 415.555.0099.123456"),
        (3, "+14155550099@mail.co and lone +1 415 555 0099"),
        (4, "ｕser@ｅxample.com and cyr user@exаmple.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s, c = scrub_pii(F.col("text"))
    out = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", s.alias("t"),
        c["email"].alias("e"), c["ip"].alias("i"), c["phone"].alias("p"),
    ).collect()}

    # digits-only host: IP wins, mailbox prefix survives
    assert out[1]["t"] == "user@<IP> logged in"
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (0, 1, 0)

    # valid quad -> <IP>; the 4-dot run is no quad, phone eats it whole
    assert out[2]["t"] == "quad <IP> vs phone <PHONE>"
    assert (out[2]["e"], out[2]["i"], out[2]["p"]) == (0, 1, 1)

    # phone-shaped local part: email consumes it FIRST; the phone count
    # sees '<EMAIL>' (evolving-text contract), so only the lone number hits
    assert out[3]["t"] == "<EMAIL> and lone <PHONE>"
    assert (out[3]["e"], out[3]["i"], out[3]["p"]) == (1, 0, 1)

    # confusables: no ASCII match, text unchanged (documented scope)
    assert out[4]["t"] == rows[3][1]
    assert (out[4]["e"], out[4]["i"], out[4]["p"]) == (0, 0, 0)


def test_html_to_text_adversarial(spark):
    """Handcrafted markup: script bodies containing tags, multi-line
    comments, attributes, entity decode order (&amp;lt; decodes ONE
    level), and the documented '>'-in-attribute limitation."""
    from pyspark.sql import functions as F

    from brontes_spark.functions.text import html_to_text

    cases = [
        # script body contains closing-tag-looking markup: whole block drops
        ('<p>keep</p><script a="b">var x = "<p>no</p>";</script>', "keep"),
        # style + multi-line comment + nested tags
        ("<style>p{a:1}</style>A<!-- x\n y -->B <b><i>C</i></b>", "A B C"),
        # entity ladder: one decode level, ampersand last
        ("1 &lt; 2 &amp;lt; &quot;q&quot; &#39;s&#39; &nbsp;.", "1 < 2 &lt; \"q\" 's' ."),
        # whitespace collapse incl. vertical tab
        ("a\x0b\t b\n\nc", "a b c"),
        # documented limitation: '>' inside an attribute truncates the tag
        ('<img alt="x > y">z', 'y">z'),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, html string"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select("i", html_to_text(F.col("html")).alias("out")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
