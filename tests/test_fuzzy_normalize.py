"""edit_dup_pairs / verify_pairs_levenshtein (operators/fuzzy.py) and
clean_text / with_nfc (functions/normalize.py): hand-computed distances,
prefilter losslessness, dense-small-edit recall that shingles miss, NFC
composition, and engine-parity spot pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from brontes_spark.functions.normalize import clean_text, with_nfc
from brontes_spark.operators.fuzzy import edit_dup_pairs, verify_pairs_levenshtein


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_edit_pairs_hand_computed(spark):
    df = _docs(spark, [
        (1, "en", "kitten"), (2, "en", "sitting"),   # dist 3
        (3, "en", "kitten"),                          # dist 0 to 1
        (4, "en", "zzzzzz"),                          # far from all
        (5, "de", "kitten"),                          # other block
    ])
    got = {(r.id_a, r.id_b): r.dist for r in
           edit_dup_pairs(df, "doc_id", "text", "lang", max_dist=3).collect()}
    assert got == {(1, 2): 3, (1, 3): 0, (2, 3): 3}


def test_length_prefilter_lossless(spark):
    # distance >= |len diff|: a pair at exactly max_dist length gap must
    # survive the prefilter and match when the edit is pure insertion
    df = _docs(spark, [(1, "en", "abc"), (2, "en", "abcxy")])
    got = {(r.id_a, r.id_b): r.dist for r in
           edit_dup_pairs(df, "doc_id", "text", "lang", max_dist=2).collect()}
    assert got == {(1, 2): 2}


def test_dense_small_edits_where_shingles_fail(spark):
    # every 6th char substituted: every word mutates, so all word 3-gram
    # shingles break while the edit distance stays ~len/6
    base = "the quick brown fox jumps over the lazy dog again and again"
    mutated = "".join(
        "q" if i % 6 == 0 and c.islower() and c != "q" else c
        for i, c in enumerate(base)
    )
    df = _docs(spark, [(1, "en", base), (2, "en", mutated)])
    pairs = edit_dup_pairs(df, "doc_id", "text", "lang", max_dist=15).collect()
    assert len(pairs) == 1 and pairs[0].dist <= 15

    from brontes_spark.operators.dedup import ngram_jaccard_pairs
    jac = ngram_jaccard_pairs(df, "doc_id", "text", block_col="lang",
                              n=3, threshold=0.5)
    assert jac.count() == 0  # the shingle path misses this pair entirely


def test_verify_pairs_behind_candidate_stream(spark):
    df = _docs(spark, [(1, "en", "aaaa"), (2, "en", "aaab"), (3, "en", "zzzz")])
    cand = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = {(r.id_a, r.id_b): r.dist for r in
           verify_pairs_levenshtein(cand, df, "doc_id", "text", max_dist=2).collect()}
    assert out == {(1, 2): 1}


def test_levenshtein_engine_parity_spot(spark):
    # ASCII: identical unit-cost Wagner-Fischer in both engines
    cases = [("kitten", "sitting"), ("ab", "ba"), ("", "abc"),
             ("flaw", "lawn"), ("aaaa", "aaaa")]
    sp = spark.createDataFrame(cases, "a string, b string").select(
        F.levenshtein("a", "b").alias("d")).collect()
    con = duckdb.connect()
    du = [con.execute("SELECT levenshtein(?, ?)", list(c)).fetchone()[0]
          for c in cases]
    assert [r.d for r in sp] == du
    # DOCUMENTED divergence (pinned so a silent engine change is caught):
    # Spark counts codepoints (café->cafe = 1 substitution), DuckDB counts
    # bytes (2-byte é -> 2 ops). Oracle parity for edit_dup_pairs therefore
    # holds on ASCII text; unicode corpora should clean_text/with_nfc first
    # and accept the operator's Spark-side (codepoint) semantics.
    sp_u = spark.createDataFrame([("café", "cafe")], "a string, b string").select(
        F.levenshtein("a", "b").alias("d")).collect()[0].d
    du_u = con.execute("SELECT levenshtein('café', 'cafe')").fetchone()[0]
    assert sp_u == 1 and du_u == 2


def test_clean_text(spark):
    raw = "​Hello" + chr(0) + "  “world” –\tok\r\n"
    df = spark.createDataFrame([(raw,)], "t string")
    got = df.select(clean_text(F.col("t")).alias("c")).collect()[0].c
    assert got == 'Hello "world" - ok'


def test_clean_text_duckdb_twin(spark):
    rows = ["​a  b“x”– y　z", "plain", "  lead trail  ", "–—‘’"]
    df = spark.createDataFrame([(r,) for r in rows], "t string")
    sp = [r.c for r in df.select(clean_text(F.col("t")).alias("c")).collect()]
    con = duckdb.connect()
    # quote-fold translate args via chr() so no quote-escaping dialect is
    # involved: ''''"""--  (curly quotes/dashes -> ascii)
    q_from = "||".join(f"chr({ord(c)})" for c in "‘’‚“”„–—")
    q_to = "||".join(f"chr({ord(c)})" for c in "'''\"\"\"--")
    zw = "||".join(f"chr({ord(c)})" for c in "​‌‍﻿")
    sql = (
        "SELECT trim(regexp_replace(translate(regexp_replace(translate("
        r"regexp_replace(?, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', ''), "
        f"{zw}, ''), "
        r"'[\t\n\r\p{Zs}]', ' ', 'g'), "
        f"{q_from}, {q_to}), "
        "'  +', ' ', 'g'))"
    )
    du = [con.execute(sql, [r]).fetchone()[0] for r in rows]
    assert sp == du


def test_nfc_composition(spark):
    decomposed = "café + Å"        # e+combining acute, A+ring
    composed = "café + Å"
    df = spark.createDataFrame([(1, decomposed)], "i long, t string")
    got = with_nfc(df, "t").collect()[0].t
    assert got == composed
    # matches DuckDB's utf8proc implementation
    con = duckdb.connect()
    assert got == con.execute("SELECT nfc_normalize(?)", [decomposed]).fetchone()[0]


def test_nfc_null_safe_and_schema_stable(spark):
    df = spark.createDataFrame([(1, None), (2, "ok")], "i long, t string")
    out = with_nfc(df, "t", out_col="t2")
    rows = {r.i: r.t2 for r in out.collect()}
    assert rows == {1: None, 2: "ok"}
    assert out.columns == ["i", "t", "t2"]


def test_bad_max_dist(spark):
    df = _docs(spark, [(1, "en", "x")])
    with pytest.raises(ValueError):
        edit_dup_pairs(df, "doc_id", "text", "lang", max_dist=-1)
