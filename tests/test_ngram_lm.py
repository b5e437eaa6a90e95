"""char_bigram_model / char_bigram_coverage (operators/ngram_lm.py):
tie-break determinism, exact coverage fractions, sample-only training,
and the quality-ranking sanity the operator exists for."""

from __future__ import annotations

import pytest

from brontes_spark.operators.ngram_lm import (
    char_bigram_coverage,
    char_bigram_model,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_top_m_with_tiebreak(spark):
    # "ababab" has bigrams ab x3, ba x2; "zz" once. sample_rate=1: all docs.
    df = _docs(spark, [(1, "ababab"), (2, "zz")])
    got = [r.bg for r in char_bigram_model(df, "doc_id", "text", top_m=2,
                                           sample_rate=1.0).collect()]
    assert set(got) == {"ab", "ba"}
    # tie case: equal counts order by bigram ascending
    df2 = _docs(spark, [(1, "xy"), (2, "ab")])
    got2 = [r.bg for r in char_bigram_model(df2, "doc_id", "text", top_m=1,
                                            sample_rate=1.0).collect()]
    assert got2 == ["ab"]


def test_coverage_exact_fraction(spark):
    # model trained on everything: top-1 bigram of "aaab aaab" corpus
    df = _docs(spark, [(1, "aaaa"), (2, "aaxy")])
    # bigrams: doc1 aa,aa,aa; doc2 aa,ax,xy -> top-1 = "aa"
    out = {
        r.id: (r.n_bigrams, r.covered, r.coverage)
        for r in char_bigram_coverage(
            df, "doc_id", "text", top_m=1, sample_rate=1.0
        ).collect()
    }
    assert out[1] == (3, 3, 1.0)
    assert out[2] == (3, 1, 1 / 3)


def test_lowercasing_and_short_docs(spark):
    df = _docs(spark, [(1, "ABAB"), (2, "x"), (3, "")])
    out = char_bigram_coverage(df, "doc_id", "text", top_m=10, sample_rate=1.0)
    rows = {r.id for r in out.collect()}
    assert rows == {1}  # sub-2-char docs have no bigrams and no row


def test_model_trained_on_sample_only(spark):
    # the sampled subset is a pure function of (salt, id): verify the model
    # changes when the salt moves the sample
    df = _docs(spark, [(i, "qq" * 5 if i % 2 else "zz" * 5) for i in range(40)])
    m_a = {r.bg for r in char_bigram_model(df, "doc_id", "text", top_m=1,
                                           sample_rate=0.25, salt="a").collect()}
    m_all = {r.bg for r in char_bigram_model(df, "doc_id", "text", top_m=2,
                                             sample_rate=1.0).collect()}
    assert m_a <= m_all and len(m_a) == 1


def test_quality_ranking_direction(spark):
    # in-register text scores higher than junk under a corpus-trained model
    corpus = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    corpus += [(100, "the quick brown fox"), (101, "zxqj vwkp ffgh")]
    df = _docs(spark, corpus)
    out = {r.id: r.coverage for r in char_bigram_coverage(
        df, "doc_id", "text", top_m=30, sample_rate=1.0).collect()}
    assert out[100] > out[101]


def test_bad_rate(spark):
    with pytest.raises(ValueError):
        char_bigram_model(_docs(spark, [(1, "ab")]), "doc_id", "text",
                          sample_rate=0.0)
