"""Bloom-filter sketch tests (operators/bloom.py): determinism, zero false
negatives, sane false-positive rate, OR-mergeability of partial builds,
join-probe ≡ literal-probe, and decontaminate_bloom ≡ exact decontaminate
on real testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from brontes_spark.operators.bloom import (
    bloom_build,
    bloom_member_join,
    bloom_merge,
    bloom_words,
    decontaminate_bloom,
    with_bloom_member,
)

M, K = 1 << 12, 4


def _vals(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_no_false_negatives(spark):
    members = [f"m{i}" for i in range(300)]
    words = bloom_words(bloom_build(_vals(spark, members), "v", M, K), M)
    got = with_bloom_member(_vals(spark, members), "v", words, K).collect()
    assert all(r.bloom_member for r in got)


def test_false_positive_rate_bounded(spark):
    members = [f"m{i}" for i in range(300)]
    others = [f"x{i}" for i in range(2000)]
    words = bloom_words(bloom_build(_vals(spark, members), "v", M, K), M)
    got = with_bloom_member(_vals(spark, others), "v", words, K).collect()
    fp = sum(r.bloom_member for r in got)
    # theoretical rate at n=300, m=4096, k=4 is ~ (1-e^(-kn/m))^k ≈ 4.4%;
    # assert a loose 3x envelope — the test is deterministic, so this is a
    # one-time check of the construction, not a flaky statistical bound
    assert fp / len(others) < 0.15


def test_build_is_deterministic_and_mergeable(spark):
    vals = [f"v{i}" for i in range(500)]
    full = bloom_words(bloom_build(_vals(spark, vals), "v", M, K), M)
    again = bloom_words(bloom_build(_vals(spark, vals), "v", M, K), M)
    assert full == again
    a = bloom_build(_vals(spark, vals[:250]), "v", M, K)
    b = bloom_build(_vals(spark, vals[250:]), "v", M, K)
    assert bloom_words(bloom_merge(a, b), M) == full


def test_join_probe_equals_literal_probe(spark):
    members = [f"m{i}" for i in range(200)]
    probes = members[:50] + [f"y{i}" for i in range(500)]
    words_df = bloom_build(_vals(spark, members), "v", M, K)
    words = bloom_words(words_df, M)
    lit = {
        r.v: r.bloom_member
        for r in with_bloom_member(_vals(spark, probes), "v", words, K).collect()
    }
    jn = {
        r.v: r.bloom_member
        for r in bloom_member_join(_vals(spark, probes), "v", words_df, M, K).collect()
    }
    assert lit == jn
    assert all(lit[m] for m in members[:50])


def test_bad_params_rejected(spark):
    df = _vals(spark, ["a"])
    with pytest.raises(ValueError):
        bloom_build(df, "v", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(df, "v", m_bits=1 << 12, n_hashes=0)


def test_decontaminate_bloom_equals_exact(spark, sf_dir):
    from brontes_spark.operators.dedup import decontaminate
    from brontes_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 89 == 0)
    corpus = docs.filter(F.col("doc_id") % 89 != 0)
    exact = sorted(
        tuple(r)
        for r in decontaminate(corpus, eval_docs, "doc_id", "text", n=3).collect()
    )
    bloomed = sorted(
        tuple(r)
        for r in decontaminate_bloom(
            corpus, eval_docs, "doc_id", "text", n=3, m_bits=1 << 14
        ).collect()
    )
    assert exact == bloomed and len(exact) > 0
