"""Golden tests for skip-gram co-occurrence + PMI lift
(operators/cooccur.py): hand-computed pair counts, marginals, and the
integer-scaled lift on a 4-token corpus; shape/edge behavior for short
docs and window boundaries."""

from __future__ import annotations

from brontes_spark.operators.cooccur import pmi_cooccur, skipgram_pairs


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_skipgram_pairs_window2(spark):
    # "a b a b", j=1: (a,b) (b,a) (a,b); j=2: (a,a) (b,b)
    df = _docs(spark, ["a b a b"])
    got = sorted(tuple(r) for r in skipgram_pairs(df, "text", window=2).collect())
    assert got == [("a", "a"), ("a", "b"), ("a", "b"), ("b", "a"), ("b", "b")]


def test_skipgram_short_doc_and_empty(spark):
    # single-token and empty docs produce no pairs, and window longer
    # than the doc truncates cleanly (the slice-length guard)
    df = _docs(spark, ["solo", "", "x y"])
    got = sorted(tuple(r) for r in skipgram_pairs(df, "text", window=5).collect())
    assert got == [("x", "y")]


def test_pmi_golden(spark):
    df = _docs(spark, ["a b a b"])
    rows = {
        (r["w1"], r["w2"]): r
        for r in pmi_cooccur(df, "text", window=2, min_count=1).collect()
    }
    ab = rows[("a", "b")]
    # n_xy=2, T=5, n_x(a)=3, n_y(b)=3 -> floor(2*5e9/9)
    assert (ab["n_xy"], ab["n_x"], ab["n_y"]) == (2, 3, 3)
    assert ab["lift9"] == (2 * 5 * 10**9) // 9
    ba = rows[("b", "a")]
    assert (ba["n_xy"], ba["n_x"], ba["n_y"]) == (1, 2, 2)
    assert ba["lift9"] == (1 * 5 * 10**9) // 4


def test_min_count_prunes_after_marginals(spark):
    df = _docs(spark, ["a b a b"])
    rows = pmi_cooccur(df, "text", window=2, min_count=2).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]
    # marginals still reflect the UNPRUNED pair distribution
    assert rows[0]["n_x"] == 3 and rows[0]["n_y"] == 3
