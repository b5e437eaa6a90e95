"""BM25 retrieval (operators/bm25.py): classic-form scores against an
independent pure-Python reference, exact-rational score9 against
fractions.Fraction arithmetic, the single-term ranking-equivalence claim,
and top-k determinism."""

from __future__ import annotations

import math
from fractions import Fraction

import pytest

from brontes_spark.operators.bm25 import bm25_scores, bm25_topk

DOCS = [
    (1, "apple banana apple"),
    (2, "apple cherry"),
    (3, "banana banana banana cherry"),
    (4, "durian"),
    (5, ""),  # token-free doc still counts toward N
]
QUERIES = [(10, "apple"), (10, "cherry"), (11, "banana"), (12, "durian")]


def _stats():
    toks = {i: t.split() for i, t in DOCS if t}
    n = len(DOCS)
    total = sum(len(v) for v in toks.values())
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    return toks, n, total, df


def _classic_ref():
    """Independent classic BM25 (k1=1.2, b=0.75, Lucene idf)."""
    toks, n, total, df = _stats()
    avgdl = total / n
    out = {}
    for qid, term in QUERIES:
        for d, ts in toks.items():
            tf = ts.count(term)
            if not tf:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            sat = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
            key = (qid, d)
            out[key] = out.get(key, 0.0) + idf * sat
    return out


def _rational_ref():
    """Exact Fraction arithmetic of the documented rational form."""
    toks, n, total, df = _stats()
    out = {}
    for qid, term in QUERIES:
        for d, ts in toks.items():
            tf = ts.count(term)
            if not tf:
                continue
            dl = len(ts)
            contrib = Fraction(
                44 * tf * total * (2 * n - 2 * df[term] + 1),
                (20 * tf * total + 6 * total + 18 * dl * n) * (2 * df[term] + 1),
            )
            key = (qid, d)
            out[key] = out.get(key, 0) + (contrib * 10**9).__floor__()
    return out


@pytest.fixture()
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id long, term string")
    return docs, q


def test_classic_scores_match_python_reference(frames):
    docs, q = frames
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_scores(docs, q, "doc_id", "text", rational=False).collect()
    }
    want = _classic_ref()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_rational_score9_is_exact(frames):
    docs, q = frames
    got = {
        (r.query_id, r.doc_id): int(r.score9)
        for r in bm25_scores(docs, q, "doc_id", "text", rational=True).collect()
    }
    assert got == _rational_ref()


def test_single_term_ranking_matches_classic(frames):
    """idf_rat and ln(idf) are both monotone decreasing in df, and tf_sat
    is shared — so per single-term query the doc ordering must agree."""
    docs, q = frames
    def ranks(rational):
        rows = bm25_topk(docs, q, "doc_id", "text", k=10, rational=rational).collect()
        return {(r.query_id, r.rnk): r.doc_id for r in rows if r.query_id != 10}
    assert ranks(True) == ranks(False)


def test_n_hit_and_coverage(frames):
    docs, q = frames
    rows = bm25_scores(docs, q, "doc_id", "text").collect()
    by = {(r.query_id, r.doc_id): r.n_hit for r in rows}
    assert by[(10, 2)] == 2   # apple + cherry both hit doc 2
    assert by[(10, 1)] == 1   # apple only
    assert (10, 4) not in by  # durian doc matches no q10 term
    assert by[(12, 4)] == 1
    assert not [k for k in by if k[1] == 5]  # empty doc matches nothing


def test_topk_tie_break_is_doc_id(spark):
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(1, 7)], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, "same")], "query_id long, term string")
    rows = bm25_topk(docs, q, "doc_id", "text", k=3).collect()
    assert [(r.rnk, r.doc_id) for r in sorted(rows, key=lambda r: r.rnk)] == [
        (1, 1), (2, 2), (3, 3)
    ]
