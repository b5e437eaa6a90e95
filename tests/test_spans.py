"""Unit tests for substring-level duplicate-span removal (operators/spans.py):
planted passages with hand-computed expected intervals, keep-first
canonical semantics, within-doc repeats, interval merging, and the stats
accounting."""

from __future__ import annotations

import pytest

from brontes_spark.operators.spans import (
    duplicate_spans,
    gram_occurrences,
    span_dedup_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df, k):
    out = duplicate_spans(df, "doc_id", "text", k=k)
    return sorted(tuple(r) for r in out.collect())


def test_planted_cross_doc_passage(spark):
    # doc 0 and doc 1 share the verbatim 6-token passage "p q r s t u";
    # with k=4 the three windows at offsets 2,3,4 of doc 1 merge to [2, 10)?
    # no: passage occupies tokens 2..7 of doc 1 -> windows [2,6),[3,7),[4,8)
    # merge to [2, 8). doc 0 (earlier id) keeps its copy untouched.
    d0 = "a b p q r s t u c d"
    d1 = "x y p q r s t u z w"
    df = _docs(spark, [(0, d0), (1, d1)])
    assert _spans(df, 4) == [(1, 2, 8)]


def test_keep_first_is_lexicographic_min(spark):
    # same passage in three docs: only the (doc 0) copy survives unflagged
    df = _docs(spark, [(7, "m n o p q"), (3, "m n o p q"), (9, "m n o p q")])
    assert _spans(df, 5) == [(7, 0, 5), (9, 0, 5)]


def test_within_doc_repeat(spark):
    # "a b c d" repeated twice inside one doc: second occurrence flagged
    df = _docs(spark, [(5, "a b c d x y a b c d")])
    assert _spans(df, 4) == [(5, 6, 10)]


def test_touching_windows_merge(spark):
    # doc 1 repeats two DIFFERENT doc-0 4-grams back to back: [0,4) and
    # [4,8) touch and merge into one contiguous removal region
    d0 = "a b c d z z z e f g h"
    d1 = "a b c d e f g h"
    df = _docs(spark, [(0, d0), (1, d1)])
    assert _spans(df, 4) == [(1, 0, 8)]


def test_disjoint_spans_stay_separate(spark):
    d0 = "a b c d z1 z2 z3 e f g h"
    d1 = "a b c d y1 y2 y3 e f g h"
    df = _docs(spark, [(0, d0), (1, d1)])
    assert _spans(df, 4) == [(1, 0, 4), (1, 7, 11)]


def test_no_duplicates_empty(spark):
    df = _docs(spark, [(0, "a b c d"), (1, "e f g h")])
    assert _spans(df, 4) == []


def test_short_docs_skipped(spark):
    # docs shorter than k tokens produce no grams (and cannot crash)
    df = _docs(spark, [(0, "a b"), (1, "a b"), (2, "")])
    assert _spans(df, 4) == []


def test_k_below_two_rejected(spark):
    df = _docs(spark, [(0, "a b")])
    with pytest.raises(ValueError):
        duplicate_spans(df, "doc_id", "text", k=1)


def test_gram_occurrences_positions(spark):
    df = _docs(spark, [(0, "a b c d e")])
    occ = gram_occurrences(df, "doc_id", "text", k=3).collect()
    assert sorted(r.pos for r in occ) == [0, 1, 2]
    # identical token windows hash identically across docs
    df2 = _docs(spark, [(0, "a b c"), (1, "a b c")])
    ghs = [r.gh for r in gram_occurrences(df2, "doc_id", "text", k=3).collect()]
    assert len(ghs) == 2 and ghs[0] == ghs[1]


def test_stats_accounting(spark):
    d0 = "a b c d e f g h"      # canonical copy: 0 dup tokens
    d1 = "a b c d e f g h"      # full dup: 8 of 8
    d2 = "q r s t u v w x"      # clean: 0 of 8
    df = _docs(spark, [(0, d0), (1, d1), (2, d2)])
    rows = {
        r.id: (r.n_tokens, r.dup_tokens, r.dup_frac)
        for r in span_dedup_stats(df, "doc_id", "text", k=4).collect()
    }
    assert rows[0] == (8, 0, 0.0)
    assert rows[1] == (8, 8, 1.0)
    assert rows[2] == (8, 0, 0.0)


def test_superset_of_longer_matches(spark):
    # a duplicated passage LONGER than k is reconstructed exactly by the
    # merge of its k-windows (the fixed-k ~ suffix-array equivalence the
    # module docstring claims): 10-token shared passage, k=4
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    df = _docs(spark, [(0, f"pre {shared} post"), (1, f"x {shared} y z")])
    assert _spans(df, 4) == [(1, 1, 11)]


def test_trim_removes_exactly_flagged_tokens(spark):
    from brontes_spark.operators.spans import trim_duplicate_spans

    d0 = "a b c d e f g h"
    d1 = "a b c d e f g h x y"   # shares the 8-token passage + extras
    d2 = "q r s t u v w z"       # clean
    df = _docs(spark, [(0, d0), (1, d1), (2, d2)])
    out = {r.id: (r.text_trimmed, r.n_tokens, r.kept_tokens)
           for r in trim_duplicate_spans(df, "doc_id", "text", k=4).collect()}
    assert out[0] == (d0, 8, 8)          # canonical copy untouched
    assert out[1] == ("x y", 10, 2)      # full passage removed
    assert out[2] == (d2, 8, 8)


def test_trim_full_duplicate_empties(spark):
    from brontes_spark.operators.spans import trim_duplicate_spans

    df = _docs(spark, [(0, "m n o p"), (1, "m n o p")])
    out = {r.id: (r.text_trimmed, r.kept_tokens)
           for r in trim_duplicate_spans(df, "doc_id", "text", k=4).collect()}
    assert out[0] == ("m n o p", 4)
    assert out[1] == ("", 0)


def test_trim_consistent_with_stats(spark):
    from brontes_spark.operators.spans import span_dedup_stats, trim_duplicate_spans

    df = _docs(spark, [
        (0, "a b c d w1 e f g h"), (1, "a b c d w2 w3 e f g h"),
        (2, "z1 z2 z3 z4 z5"),
    ])
    stats = {r.id: r.dup_tokens for r in
             span_dedup_stats(df, "doc_id", "text", k=4).collect()}
    trim = {r.id: r.n_tokens - r.kept_tokens for r in
            trim_duplicate_spans(df, "doc_id", "text", k=4).collect()}
    assert stats == trim  # removed == accounted, token for token
