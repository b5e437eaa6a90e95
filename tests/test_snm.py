"""Golden tests for sorted-neighborhood dedup (operators/snm.py):
neighborhood shape on a hand-ordered block, block isolation, window
truncation at block tails, and the keep-first duplicate flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.operators.snm import snm_duplicate_flags, sorted_neighborhood_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, blk string")


def test_window_pairs_and_gaps(spark):
    # one block, sort by doc_id: 4 records, window 2
    df = _docs(spark, [(i, f"t{i}", "b") for i in range(4)])
    got = sorted(
        (r["id_a"], r["id_b"], r["gap"])
        for r in sorted_neighborhood_pairs(
            df, "doc_id", "text", ["blk"], [F.col("doc_id")], window=2
        ).collect()
    )
    assert got == [(0, 1, 1), (0, 2, 2), (1, 2, 1), (1, 3, 2), (2, 3, 1)]


def test_blocks_never_mix(spark):
    df = _docs(spark, [(0, "a", "x"), (1, "b", "x"), (2, "c", "y"), (3, "d", "y")])
    pairs = sorted_neighborhood_pairs(
        df, "doc_id", "text", ["blk"], [F.col("doc_id")], window=3
    ).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in pairs) == [(0, 1), (2, 3)]


def test_dist_is_levenshtein(spark):
    df = _docs(spark, [(0, "kitten", "b"), (1, "sitting", "b")])
    (row,) = sorted_neighborhood_pairs(
        df, "doc_id", "text", ["blk"], [F.col("doc_id")], window=1
    ).collect()
    assert row["dist"] == 3


def test_duplicate_flags_keep_first(spark):
    # 0 and 1 identical, 2 one edit away from 1, 3 unrelated: keep-first
    # flags 1 and 2 (each matches a sort-earlier neighbor), never 0
    df = _docs(
        spark,
        [(0, "hello world", "b"), (1, "hello world", "b"),
         (2, "hello worlds", "b"), (3, "zzzzzzzzzzzz", "b")],
    )
    flags = {
        r["doc_id"]: r["is_dup"]
        for r in snm_duplicate_flags(
            df, "doc_id", "text", ["blk"], [F.length("text"), F.col("text")],
            window=2, max_dist=1,
        ).collect()
    }
    assert flags == {0: False, 1: True, 2: True, 3: False}
