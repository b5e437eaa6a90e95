"""MRR / hit@k (operators/ranking_eval.py) against hand-exact values,
including no-relevant queries (contribute 0) and the quantized sum."""

from __future__ import annotations


def test_mrr_and_hits(spark):
    from brontes_spark.operators.ranking_eval import ranking_metrics

    rows = []
    # q1: first relevant at rank 1; q2: at rank 3; q3: at rank 7 (dup
    # relevants later must not matter); q4: NO relevant -> contributes 0
    plan = {"q1": 1, "q2": 3, "q3": 7, "q4": None}
    for q, fr in plan.items():
        for rank in range(1, 11):
            rel = fr is not None and (rank == fr or rank == fr + 2)
            rows.append((q, rank, rel))
    df = spark.createDataFrame(rows, "q string, rank long, rel boolean")
    row = ranking_metrics(df, "q", "rank", "rel", ks=(1, 5, 10)).collect()[0]
    assert row["n_queries"] == 4
    want_sum = 10**9 // 1 + 10**9 // 3 + 10**9 // 7
    assert row["mrr_sum_9"] == want_sum
    assert abs(row["mrr"] - want_sum / 1e9 / 4) < 1e-15
    assert row["hit_at_1"] == 1
    assert row["hit_at_5"] == 2
    assert row["hit_at_10"] == 3


def test_mrr_all_irrelevant_is_zero(spark):
    from brontes_spark.operators.ranking_eval import ranking_metrics

    df = spark.createDataFrame(
        [("q", r, False) for r in range(1, 4)], "q string, rank long, rel boolean"
    )
    row = ranking_metrics(df, "q", "rank", "rel", ks=(1,)).collect()[0]
    assert row["n_queries"] == 1
    assert row["mrr_sum_9"] == 0 and row["mrr"] == 0.0 and row["hit_at_1"] == 0
