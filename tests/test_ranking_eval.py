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


def _brute_ndcg(plan, k):
    """Hand NDCG@k from {query: set(relevant ranks)} using the operator's
    own discount table (the constants ARE the contract)."""
    from brontes_spark.operators.ranking_eval import ndcg_discounts

    d = ndcg_discounts(k)
    prefix = [sum(d[: i + 1]) for i in range(k)]
    scored = []
    for rels in plan.values():
        if not rels:
            continue
        dcg = sum(d[r - 1] for r in rels if r <= k)
        idcg = prefix[min(len(rels), k) - 1]
        scored.append((10**9 * dcg) // idcg)
    return scored


def test_ndcg_matches_hand_mirror(spark):
    from brontes_spark.operators.ranking_eval import ndcg_at_k

    # q1: ideal (all relevants packed at the top); q2: hits at 3 and 9;
    # q3: relevants exist but all BELOW k (dcg 0, still scored);
    # q4: no relevant at all -> unscored, excluded from the mean
    plan = {
        "q1": {1, 2},
        "q2": {3, 9},
        "q3": {11, 12},
        "q4": set(),
    }
    rows = [
        (q, rank, rank in rels)
        for q, rels in plan.items()
        for rank in range(1, 13)
    ]
    df = spark.createDataFrame(rows, "q string, rank long, rel boolean")
    k = 10
    row = ndcg_at_k(df, "q", "rank", "rel", k=k).collect()[0]
    scored = _brute_ndcg(plan, k)
    assert row["n_queries"] == 4
    assert row["n_scored"] == 3
    assert row["ndcg_sum_9"] == sum(scored)
    assert row["mean_ndcg_9"] == sum(scored) // 3
    assert abs(row["mean_ndcg"] - sum(scored) / 1e9 / 3) < 1e-15
    # q1 is a perfect ranking: its per-query ndcg_9 is exactly 1e9
    assert 10**9 in scored
    # q3 scores exactly 0 (relevants exist, none inside k)
    assert 0 in scored


def test_ndcg_no_scorable_queries_is_null(spark):
    from brontes_spark.operators.ranking_eval import ndcg_at_k

    df = spark.createDataFrame(
        [("q", r, False) for r in range(1, 4)], "q string, rank long, rel boolean"
    )
    row = ndcg_at_k(df, "q", "rank", "rel", k=5).collect()[0]
    assert row["n_queries"] == 1 and row["n_scored"] == 0
    assert row["mean_ndcg_9"] is None and row["mean_ndcg"] is None


def test_ndcg_discount_table_is_monotone_exact(spark):
    from brontes_spark.operators.ranking_eval import ndcg_discounts

    d = ndcg_discounts(20)
    assert d[0] == 10**12                      # 1/log2(2) exactly
    assert d[2] == 10**12 // 2                 # 1/log2(4) = 1/2 exactly
    assert all(a > b for a, b in zip(d, d[1:]))  # strictly decreasing
    with __import__("pytest").raises(ValueError):
        from brontes_spark.operators.ranking_eval import ndcg_at_k

        ndcg_at_k(None, "q", "r", "rel", k=0)
