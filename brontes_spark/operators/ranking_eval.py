"""Ranking-quality evaluation metrics — MRR and hit@k over a (query,
ranked candidate, relevance) table: the offline eval loop for the
suite's retrieval stack (BM25 txt_bm25_topk, ANN top-k, RRF fusion
o12), scoring a ranking against ground-truth labels at corpus scale.

Determinism discipline: reciprocal ranks are quantized — each query
contributes floor(1e9 / first_relevant_rank) as an exact int64 (the
o19/RA scaling pattern), so the corpus MRR is an order-independent
integer sum closed by ONE double division. Queries with NO relevant
candidate contribute 0 (the standard convention, stated rather than
implied). hit@k counts queries whose first relevant rank <= k.

Scale shape: one rank-filtered min aggregate per query (map-side
combinable) + one 1-row corpus reduction — no joins, no windows over
the full candidate list (the caller's ranking already carries ranks;
if not, a per-query row_number window adds the one key shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RR_SCALE = 1_000_000_000  # 1e9: rr term = floor(RR_SCALE / rank)


def ranking_metrics(
    ranked: DataFrame,
    query: str,
    rank: str,
    relevant: str,
    ks: tuple[int, ...] = (1, 5, 10),
) -> DataFrame:
    """One row: (n_queries, mrr_sum_9, mrr, hit_at_{k}...) from a table of
    (query, rank [1-based], relevant [boolean-ish]) rows."""
    first_rel = (
        ranked.filter(F.col(relevant).cast("boolean"))
        .groupBy(F.col(query).alias("q"))
        .agg(F.min(F.col(rank)).alias("fr"))
    )
    nq = ranked.select(F.col(query).alias("q")).distinct().agg(
        F.count(F.lit(1)).alias("n_queries")
    )
    per_q = first_rel.select(
        F.expr(f"CAST({RR_SCALE} AS BIGINT) div fr").alias("rr_9"),
        F.col("fr"),
    )
    aggs = [F.coalesce(F.sum("rr_9"), F.lit(0)).alias("mrr_sum_9")]
    for k in ks:
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("fr") <= k, 1).otherwise(0)), F.lit(0)
            ).alias(f"hit_at_{k}")
        )
    stats = per_q.agg(*aggs)
    return nq.crossJoin(F.broadcast(stats)).select(
        "n_queries",
        "mrr_sum_9",
        (F.col("mrr_sum_9").cast("double") / 1.0e9 / F.col("n_queries").cast("double")).alias("mrr"),
        *[F.col(f"hit_at_{k}") for k in ks],
    )
