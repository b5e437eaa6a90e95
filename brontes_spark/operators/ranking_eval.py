"""Ranking-quality evaluation metrics — MRR, hit@k, and NDCG@k over a
(query, ranked candidate, relevance) table: the offline eval loop for
the suite's retrieval stack (BM25 txt_bm25_topk, ANN top-k, RRF fusion
o12), scoring a ranking against ground-truth labels at corpus scale.
MRR rewards the FIRST relevant hit; NDCG@k rewards packing ALL hits
high — both ship because they move independently.

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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RR_SCALE = 1_000_000_000  # 1e9: rr term = floor(RR_SCALE / rank)
DISCOUNT_SCALE = 1_000_000_000_000  # 1e12: dcg term = floor(1e12 / log2(r+1))


def ndcg_discounts(k: int) -> list[int]:
    """The binary-relevance DCG discount table for ranks 1..k:
    floor(1e12 / log2(rank + 1)) — computed ONCE driver-side and
    interpolated into the plan (and any oracle) as literal constants.
    log2 is transcendental, so it is deliberately NEVER evaluated by an
    engine: both sides of a parity check share these exact integers, the
    same way the multimodal codecs share their constant tables. k is a
    query parameter (10-100), never data-sized."""
    return [math.floor(DISCOUNT_SCALE / math.log2(r + 1)) for r in range(1, k + 1)]


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


def ndcg_at_k(
    ranked: DataFrame,
    query: str,
    rank: str,
    relevant: str,
    k: int = 10,
) -> DataFrame:
    """One row: (n_queries, n_scored, ndcg_sum_9, mean_ndcg_9,
    mean_ndcg) — binary-relevance NDCG@k over a (query, rank [1-based],
    relevant) table, completing the ranking-eval family (MRR rewards the
    FIRST hit; NDCG@k rewards packing ALL hits high).

    Exact-integer discipline: per query,
        dcg_12  = sum of D[r] over relevant rows with rank r <= k
        idcg_12 = P[min(n_relevant, k)]   (prefix sums of D)
        ndcg_9  = floor(1e9 * dcg_12 / idcg_12)
    where D = ndcg_discounts(k) are driver-side literal integer
    constants (floor(1e12/log2(r+1)) — log2 never evaluated by an
    engine) and P their prefix sums. Queries with no relevant candidate
    ANYWHERE are unscored (idcg undefined): they are excluded from the
    mean and reported via n_scored — the stated convention, unlike
    MRR's contribute-0 (an all-irrelevant query has no ideal ranking to
    normalize by). mean_ndcg_9 = floor(ndcg_sum_9 / n_scored) exact;
    mean_ndcg closes with one fixed-shape IEEE chain.

    Scale shape: one rank-filtered conditional aggregate per query
    (map-side combinable; the discount lookup is element_at into a
    k-element literal array, JVM-side) + one 1-row corpus reduction.
    NULL when no query is scorable."""
    if k < 1:
        raise ValueError(f"ndcg_at_k: k must be >= 1, got {k}")
    d = ndcg_discounts(k)
    prefix = []
    acc = 0
    for v in d:
        acc += v
        prefix.append(acc)
    d_arr = F.array(*[F.lit(v).cast("long") for v in d])
    p_arr = F.array(*[F.lit(v).cast("long") for v in prefix])
    rel = F.col(relevant).cast("boolean")
    per_q = (
        ranked.groupBy(F.col(query).alias("q"))
        .agg(
            F.sum(
                F.when(
                    rel & (F.col(rank) <= k),
                    F.element_at(d_arr, F.col(rank).cast("int")),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("dcg_12"),
            F.sum(rel.cast("long")).alias("n_rel"),
        )
    )
    scored = per_q.filter(F.col("n_rel") > 0).select(
        "dcg_12",
        F.element_at(
            p_arr, F.least(F.col("n_rel"), F.lit(k)).cast("int")
        ).alias("idcg_12"),
    )
    ndcg9 = F.expr(
        "CAST(CAST(dcg_12 AS DECIMAL(38,0)) * 1000000000"
        " div CAST(idcg_12 AS DECIMAL(38,0)) AS BIGINT)"
    )
    stats = scored.select(ndcg9.alias("ndcg_9")).agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.coalesce(F.sum("ndcg_9"), F.lit(0)).alias("ndcg_sum_9"),
    )
    nq = ranked.select(F.col(query).alias("q")).distinct().agg(
        F.count(F.lit(1)).alias("n_queries")
    )
    ok = F.col("n_scored") > 0
    return nq.crossJoin(F.broadcast(stats)).select(
        "n_queries",
        "n_scored",
        "ndcg_sum_9",
        F.when(ok, F.expr("CAST(ndcg_sum_9 div n_scored AS BIGINT)")).alias(
            "mean_ndcg_9"
        ),
        F.when(
            ok,
            F.col("ndcg_sum_9").cast("double")
            / 1.0e9
            / F.col("n_scored").cast("double"),
        ).alias("mean_ndcg"),
    )
