"""Reciprocal Rank Fusion — combining ranked lists without score
calibration.

RRF (Cormack et al. 2009): fused_score(d) = Σ_lists 1/(k + rank_d).
The standard way to merge heterogeneous retrievers (BM25 + dense ANN +
recency) because it needs NO score normalization — only ranks — and a
document missing from a list simply contributes nothing. k (default 60,
the paper's value) damps the head so one list's #1 cannot dominate.

Exactness: fused scores are sums of unit fractions — floats would make
cross-engine hashing impossible, so each term enters as
floor(1e9 / (k + rank)) and the fused score9 is an exact bigint sum.
The floor loses < 1e-9 per term, far below any meaningful rank
distinction at k >= 1 (ties that exact-rational RRF would break by less
than a nano are broken by id instead — deterministic either way).

Scale shape: union of the input lists (already tiny: top-N per query per
retriever), one hash aggregate on (query, id), one WindowGroupLimit
top-k — nothing data-sized; the retrievers upstream did the heavy work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str,
    id_col: str,
    rank_col: str,
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """(query, id, n_lists, score9, fused_rank) from N ranked lists.

    Each input holds (query, id, rank) with rank >= 1; duplicate
    (query, id) within ONE list is a caller bug (double-counted — keep
    lists deduplicated). `top` bounds the output per query."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = [
        df.select(
            F.col(query_col).alias("query"),
            F.col(id_col).alias("id"),
            F.expr(f"CAST(1000000000 div ({k} + {rank_col}) AS BIGINT)").alias(
                "_term"
            ),
        )
        for df in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    fused = u.groupBy("query", "id").agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.sum("_term").alias("score9"),
    )
    w = W.partitionBy("query").orderBy(
        F.col("score9").desc(), F.col("id")
    )
    out = fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
    if top is not None:
        out = out.filter(F.col("fused_rank") <= top)
    return out
