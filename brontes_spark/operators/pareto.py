"""Pareto / concentration analysis — "how many members cover 80%?".

The OLAP staple behind vendor-risk, revenue-concentration, and corpus
domain-dominance questions ("how many domains supply 80% of tokens?" is
this exact query over the documents table). Per group, order members by
contribution descending and find the smallest prefix whose share clears
the threshold.

Exactness: the threshold test runs on cross-multiplied integers —
    den * cumsum >= num * total        (threshold = num/den, e.g. 4/5)
— no percentage doubles anywhere. Members tie-break by id ascending so
the prefix (and therefore n_cover) is a total-order function of the
data in both engines.

Scale shape: ONE key-partitioned ordered window (rank + running sum
share the sort) feeding a group aggregate on the same key — a single
exchange end to end, the changepoint/twap discipline. Input is the
(group, member, contribution) relation, typically already an aggregate
of the fact table; negative contributions are rejected semantics-wise
(a refund row makes "share of total" ill-posed — net them upstream) and
guarded by a filter here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def pareto_cover(
    df: DataFrame,
    group_col: str,
    member_col: str,
    contrib_col: str,
    num: int = 4,
    den: int = 5,
) -> DataFrame:
    """(group, n_members, total, n_cover, top1_share_9): n_cover = size of
    the smallest descending-contribution prefix with share >= num/den.

    Groups whose total is 0 report NULL n_cover (share undefined).
    """
    if not (0 < num <= den):
        raise ValueError(f"threshold must satisfy 0 < num <= den, got {num}/{den}")
    order = [F.desc(contrib_col), F.asc(member_col)]
    w_cum = W.partitionBy(group_col).orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_rank = W.partitionBy(group_col).orderBy(*order)
    w_all = W.partitionBy(group_col)
    ranked = (
        df.filter(F.col(contrib_col) >= 0)
        .withColumn("_cum", F.sum(contrib_col).over(w_cum))
        .withColumn("_rank", F.row_number().over(w_rank))
        .withColumn("_total", F.sum(contrib_col).over(w_all))
    )
    return ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("_total").alias("total"),
        F.min(
            F.when(
                (F.col("_total") > 0)
                & (F.lit(den) * F.col("_cum") >= F.lit(num) * F.col("_total")),
                F.col("_rank"),
            )
        ).alias("n_cover"),
        F.expr(
            f"CAST(CASE WHEN MAX(_total) > 0 THEN "
            f"(CAST(1000000000 AS DECIMAL(38,0)) * MAX(CASE WHEN _rank = 1 "
            f"THEN {contrib_col} END)) div MAX(_total) END AS BIGINT)"
        ).alias("top1_share_9"),
    )
