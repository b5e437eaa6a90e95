"""Quantile normalization — align every group's distribution to the pool.

The batch-effect corrector (Bolstad et al. 2003, microarray lineage; in
LLM-data land: make quality scores comparable across sources whose
scorers drift): replace each value by the POOLED distribution's value at
the same within-group rank fraction.

Exact convention (percentile_disc 'lower', every output an actual pooled
value, zero floats):

    rn   = row_number within group over (value, tie)    [1..n_g]
    r*   = ceil(rn * N / n_g)  =  (rn*N + n_g - 1) div n_g   in [1..N]
    out  = pooled value at ascending rank r*

The naive pooled-rank lookup is a global row_number — a single-partition
sort over the DATA, the ntile anti-pattern (bucketize.py's enemy). The
scale-correct form used here goes through the pooled DISTINCT-VALUE
histogram instead: each value v owns the pooled rank interval
(below(v), below(v)+cnt(v)], and exploding those intervals with
sequence() yields an (rank -> value) equi-join map of exactly N rows —
shuffled by rank, never sorted globally in one task. Cost: one group-key
window (rn), one domain histogram, one N-row generate + equi-join.

The rank->value map is DETERMINISTIC even under ties (the VALUE at a
pooled rank does not depend on tie order), which is what makes the
DuckDB twin — free to use the lazy global row_number on one node —
hash-match exactly.

Known dial: sequence(lo, hi) MATERIALIZES each value's rank interval as
an in-memory array before the explode, so a single value duplicated
>~1e7 times concentrates that array in one task. For such degenerate tie
mass, swap the explode for the banded interval join
(operators/range_join.py) on pooled_rank BETWEEN lo AND hi — same
semantics, bounded per-task memory; the explode form is the cheaper plan
everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    val_col: str,
    tie_cols: list[str],
) -> DataFrame:
    """Input columns + (rank_in_group, pooled_rank, normalized).

    NULL values are excluded (no rank, no output row). ``tie_cols`` must
    complete a total order within each group so rn is deterministic.
    """
    base = df.filter(F.col(val_col).isNotNull())
    w_g = W.partitionBy(group_col).orderBy(F.col(val_col), *[F.col(c) for c in tie_cols])
    with_rn = base.withColumn("rank_in_group", F.row_number().over(w_g))
    n_g = base.groupBy(group_col).agg(F.count(F.lit(1)).alias("_ng"))
    n_total = base.agg(F.count(F.lit(1)).alias("_n"))
    ranked = (
        with_rn.join(F.broadcast(n_g), group_col)
        .join(F.broadcast(n_total))
        .withColumn(
            "pooled_rank",
            F.expr("(rank_in_group * _n + _ng - 1) div _ng"),
        )
    )
    hist = base.groupBy(F.col(val_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_dom = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
    intervals = hist.withColumn("_hi", F.sum("_c").over(w_dom)).withColumn(
        "_lo", F.col("_hi") - F.col("_c") + 1
    )
    rank_map = intervals.select(
        F.explode(F.sequence("_lo", "_hi")).alias("pooled_rank"),
        F.col("_v").alias("normalized"),
    )
    return ranked.join(rank_map, "pooled_rank").drop("_ng", "_n")
