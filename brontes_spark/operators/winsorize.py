"""Group-wise winsorization — clip to empirical percentile bounds.

The robust-preprocessing step before any mean/variance statistic on
heavy-tailed data (price outliers, token-count explosions): values below
the q_lo-th or above the q_hi-th percentile are pulled to the bound, not
dropped (dropping changes n and biases downstream ratios; x12's MAD
flagging is the detection sibling, this is the repair).

Percentile convention: percentile_disc with POSITIONAL order statistics —
the bound is the value at row_number ceil(q·n) in (value, tiebreak)
order. Rational q enters as q_num/q_den so the rank is the exact integer
ceil(q_num·n / q_den) = (q_num·n + q_den − 1) div q_den — no float ever
touches rank selection, and duplicate values pose no ambiguity because
the statistic is positional (equal values at the boundary give the same
bound either way).

Scale shape: ONE key shuffle for the (count, row_number) window pass,
a per-key bounds aggregate (|keys| rows), then a broadcast join back for
the clamp — rows flow through exactly twice (window + clamp), never
per-percentile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    key_col: str,
    val_col: str,
    tie_col: str,
    q_lo: tuple[int, int] = (1, 100),
    q_hi: tuple[int, int] = (99, 100),
) -> DataFrame:
    """Input rows + (lo, hi, clamped): per-key percentile bounds and the
    winsorized value. q_lo/q_hi are exact rationals (num, den)."""
    for q in (q_lo, q_hi):
        if not (0 < q[0] <= q[1]):
            raise ValueError(f"quantile must be in (0, 1], got {q}")
    wo = W.partitionBy(key_col).orderBy(val_col, tie_col)
    wk = W.partitionBy(key_col)
    ranked = df.withColumn("_rn", F.row_number().over(wo)).withColumn(
        "_n", F.count(F.lit(1)).over(wk)
    )
    r_lo = F.expr(f"({q_lo[0]} * _n + {q_lo[1]} - 1) div {q_lo[1]}")
    r_hi = F.expr(f"({q_hi[0]} * _n + {q_hi[1]} - 1) div {q_hi[1]}")
    bounds = (
        ranked.withColumn("_rlo", r_lo)
        .withColumn("_rhi", r_hi)
        .groupBy(key_col)
        .agg(
            F.max(F.when(F.col("_rn") == F.col("_rlo"), F.col(val_col))).alias("lo"),
            F.max(F.when(F.col("_rn") == F.col("_rhi"), F.col(val_col))).alias("hi"),
        )
    )
    clamped = F.least(F.greatest(F.col(val_col), F.col("lo")), F.col("hi"))
    return (
        df.join(F.broadcast(bounds), key_col)
        .withColumn("clamped", clamped)
    )
