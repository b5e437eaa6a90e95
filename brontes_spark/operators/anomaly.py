"""Robust anomaly detection: median / MAD (median absolute deviation)
outlier flagging per group.

i14 (possible-MEV discovery) flags avg + 2σ outliers; mean/σ are
themselves dragged by the outliers they hunt. The robust form — flag x
where |x - median| > k * MAD — has a 50% breakdown point (Hampel's rule,
the standard robust filter). Both medians use the LOWER order statistic
(rank = (n+1)//2 of the ascending sort), so every reported figure is an
actual data value: deterministic, no interpolation convention to match,
and exact on doubles (selection, not arithmetic).

Scale shape: ONE key shuffle; the median and the deviation median are two
sort-windows over the same partitioning (the second sort reuses the first
exchange), each reduced by a max-of-case unordered window — no
driver-side collect, no percentile_approx. MAD = 0 (a majority-constant
group) flags every value off the constant, the documented behavior of
Hampel filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def mad_anomalies(
    df: DataFrame,
    key_col: str,
    val_col: str,
    k: float = 3.0,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Rows whose value deviates from their group median by more than
    k * MAD: (key, <keep_cols...>, value, med, mad). `k * mad` is one
    IEEE multiply — oracle-exact when the oracle writes the same shape."""
    key, val = F.col(key_col).alias("key"), F.col(val_col).cast("double")
    keep = keep_cols or []
    base = df.select(key, *keep, val.alias("v")).filter(F.col("v").isNotNull())

    wk = W.partitionBy("key")
    w_v = wk.orderBy("v")
    with_med = (
        base.withColumn("_rn", F.row_number().over(w_v))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn(
            "med",
            F.max(
                F.when(F.col("_rn") == F.expr("(_n + 1) div 2"), F.col("v"))
            ).over(wk),
        )
        .drop("_rn", "_n")
    )
    w_d = wk.orderBy("dev")
    with_mad = (
        with_med.withColumn("dev", F.abs(F.col("v") - F.col("med")))
        .withColumn("_rn", F.row_number().over(w_d))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn(
            "mad",
            F.max(
                F.when(F.col("_rn") == F.expr("(_n + 1) div 2"), F.col("dev"))
            ).over(wk),
        )
        .drop("_rn", "_n")
    )
    return with_mad.filter(F.col("dev") > F.lit(float(k)) * F.col("mad")).select(
        "key", *keep, F.col("v").alias("value"), "med", "mad"
    )
