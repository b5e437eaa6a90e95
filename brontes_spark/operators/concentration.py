"""Concentration metrics per group — Gini coefficient and the
Herfindahl-Hirschman index (HHI) over a non-negative value column: the
corpus-governance numbers a training-data pipeline reports per domain /
language / source shard (is 90% of the corpus mass in 1% of domains?),
and the classic inequality statistics for spend/volume distributions.

Determinism discipline: both statistics are exact rationals of integer
sums, quantized to 1e9-scaled int64s with ONE truncating division (the
o26/o28 convention — a double accumulation over group members would be
partial-aggregation-order dependent):

    gini_9 = floor(1e9 * (2 * SI - (n+1) * T) / (n * T))
    hhi_9  = floor(1e9 * S2 / T^2)

with T = sum(x), S2 = sum(x^2), SI = sum(rank_i * x_i) under the
ascending-value rank. SI is rank-assignment invariant across ties (equal
x values contribute the same sum for any permutation of their ranks), so
the row_number tiebreak cannot leak into the result. Sums ride
decimal(38,0): x up to 1e12 and n up to 1e12 stay inside 10^38 for SI;
S2 admits x^2 * n <= 1e38. Degenerate groups (T == 0) yield NULL metrics
with exact n/total still reported.

Scale shape: ONE per-group ascending window (rank) sharing its exchange
with the per-group aggregate (the x18/x19 single-exchange discipline),
then a projection. Gini uses the rank formulation precisely because it
needs no self-join and no per-group collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC38 = "DECIMAL(38,0)"


def group_concentration(df: DataFrame, group: str, value: str) -> DataFrame:
    """Per group: (n, total, gini_9, hhi_9) — value must be a non-negative
    integer column (cents, bytes, token counts)."""
    based = df.select(F.col(group).alias("g"), F.col(value).alias("x")).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("g").orderBy(
                F.col("x"), F.monotonically_increasing_id()
            )
        ),
    )
    agg = based.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("total"),
        F.sum(F.expr(f"CAST(x AS {DEC38}) * x")).alias("s2"),
        F.sum(F.expr(f"CAST(rk AS {DEC38}) * x")).alias("si"),
    )
    gini = F.expr(
        f"CAST((CAST(2 AS {DEC38}) * si - (CAST(n AS {DEC38}) + 1) * total)"
        f" * 1000000000 div (CAST(n AS {DEC38}) * total) AS BIGINT)"
    )
    hhi = F.expr(
        f"CAST(CAST(s2 AS {DEC38}) * 1000000000"
        f" div (CAST(total AS {DEC38}) * total) AS BIGINT)"
    )
    return agg.select(
        F.col("g").alias(group),
        "n",
        F.col("total").cast("long").alias("total"),
        F.when(F.col("total") > 0, gini).alias("gini_9"),
        F.when(F.col("total") > 0, hhi).alias("hhi_9"),
    )
