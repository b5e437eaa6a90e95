"""Theil-Sen robust slope — per-key median-of-pairwise-slopes trend.

The robust complement of ols_trend (operators/ols.py): OLS is exact but a
single corrupted point moves it arbitrarily; the Theil-Sen estimator
(median over all pairwise slopes) has a 29% breakdown point and is the
standard robust trend for the noisy per-key series this engine screens
(sensor drift, per-user spend trajectories, quality-score creep).

Exactness contract: every pairwise slope is the RATIONAL
(y_j - y_i) / (x_j - x_i) with x_j > x_i (pairs with equal x are
excluded, the standard convention). The median element is selected under
the total order (IEEE double of num/den, num, den) — int64 -> double
division is identical on both engines, and the (num, den) tiebreak makes
the selection deterministic even when two distinct rationals collide at
double precision (possible below ~2^-52 relative spacing); the selected
PAIR is then re-read exactly. For even pair counts the two middle
rationals average exactly in integers:

    slope_9 = (1e9 * (num_lo * den_hi + num_hi * den_lo))
                div (2 * den_lo * den_hi)

(one decimal(38,0) TRUNCATING integer division — toward zero in both
engines, the flesch_9/rb_9 convention, which matters here because
slopes are signed; odd counts set lo = hi, same formula). Envelope: |num| * den * 1e9 inside decimal(38) — cents-scale
numerators (<=1e8) against ns-scale denominators (<=1e15) peak at ~1e32.

Scale shape: the pair explode is O(n_k^2) PER KEY (never corpus x
corpus — the self-join equi-keys on the series key first), so the cost
is sum_k n_k^2: fine for the per-user/per-sensor series lengths this
targets (tens to hundreds); for long series subsample per key upstream —
Theil-Sen converges fast under subsampling — or segment by time. The
median selection is one row_number window over the pair relation, riding
the same key partitioning as the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DEC38 = "decimal(38,0)"


def theil_sen_slope(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """(key, n_pairs, num_lo, den_lo, num_hi, den_hi, slope_9) per key.

    Keys with no valid pair (fewer than 2 distinct x values) emit no row.
    NULL x/y rows are excluded before pairing.
    """
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(key_col).alias("k"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    a = base.select("k", F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = base.select("k", F.col("x").alias("xj"), F.col("y").alias("yj"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("xj") > F.col("xi"))
        .select(
            "k",
            (F.col("yj") - F.col("yi")).alias("num"),
            (F.col("xj") - F.col("xi")).alias("den"),
        )
    )
    ordered = pairs.withColumn(
        "_rn",
        F.row_number().over(
            W.partitionBy("k").orderBy(
                (F.col("num").cast("double") / F.col("den").cast("double")),
                "num",
                "den",
            )
        ),
    ).withColumn("_m", F.count(F.lit(1)).over(W.partitionBy("k")))
    lo = F.expr("CAST(FLOOR((_m + 1) / 2) AS INT)")
    hi = F.expr("CAST(FLOOR(_m / 2) + 1 AS INT)")
    picked = (
        ordered.filter((F.col("_rn") == lo) | (F.col("_rn") == hi))
        .groupBy("k", "_m")
        .agg(
            F.min_by("num", "_rn").alias("num_lo"),
            F.min_by("den", "_rn").alias("den_lo"),
            F.max_by("num", "_rn").alias("num_hi"),
            F.max_by("den", "_rn").alias("den_hi"),
        )
    )
    return picked.selectExpr(
        "k AS key",
        "CAST(_m AS BIGINT) AS n_pairs",
        "num_lo",
        "den_lo",
        "num_hi",
        "den_hi",
        f"CAST((CAST(1000000000 AS {DEC38}) * "
        f"(CAST(num_lo AS {DEC38}) * den_hi + CAST(num_hi AS {DEC38}) * den_lo)) "
        f"div (CAST(2 AS {DEC38}) * den_lo * den_hi) AS BIGINT) AS slope_9",
    )
