"""Kendall tau-b rank correlation per key — completing the correlation
family (Pearson x20, Spearman o24) with the tie-aware ordinal statistic:
robust to monotone transforms and the standard choice for small-n
ordinal feature screening in data-quality pipelines.

Determinism discipline (the o24/x29 precedent): every pair count is an
exact int64 — concordant, discordant, x-ties, y-ties come from integer
sign comparisons, never floats — and tau_b is computed per key as ONE
fixed-shape double chain over those integers:

    tau_b = (C - D) / sqrt((n0 - Tx) * (n0 - Ty))

with n0 = n(n-1)/2. IEEE-754 requires sqrt / divide / subtract to be
correctly rounded, so both engines produce the identical double bit
pattern from identical integers (the parity envelope every stats gate in
the suite pins). |C - D| <= n0 stays double-exact below 2^53, i.e. keys
up to ~134M rows; per-key series in this engine are time-series chunks
orders of magnitude below that (the same documented bound as o24's
d-term). Degenerate keys (n < 2, or all-tied in x or y => zero
denominator) yield NULL, matching SQL semantics on both engines.

Scale shape (the x29 Theil-Sen shape): the O(n^2) pair explode is per
KEY and rides ONE key equi-join — cost is linear in the number of keys
at constant series length, never corpus x corpus. For long series the
documented path is the same per-key deterministic subsample x29 uses
(rank-stratified row_number filter) before the pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kendall_tau_b(df: DataFrame, key: str, x: str, y: str) -> DataFrame:
    """Per-key (n, concordant, discordant, ties_x, ties_y, tau_b).

    Pair universe: unordered row pairs under a deterministic per-key
    sequence (row_number over (x, y) — duplicate (x, y) rows are real
    observations and stay distinct pairs). ties_x / ties_y count pairs
    tied in that variable INCLUDING both-tied pairs (the tau-b
    denominator convention).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(key).alias("k"), F.col(x).alias("vx"), F.col(y).alias("vy")
    ).withColumn(
        "seq",
        F.row_number().over(
            Window.partitionBy("k").orderBy(F.col("vx"), F.col("vy"))
        ),
    )
    left = base.select(
        F.col("k"), F.col("seq").alias("i"),
        F.col("vx").alias("xi"), F.col("vy").alias("yi"),
    )
    right = base.select(
        F.col("k"), F.col("seq").alias("j"),
        F.col("vx").alias("xj"), F.col("vy").alias("yj"),
    )
    pairs = left.join(right, "k").filter(F.col("i") < F.col("j"))
    sx = F.signum(F.col("xi") - F.col("xj"))
    sy = F.signum(F.col("yi") - F.col("yj"))
    agg = pairs.groupBy("k").agg(
        F.sum(F.when((sx * sy) > 0, 1).otherwise(0)).alias("concordant"),
        F.sum(F.when((sx * sy) < 0, 1).otherwise(0)).alias("discordant"),
        F.sum(F.when(sx == 0, 1).otherwise(0)).alias("ties_x"),
        F.sum(F.when(sy == 0, 1).otherwise(0)).alias("ties_y"),
    )
    n = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("n"))
    out = n.join(agg, "k", "left").select(
        F.col("k").alias(key),
        "n",
        F.coalesce("concordant", F.lit(0)).alias("concordant"),
        F.coalesce("discordant", F.lit(0)).alias("discordant"),
        F.coalesce("ties_x", F.lit(0)).alias("ties_x"),
        F.coalesce("ties_y", F.lit(0)).alias("ties_y"),
    )
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
    dx = n0 - F.col("ties_x").cast("double")
    dy = n0 - F.col("ties_y").cast("double")
    tau = (F.col("concordant") - F.col("discordant")).cast("double") / F.sqrt(dx * dy)
    return out.withColumn(
        "tau_b", F.when((dx > 0) & (dy > 0), tau)
    )
