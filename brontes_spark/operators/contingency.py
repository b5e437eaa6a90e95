"""Chi-square test of independence + Cramér's V over a two-way
contingency table — the categorical-association screen (is event_type
independent of weekday? is language independent of source domain?) that
complements the suite's numeric correlation family (Pearson, Spearman,
Kendall) and its goodness-of-fit chi-square (o16 Benford).

Determinism discipline (the o26 ANOVA quantization, verbatim): the
chi-square sum's per-cell terms

    (O_ab * N - r_a * c_b)^2 / (N * r_a * c_b)

are rationals with cell-specific denominators, so a double sum across
cells is partial-aggregation-order dependent. Each term is therefore
floored to a 1e9-scaled integer in decimal(38,0) arithmetic BEFORE the
cross-cell reduction — integer sums are order-independent — and the
quantization is part of the statistic's definition (nano resolution is
far below any decision threshold). Widths: O*N <= 1e12 at 1e6 rows,
squared 1e24, x1e9 = 1e33 < 10^38. Cramér's V closes with ONE
fixed-shape double chain over the integers (sqrt/divide are IEEE
correctly-rounded, so both engines agree bitwise): V =
sqrt(chi2 / (N * min(R-1, C-1))). Degenerate tables (R < 2 or C < 2)
yield NULL V, 0 chi2 terms.

Scale shape: one (a, b) cell aggregate (map-side combinable), two
marginal aggregates over the CELL relation (|cells| rows, not data),
one 1-row total — every data-sized stage is a hash aggregate; the
per-cell term math is a projection over |R x C| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC38 = "DECIMAL(38,0)"


def chi2_independence(df: DataFrame, a: str, b: str) -> DataFrame:
    """One row: (n, n_rows_cat, n_cols_cat, dof, chi2_9, cramers_v) —
    chi2_9 = chi-square statistic in 1e-9 units (exact int64 under the
    quantized definition), dof = (R-1)(C-1)."""
    cells = (
        df.select(F.col(a).alias("ra"), F.col(b).alias("cb"))
        .groupBy("ra", "cb")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    row_tot = cells.groupBy("ra").agg(F.sum("o").alias("rt"))
    col_tot = cells.groupBy("cb").agg(F.sum("o").alias("ct"))
    joined = cells.join(row_tot, "ra").join(col_tot, "cb")
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("ra").alias("n_rows_cat"),
        F.count_distinct("cb").alias("n_cols_cat"),
    )
    # term_9 = floor(1e9 * (o*n - rt*ct)^2 / (n * rt * ct)) in decimal(38,0)
    term = joined.crossJoin(F.broadcast(tot.select("n"))).select(
        F.expr(
            f"CAST((CAST(o AS {DEC38}) * n - CAST(rt AS {DEC38}) * ct) *"
            f" (CAST(o AS {DEC38}) * n - CAST(rt AS {DEC38}) * ct) * 1000000000"
            f" div (CAST(n AS {DEC38}) * rt * ct) AS BIGINT)"
        ).alias("t9")
    )
    chi2 = term.agg(F.sum("t9").alias("chi2_9"))
    out = tot.crossJoin(F.broadcast(chi2)).select(
        "n",
        "n_rows_cat",
        "n_cols_cat",
        ((F.col("n_rows_cat") - 1) * (F.col("n_cols_cat") - 1)).alias("dof"),
        F.coalesce("chi2_9", F.lit(0)).alias("chi2_9"),
    )
    denom = (
        F.col("n").cast("double")
        * F.least(F.col("n_rows_cat") - 1, F.col("n_cols_cat") - 1).cast("double")
    )
    v = F.sqrt((F.col("chi2_9").cast("double") / 1.0e9) / denom)
    return out.withColumn(
        "cramers_v",
        F.when((F.col("n_rows_cat") > 1) & (F.col("n_cols_cat") > 1), v),
    )
