"""Welch's t and one-way ANOVA F — the parametric siblings of the
Mann-Whitney/KS/Spearman family (operators/mannwhitney.py), completing
the engine's hypothesis-testing surface for A/B evaluation over integer
metric columns (cents, counts, scores).

Exactness discipline (per family precedent):

* Everything data-sized aggregates to EXACT integer sums per group —
  n, s = sum(v), q = sum(v^2) — order-independent, shuffle-safe.
* Welch's t and the Welch-Satterthwaite df are then ONE fixed-shape
  double chain over those int64 sums (the gapfill fixed-evaluation-shape
  policy): both engines run the verbatim-identical SQL expression over
  identical int64 inputs, and +,-,*,/ ,sqrt are IEEE-determined, so the
  emitted t_9 / df_9 floors agree bit-for-bit. int64 -> double is the
  correctly-rounded conversion BOTH engines share (see pearson_corr_xy
  on why decimal/HUGEINT -> double is not).
* ANOVA avoids doubles in the aggregate entirely: each group's
  sum-of-squares term is floored to a 1e3-scaled (milli) integer
  (tg = s_g^2 * 1e3 div n_g, exact decimal(38,0) arithmetic, int64
  result), so the cross-group SUM is an integer sum — order-independent
  where a double sum would be order-DEPENDENT and diverge between
  engines. F_9 is one integer division over those quantized terms; the
  1e-3 quantization of the SS terms is part of the statistic's
  definition (the chi2_9/rb_9 convention; SS magnitudes are cents^2, so
  milli-cents^2 resolution is far below any decision threshold).

Envelopes (documented, NULL on overflow like the pearson family):
Welch needs n*q < 2^63 per group (cents<=1e4 -> n <= ~9e10; cents<=1e6
-> n <= ~9e6); ANOVA needs S^2*1e3/N and Q*1e3 < 2^63 (cents avg <=
3e4 holds to N ~ 1e8 rows). Group or sample above — these statistics
converge long before any of those sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC38 = "decimal(38,0)"

#: the Welch double chain, verbatim-shared with the DuckDB oracle: one
#: fixed parenthesization over int64 inputs (na, sa, qa, nb, sb, qb).
#: va/vb are the per-group squared standard errors s_i^2 / n_i.
WELCH_T9_SQL = (
    "CAST(FLOOR(1000000000.0 * "
    "((CAST(sa AS DOUBLE) / na) - (CAST(sb AS DOUBLE) / nb)) / "
    "SQRT("
    "((na * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa) / (na * (na - 1.0) * na))"
    " + "
    "((nb * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb) / (nb * (nb - 1.0) * nb))"
    ")) AS BIGINT)"
)

#: squared terms are written as explicit self-products, never POW(x, 2):
#: libm pow is not guaranteed correctly rounded and the two engines need
#: not share a libm, while an IEEE multiply is fully determined
_VA = "((na * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa) / (na * (na - 1.0) * na))"
_VB = "((nb * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb) / (nb * (nb - 1.0) * nb))"

WELCH_DF9_SQL = (
    "CAST(FLOOR(1000000000.0 * "
    f"(({_VA} + {_VB}) * ({_VA} + {_VB})) / ("
    f"({_VA} * {_VA}) / (na - 1.0) + ({_VB} * {_VB}) / (nb - 1.0)"
    ")) AS BIGINT)"
)


def welch_ttest(
    df: DataFrame,
    group_col: str,
    val_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """One row: (n_a, n_b, sum_a, sum_b, sumsq_a, sumsq_b, t_9, df_9).

    t_9 = floor(1e9 * Welch t), df_9 = floor(1e9 * Welch-Satterthwaite
    df). NULL t_9/df_9 when either group has n < 2 or zero combined
    variance (0/0). Rows outside the two groups or with NULL values are
    excluded. All squared terms are explicit self-products (one IEEE
    multiply), never libm POW — see the module-constant note.
    """
    base = df.filter(
        F.col(group_col).isin([group_a, group_b]) & F.col(val_col).isNotNull()
    ).select(
        (F.col(group_col) == group_a).alias("_is_a"),
        F.col(val_col).cast("long").alias("v"),
    )
    agg = base.agg(
        F.sum(F.when(F.col("_is_a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(~F.col("_is_a"), 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("_is_a"), F.col("v")).otherwise(0)).alias("sa"),
        F.sum(F.when(~F.col("_is_a"), F.col("v")).otherwise(0)).alias("sb"),
        F.sum(F.when(F.col("_is_a"), F.col("v") * F.col("v")).otherwise(0)).alias("qa"),
        F.sum(F.when(~F.col("_is_a"), F.col("v") * F.col("v")).otherwise(0)).alias("qb"),
    )
    ok = (
        "na > 1 AND nb > 1 AND "
        "(na * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa) "
        "+ (nb * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb) > 0"
    )
    return agg.selectExpr(
        "na AS n_a",
        "nb AS n_b",
        "sa AS sum_a",
        "sb AS sum_b",
        "qa AS sumsq_a",
        "qb AS sumsq_b",
        f"CASE WHEN {ok} THEN {WELCH_T9_SQL} END AS t_9",
        f"CASE WHEN {ok} THEN {WELCH_DF9_SQL} END AS df_9",
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    val_col: str,
) -> DataFrame:
    """One row: (k, n, ssb_3, ssw_3, f_9) — one-way ANOVA over ALL groups.

    Per-group term tg = floor(s_g^2 * 1e3 / n_g) (exact decimal
    arithmetic, int64 result), so SSB_3 = sum(tg) - floor(S^2 * 1e3 / N)
    and SSW_3 = Q*1e3 - sum(tg) are exact int64s computable with an
    order-independent sum, and
    F_9 = floor(1e9 * (SSB_3/(k-1)) / (SSW_3/(N-k)))
        = (SSB_3 * (N-k) * 1e9) div (SSW_3 * (k-1))  (decimal interior).
    The 1e-3 quantization of the SS terms is part of the statistic's
    definition (both engines floor identically). NULL f_9 when k < 2,
    N <= k, or SSW_3 == 0. NULL values are excluded; NULL group keys
    form their own group (coalesce upstream if undesired).
    """
    base = df.filter(F.col(val_col).isNotNull()).select(
        F.col(group_col).alias("g"), F.col(val_col).cast("long").alias("v")
    )
    per_g = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("v").alias("sg"),
        F.sum(F.col("v") * F.col("v")).alias("qg"),
    )
    tg = f"(CAST(sg AS {DEC38}) * sg * 1000) div ng"
    agg = per_g.selectExpr(
        "ng", "sg", "qg", f"{tg} AS tg"
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum("tg").alias("sum_tg"),
    )
    return agg.selectExpr(
        "k",
        "n",
        f"sum_tg - ((CAST(s AS {DEC38}) * s * 1000) div n) AS ssb_3",
        f"CAST(CAST(q AS {DEC38}) * 1000 AS BIGINT) - sum_tg AS ssw_3",
    ).selectExpr(
        "CAST(k AS BIGINT) AS k",
        "CAST(n AS BIGINT) AS n",
        "CAST(ssb_3 AS BIGINT) AS ssb_3",
        "CAST(ssw_3 AS BIGINT) AS ssw_3",
        "CASE WHEN k > 1 AND n > k AND ssw_3 > 0 THEN "
        f"CAST((CAST(ssb_3 AS {DEC38}) * CAST(n - k AS {DEC38}) * 1000000000) "
        f"div (CAST(ssw_3 AS {DEC38}) * CAST(k - 1 AS {DEC38})) AS BIGINT) END AS f_9",
    )


#: the two-proportion pooled z chain, verbatim-shared with the oracle
#: (same discipline as WELCH_T9_SQL: int64 inputs, one fixed IEEE shape)
TWO_PROP_Z9_SQL = (
    "CAST(FLOOR(1000000000.0 * "
    "((CAST(xa AS DOUBLE) / na) - (CAST(xb AS DOUBLE) / nb)) / "
    "SQRT("
    "(CAST(xa + xb AS DOUBLE) / (na + nb)) "
    "* (1.0 - CAST(xa + xb AS DOUBLE) / (na + nb)) "
    "* (1.0 / na + 1.0 / nb)"
    ")) AS BIGINT)"
)


def two_proportion_ztest(
    df: DataFrame,
    unit_col: str,
    arm_col: str,
    converted_col: str,
    arm_a,
    arm_b,
) -> DataFrame:
    """One row: (n_a, x_a, n_b, x_b, z_9) — the pooled two-proportion
    z statistic for A/B conversion comparison (the significance layer
    over x9_funnel_stages' counts).

    A UNIT (user) converts if ANY of its rows has ``converted_col``
    true — computed with one distinct-unit aggregate (max over the
    boolean), so duplicate events cannot inflate either count. Exact
    int64 counts, then the one fixed-shape double chain
    (TWO_PROP_Z9_SQL, shared verbatim with the oracle). NULL z_9 when
    either arm is empty or the pooled rate is degenerate (0 or 1 —
    zero variance). Units seen under BOTH arms count in each arm they
    appear under (cross-arm contamination is an upstream assignment
    bug this statistic cannot repair — use ml_fold_assign).
    """
    per_unit = (
        df.filter(F.col(arm_col).isin([arm_a, arm_b]))
        .groupBy(arm_col, unit_col)
        .agg(F.max(F.col(converted_col).cast("int")).alias("conv"))
    )
    agg = per_unit.agg(
        F.sum(F.when(F.col(arm_col) == arm_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col(arm_col) == arm_b, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col(arm_col) == arm_a, F.col("conv")).otherwise(0)).alias("xa"),
        F.sum(F.when(F.col(arm_col) == arm_b, F.col("conv")).otherwise(0)).alias("xb"),
    )
    ok = "na > 0 AND nb > 0 AND xa + xb > 0 AND xa + xb < na + nb"
    return agg.selectExpr(
        "na AS n_a",
        "xa AS x_a",
        "nb AS n_b",
        "xb AS x_b",
        f"CASE WHEN {ok} THEN {TWO_PROP_Z9_SQL} END AS z_9",
    )
