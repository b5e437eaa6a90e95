"""Mann-Whitney U test statistic — exact-integer nonparametric A/B.

The engine's first hypothesis-test surface: does group A's value
distribution stochastically dominate group B's? The U statistic is the
canonical nonparametric answer (no normality assumption — right for the
heavy-tailed value columns this engine handles), and it is EXACTLY
computable in integers: with midranks doubled to clear the .5 tie
halves,

    mr2(v) = 2 * (1 + #values_below) + ties_at(v) - 1
    R2_A   = sum over values of cnt_A(v) * mr2(v)
    U2_A   = R2_A - n_A * (n_A + 1)        (U doubled; U_A = U2_A / 2)
    U2_B   = 2 * n_A * n_B - U2_A          (the identity U_A+U_B = nAnB)

plus the rank-biserial effect size rb = (U_A - U_B)/(n_A*n_B), emitted
as rb_9 with one truncating integer division (truncation toward zero,
identical in both engines — the flesch_9 convention; rb is symmetric so
truncation loses no sign information).

Scale shape: one hash aggregate collapses the data to the DISTINCT-VALUE
histogram (cnt_A, cnt_B per value) — the only data-sized pass — then one
ordered window over that histogram computes the cumulative ranks. The
window is deliberately partition-less: its input is the value DOMAIN,
not the data (cents domains are ~1e6 rows; for continuous doubles,
quantize upstream — the repo-wide integerization policy doubles as the
test's tie policy). Significance: U's normal approximation needs only
(n_a, n_b, U) — emitted here; the z/p computation is a driver-side
formula over one row, not a data operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

DEC38 = "decimal(38,0)"


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    val_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """One row: (n_a, n_b, u2_a, u2_b, rb_9). Rows outside the two groups
    or with NULL values are excluded. Empty groups yield NULL rb_9."""
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(val_col).isNotNull()
    ).select(
        (F.col(group_col) == group_a).alias("_is_a"),
        F.col(val_col).alias("v"),
    )
    hist = base.groupBy("v").agg(
        F.sum(F.col("_is_a").cast("long")).alias("ca"),
        F.sum((~F.col("_is_a")).cast("long")).alias("cb"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    ranked = hist.withColumn(
        "_below", F.sum(F.col("ca") + F.col("cb")).over(w) - F.col("ca") - F.col("cb")
    ).withColumn(
        "_mr2", 2 * (1 + F.col("_below")) + F.col("ca") + F.col("cb") - 1
    )
    agg = ranked.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(F.col("ca") * F.col("_mr2")).alias("_r2a"),
    )
    out = agg.select(
        "n_a",
        "n_b",
        (F.col("_r2a") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2_a"),
    ).select(
        "n_a",
        "n_b",
        "u2_a",
        (2 * F.col("n_a") * F.col("n_b") - F.col("u2_a")).alias("u2_b"),
    )
    return (
        out.withColumn(
            "_num",
            (F.col("u2_a") - F.col("u2_b")).cast(DEC38)
            * F.lit(1_000_000_000).cast(DEC38),
        )
        .withColumn("_den", (2 * F.col("n_a") * F.col("n_b")).cast(DEC38))
        .withColumn(
            "rb_9",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.expr("_num div _den"),
            ),
        )
        .select("n_a", "n_b", "u2_a", "u2_b", "rb_9")
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    val_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Kolmogorov-Smirnov two-sample statistic, exact:
    (n_a, n_b, d_num, d_9) where

        D = max over values of |ECDF_A(v) - ECDF_B(v)|
          = max |cumA(v) * n_b - cumB(v) * n_a| / (n_a * n_b)

    The numerator is an exact integer maximum (cross-multiplied ECDFs —
    no division inside the max), so D is an exact rational; d_9 =
    floor(1e9 * d_num / (n_a * n_b)) with positive operands. Same scale
    shape as mann_whitney_u: one hash aggregate to the distinct-value
    histogram, one ordered window over the value domain. The KS D and
    the MW U disagree on purpose — U sees stochastic dominance, D sees
    the largest pointwise gap — which is why both ship."""
    base = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(val_col).isNotNull()
    ).select(
        (F.col(group_col) == group_a).alias("_is_a"),
        F.col(val_col).alias("v"),
    )
    hist = base.groupBy("v").agg(
        F.sum(F.col("_is_a").cast("long")).alias("ca"),
        F.sum((~F.col("_is_a")).cast("long")).alias("cb"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.withColumn("cuma", F.sum("ca").over(w)).withColumn(
        "cumb", F.sum("cb").over(w)
    )
    # the gap needs the FINAL n_a/n_b inside the per-value expression:
    # take them from unbounded windows over the same (tiny) histogram
    wa = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    gaps = cum.withColumn("na", F.sum("ca").over(wa)).withColumn(
        "nb", F.sum("cb").over(wa)
    ).withColumn(
        "_gap",
        F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")),
    )
    out = gaps.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.max("_gap").alias("d_num"),
    )
    return (
        out.withColumn(
            "_num", F.col("d_num").cast(DEC38) * F.lit(1_000_000_000).cast(DEC38)
        )
        .withColumn("_den", (F.col("n_a") * F.col("n_b")).cast(DEC38))
        .withColumn(
            "d_9",
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.expr("_num div _den"),
            ),
        )
        .select("n_a", "n_b", "d_num", "d_9")
    )


def spearman_corr(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman rank correlation, exact: one row (n, rho9).

    Spearman is Pearson on ranks; with midranks DOUBLED (the MW trick)
    the tie-adjusted ranks are exact integers, so the whole statistic
    rides the pearson exact-sum chain unchanged — rho9 is the identical
    correctly-rounded double-chain floor. Pairwise-complete on the two
    columns (NULL rows drop before ranking).

    Shape: two distinct-value histograms (hash aggs) -> two rank maps
    (ordered windows over the value DOMAINS, partition-less by the
    mannwhitney size policy) -> two joins back to the rows -> one
    pearson aggregate. Envelope: doubled midranks reach 2n and the
    binding bound is pearson_corr_xy's int64 d-terms — d1 ~ n^4/3 with
    doubled midranks crosses 2^63 around n ~ 7.2e4 pairs, at which point
    the decimal->long cast nulls and rho9 degrades to NULL (never
    garbage; the int64 cast is the cross-engine bit-parity contract, see
    pearson_corr_xy). Group or sample above ~7e4 pairs — rank
    correlation converges long before that (ADVICE r8 item 3: the
    earlier ~1.2M claim only accounted for sum(mr2^2) fitting bigint,
    not the d-terms)."""
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))

    def rank_map(col: str):
        hist = base.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w = W.orderBy(col).rowsBetween(W.unboundedPreceding, W.currentRow)
        return hist.withColumn(
            "_below", F.sum("c").over(w) - F.col("c")
        ).select(col, (2 * F.col("_below") + F.col("c") + 1).alias(f"mr2_{col}"))

    ranked = base.join(rank_map("x"), "x").join(rank_map("y"), "y")
    from .ols import pearson_corr_xy

    out = pearson_corr_xy(
        ranked.withColumn("_k", F.lit(1)), "_k", "mr2_x", "mr2_y"
    )
    return out.select("n", F.col("corr9").alias("rho9"))
