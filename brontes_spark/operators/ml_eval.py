"""Classifier evaluation metrics — exact ROC-AUC and the per-class
confusion/precision/recall/F1 report: with ml_mrr_eval (ranking) and
ml_fold_assign (splits), the offline-eval surface a training pipeline
needs to grade the models its data feeds.

ROC-AUC is computed EXACTLY via its Mann-Whitney identity (Hanley &
McNeil 1982): AUC = U_pos / (P * N) with ties contributing 1/2 — which
is u2_a / (2 * P * N) in operators/mannwhitney.py's doubled-U integers.
No curve interpolation, no threshold sweep, no sort of the data: one
hash aggregate to the distinct-score histogram + one ordered window
over the score DOMAIN (the mannwhitney scale posture; quantize
continuous scores upstream, which doubles as the tie policy). auc_9 =
floor(1e9 * u2_a / (2 P N)) exact; auc closes with ONE correctly-
rounded double division.

The classification report is pure integer counting: per observed class
c, tp = #(label=c, pred=c), fp = #(pred=c) - tp, fn = #(label=c) - tp;
precision/recall/f1 ship as 1e9-quantized exact rationals (f1 =
2tp/(2tp+fp+fn), the harmonic mean's integer form) plus the raw counts
so any other metric derives downstream. Classes appearing only in
labels or only in predictions still get a row (full outer of the two
marginals — silently dropping a never-predicted class is how a dead
class hides). One (label, pred) cell aggregate — map-side combinable —
then marginal aggregates over the CELL relation (|classes^2| rows, not
data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC38 = "decimal(38,0)"


def roc_auc(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """One row: (n_pos, n_neg, auc_num2, auc_den2, auc_9, auc) — the
    probability a random positive outscores a random negative (ties =
    1/2), exact. NULL scores drop; degenerate single-class inputs yield
    NULL auc."""
    from .mannwhitney import mann_whitney_u

    base = df.select(
        F.col(label_col).cast("boolean").alias("_pos"),
        F.col(score_col).alias("_s"),
    )
    u = mann_whitney_u(base, "_pos", "_s", True, False)
    den2 = (2 * F.col("n_a") * F.col("n_b")).cast(DEC38)
    auc9 = F.expr(
        "CAST(CAST(u2_a AS DECIMAL(38,0)) * 1000000000"
        " div (CAST(2 AS DECIMAL(38,0)) * n_a * n_b) AS BIGINT)"
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return u.select(
        F.col("n_a").alias("n_pos"),
        F.col("n_b").alias("n_neg"),
        F.col("u2_a").alias("auc_num2"),
        den2.cast("long").alias("auc_den2"),
        F.when(ok, auc9).alias("auc_9"),
        F.when(
            ok,
            F.col("u2_a").cast("double")
            / (2 * F.col("n_a") * F.col("n_b")).cast("double"),
        ).alias("auc"),
    )


def classification_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per class: (class, support, predicted, tp, fp, fn, precision_9,
    recall_9, f1_9) — one row for every class seen in labels OR
    predictions; zero-division cells are NULL (undefined, not 0)."""
    cells = (
        df.select(F.col(label_col).alias("y"), F.col(pred_col).alias("p"))
        .groupBy("y", "p")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    support = cells.groupBy(F.col("y").alias("cls")).agg(
        F.sum("n").alias("support")
    )
    predicted = cells.groupBy(F.col("p").alias("cls")).agg(
        F.sum("n").alias("predicted")
    )
    tp = cells.filter(F.col("y") == F.col("p")).select(
        F.col("y").alias("cls"), F.col("n").alias("tp")
    )
    out = (
        support.join(predicted, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("support", F.lit(0)).alias("support"),
            F.coalesce("predicted", F.lit(0)).alias("predicted"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
        .select(
            "cls",
            "support",
            "predicted",
            "tp",
            (F.col("predicted") - F.col("tp")).alias("fp"),
            (F.col("support") - F.col("tp")).alias("fn"),
        )
    )

    def ratio9(num_sql: str, den_sql: str):
        return F.when(
            F.expr(den_sql) > 0,
            F.expr(
                f"CAST(CAST({num_sql} AS {DEC38}) * 1000000000"
                f" div CAST({den_sql} AS {DEC38}) AS BIGINT)"
            ),
        )

    return out.select(
        "cls",
        "support",
        "predicted",
        "tp",
        "fp",
        "fn",
        ratio9("tp", "predicted").alias("precision_9"),
        ratio9("tp", "support").alias("recall_9"),
        ratio9("2 * tp", "2 * tp + fp + fn").alias("f1_9"),
    )


def cohens_kappa(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """One row: (n, agree, pe_num, kappa_9, kappa) — inter-rater /
    classifier-vs-truth agreement corrected for chance (Cohen 1960):

        kappa = (N * agree - pe_num) / (N^2 - pe_num),
        pe_num = sum over classes of support_c * predicted_c

    an exact rational of integer marginals (the confusion-cell shape);
    kappa_9 quantizes with one truncating division in decimal(38) —
    signed: decimal div truncates toward zero on both engines, the
    theilsen convention — and kappa closes with ONE IEEE double
    division. NULL when pe_num == N^2 (a constant table has no
    chance-corrected agreement)."""
    cells = (
        df.select(F.col(label_col).alias("y"), F.col(pred_col).alias("p"))
        .groupBy("y", "p")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    support = cells.groupBy(F.col("y").alias("cls")).agg(
        F.sum("n").alias("s")
    )
    predicted = cells.groupBy(F.col("p").alias("cls")).agg(
        F.sum("n").alias("pr")
    )
    pe = (
        support.join(predicted, "cls", "full_outer")
        .select(
            (F.coalesce("s", F.lit(0)) * F.coalesce("pr", F.lit(0))).alias("sp")
        )
        .agg(F.sum("sp").alias("pe_num"))
    )
    tot = cells.agg(
        F.sum("n").alias("n"),
        F.sum(F.when(F.col("y") == F.col("p"), F.col("n")).otherwise(0)).alias(
            "agree"
        ),
    )
    out = tot.crossJoin(F.broadcast(pe))
    num = F.expr(f"CAST(n AS {DEC38}) * agree - pe_num")
    den = F.expr(f"CAST(n AS {DEC38}) * n - pe_num")
    ok = F.expr(f"CAST(n AS {DEC38}) * n") != F.col("pe_num")
    return out.select(
        "n",
        "agree",
        "pe_num",
        F.when(
            ok,
            F.expr(
                f"CAST((CAST(n AS {DEC38}) * agree - pe_num) * 1000000000"
                f" div (CAST(n AS {DEC38}) * n - pe_num) AS BIGINT)"
            ),
        ).alias("kappa_9"),
        F.when(ok, num.cast("double") / den.cast("double")).alias("kappa"),
    )


def calibration_report(
    df: DataFrame,
    prob_bp_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins over an integer basis-point probability
    column (0..10000 — the repo-wide integerization policy doubles as
    the bin policy): per bin, (bin, n, sum_p_bp, n_pos, mean_p_9,
    frac_pos_9, brier2_sum) where brier2_sum = sum((p_bp - y*10000)^2)
    — the exact per-bin Brier component in bp^2 units; the global Brier
    is sum(brier2_sum) / (n_total * 1e8), derivable downstream without
    another pass. One map-side bin aggregate; the ratio math is a
    projection over n_bins rows."""
    if n_bins < 1 or 10000 % n_bins != 0:
        raise ValueError(f"calibration_report: n_bins must divide 10000, got {n_bins}")
    width = 10000 // n_bins
    base = df.select(
        F.col(prob_bp_col).alias("p"),
        F.col(label_col).cast("boolean").cast("long").alias("y"),
    )
    binned = base.select(
        F.least(F.expr(f"p div {width}"), F.lit(n_bins - 1)).alias("bin"),
        "p",
        "y",
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("sum_p_bp"),
        F.sum("y").alias("n_pos"),
        F.sum(
            F.expr(f"CAST(p - y * 10000 AS {DEC38}) * (p - y * 10000)")
        ).cast("long").alias("brier2_sum"),
    )
    return agg.select(
        "bin",
        "n",
        "sum_p_bp",
        "n_pos",
        F.expr(
            f"CAST(CAST(sum_p_bp AS {DEC38}) * 1000000000"
            f" div (CAST(n AS {DEC38}) * 10000) AS BIGINT)"
        ).alias("mean_p_9"),
        F.expr(
            f"CAST(CAST(n_pos AS {DEC38}) * 1000000000"
            f" div CAST(n AS {DEC38}) AS BIGINT)"
        ).alias("frac_pos_9"),
        "brier2_sum",
    )
