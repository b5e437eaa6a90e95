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


def _per_class_counts(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """(cls, support, predicted, tp) in ONE pass: the (label, pred) cell
    aggregate explodes each cell into its two marginal contributions —
    (cls=y: support n, tp if y==p) and (cls=p: predicted n) — and a
    second tiny aggregate over 2·|cells| rows folds them per class.

    This replaces the original three-branch formulation (support /
    predicted / tp as separate aggregates full-outer-joined back
    together), which Spark planned as THREE scans of the base relation
    — measured 13.3x wall at 100x rows on the r11 slope sweep purely
    from re-running the input parse per branch; single-pass is one scan
    + two |classes|-sized exchanges. A class appearing only in labels
    or only in predictions still gets its row (its contribution rows
    simply carry zeros on the other side). NULL classes group as one
    row (groupBy NULL semantics — the old full-outer kept label-NULL
    and pred-NULL apart, a distinction no caller relied on)."""
    cells = (
        df.select(F.col(label_col).alias("y"), F.col(pred_col).alias("p"))
        .groupBy("y", "p")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    zero = F.lit(0).cast("long")
    contrib = cells.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("y").alias("cls"),
                    F.col("n").alias("sup"),
                    zero.alias("prd"),
                    F.when(F.col("y") == F.col("p"), F.col("n"))
                    .otherwise(zero)
                    .alias("tp"),
                ),
                F.struct(
                    F.col("p").alias("cls"),
                    zero.alias("sup"),
                    F.col("n").alias("prd"),
                    zero.alias("tp"),
                ),
            )
        ).alias("c")
    ).select("c.*")
    return contrib.groupBy("cls").agg(
        F.sum("sup").alias("support"),
        F.sum("prd").alias("predicted"),
        F.sum("tp").alias("tp"),
    )


def classification_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per class: (class, support, predicted, tp, fp, fn, precision_9,
    recall_9, f1_9) — one row for every class seen in labels OR
    predictions; zero-division cells are NULL (undefined, not 0)."""
    out = _per_class_counts(df, label_col, pred_col).select(
        "cls",
        "support",
        "predicted",
        "tp",
        (F.col("predicted") - F.col("tp")).alias("fp"),
        (F.col("support") - F.col("tp")).alias("fn"),
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


def pr_auc(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """One row: (n_pos, n_neg, n_scores, ap_12_sum, ap_9,
    average_precision) — the step-wise precision-recall AUC (average
    precision, the non-interpolated definition):

        AP = sum_k (R_k - R_{k-1}) * P_k     over thresholds descending
           = (1/P) * sum_k dtp_k * tp_k / n_k

    where, walking the DISTINCT-SCORE histogram in descending score
    order, tp_k / n_k are the cumulative positive / total counts at or
    above score k and dtp_k the positives exactly at k. Each term
    quantizes to floor(1e12 * dtp_k * tp_k / n_k) — an exact truncating
    integer division in decimal(38) (== DuckDB HUGEINT //, operands
    non-negative) — so ap_12_sum is an order-independent integer sum
    (per-term bias < 1e-12, bounded by 1e-12 * n_scores total); ap_9 =
    floor(ap_12_sum / (1000 * P)) re-quantizes exactly, and
    average_precision closes with ONE fixed-shape IEEE chain
    (ap_12_sum / P / 1e12 — two correctly-rounded divisions, identical
    on both engines).

    Scale shape — the roc_auc posture verbatim: one hash aggregate to
    the distinct-score histogram (the only data-sized pass), one
    ordered window over the score DOMAIN (quantize continuous scores
    upstream; the repo integerization policy doubles as the tie
    policy), one 1-row reduction. NULL scores drop; ap is NULL when
    there are no positives (recall undefined). Complements roc_auc:
    AUC-ROC is prevalence-invariant, AP weights the head of the
    ranking — the metric that moves when a rare-positive retrieval
    stack (BM25 / ANN / RRF) actually improves."""
    base = df.filter(F.col(score_col).isNotNull()).select(
        F.col(label_col).cast("boolean").alias("_pos"),
        F.col(score_col).alias("_s"),
    )
    hist = base.groupBy("_s").agg(
        F.sum(F.col("_pos").cast("long")).alias("cp"),
        F.sum((~F.col("_pos")).cast("long")).alias("cn"),
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("_s").desc()).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.withColumn("tp", F.sum("cp").over(w)).withColumn(
        "nk", F.sum(F.col("cp") + F.col("cn")).over(w)
    )
    term12 = F.expr(
        f"CAST(CAST(cp AS {DEC38}) * tp * 1000000000000"
        f" div CAST(nk AS {DEC38}) AS BIGINT)"
    )
    agg = cum.agg(
        F.sum("cp").alias("n_pos"),
        F.sum("cn").alias("n_neg"),
        F.count(F.lit(1)).alias("n_scores"),
        F.sum(term12.cast(DEC38)).alias("_ap12"),
    )
    ok = F.col("n_pos") > 0
    return agg.select(
        "n_pos",
        "n_neg",
        "n_scores",
        F.col("_ap12").cast("long").alias("ap_12_sum"),
        F.when(
            ok,
            F.expr(
                f"CAST(_ap12 div (CAST(1000 AS {DEC38}) * n_pos) AS BIGINT)"
            ),
        ).alias("ap_9"),
        F.when(
            ok,
            F.col("_ap12").cast("double")
            / F.col("n_pos").cast("double")
            / F.lit(1e12),
        ).alias("average_precision"),
    )


def classification_report_averages(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """One row of corpus-level averages over the per-class report —
    micro / macro / weighted, the three standard multi-class rollups:

    * micro: pooled counts — precision = sum(tp)/sum(predicted), recall
      = sum(tp)/sum(support), f1 their harmonic mean; in single-label
      classification all three equal accuracy (sum(predicted) ==
      sum(support) == n), emitted separately anyway so the relation
      stays correct for cell tables from other sources.
    * macro: the unweighted mean over classes of the per-class
      1e9-quantized ratios; zero-division classes contribute 0 AND
      count in the denominator (the standard zero_division=0
      convention — a never-predicted class must DRAG the macro down,
      not vanish). The mean is over the quantized values, so it is an
      exact integer computation with bias < 1e-9 per class.
    * weighted: support-weighted mean of the same quantized ratios —
      prediction-only classes carry weight 0 by construction.

    Pure column math over the |classes|^2 cell relation
    (classification_report's scale shape; nothing here is data-sized):
    one extra 1-row aggregate. Output: (n, n_classes, micro_*_9,
    macro_*_9, weighted_*_9 for precision/recall/f1)."""
    rep = classification_report(df, label_col, pred_col)
    agg = rep.agg(
        F.sum("support").alias("n"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("tp").alias("_tp"),
        F.sum("predicted").alias("_pred"),
        F.sum("fp").alias("_fp"),
        F.sum("fn").alias("_fn"),
        F.sum(F.coalesce("precision_9", F.lit(0))).alias("_sp9"),
        F.sum(F.coalesce("recall_9", F.lit(0))).alias("_sr9"),
        F.sum(F.coalesce("f1_9", F.lit(0))).alias("_sf9"),
        F.sum(
            (F.col("support") * F.coalesce("precision_9", F.lit(0))).cast(DEC38)
        ).alias("_wp9"),
        F.sum(
            (F.col("support") * F.coalesce("recall_9", F.lit(0))).cast(DEC38)
        ).alias("_wr9"),
        F.sum(
            (F.col("support") * F.coalesce("f1_9", F.lit(0))).cast(DEC38)
        ).alias("_wf9"),
    )

    def ratio9(num_sql: str, den_sql: str):
        return F.when(
            F.expr(den_sql) > 0,
            F.expr(
                f"CAST(CAST({num_sql} AS {DEC38}) * 1000000000"
                f" div CAST({den_sql} AS {DEC38}) AS BIGINT)"
            ),
        )

    return agg.select(
        "n",
        "n_classes",
        ratio9("_tp", "_pred").alias("micro_precision_9"),
        ratio9("_tp", "n").alias("micro_recall_9"),
        ratio9("2 * _tp", "2 * _tp + _fp + _fn").alias("micro_f1_9"),
        F.expr("CAST(_sp9 div n_classes AS BIGINT)").alias("macro_precision_9"),
        F.expr("CAST(_sr9 div n_classes AS BIGINT)").alias("macro_recall_9"),
        F.expr("CAST(_sf9 div n_classes AS BIGINT)").alias("macro_f1_9"),
        F.when(
            F.col("n") > 0, F.expr(f"CAST(_wp9 div CAST(n AS {DEC38}) AS BIGINT)")
        ).alias("weighted_precision_9"),
        F.when(
            F.col("n") > 0, F.expr(f"CAST(_wr9 div CAST(n AS {DEC38}) AS BIGINT)")
        ).alias("weighted_recall_9"),
        F.when(
            F.col("n") > 0, F.expr(f"CAST(_wf9 div CAST(n AS {DEC38}) AS BIGINT)")
        ).alias("weighted_f1_9"),
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
    chance-corrected agreement). Everything (n, agree, pe_num) derives
    from the single-pass per-class relation, so the base is scanned
    once (the _per_class_counts rationale)."""
    out = _per_class_counts(df, label_col, pred_col).agg(
        F.sum("support").alias("n"),
        F.sum("tp").alias("agree"),
        F.sum((F.col("support") * F.col("predicted")).cast(DEC38)).alias(
            "pe_num"
        ),
    )
    num = F.expr(f"CAST(n AS {DEC38}) * agree - pe_num")
    den = F.expr(f"CAST(n AS {DEC38}) * n - pe_num")
    ok = F.expr(f"CAST(n AS {DEC38}) * n") != F.col("pe_num")
    return out.select(
        "n",
        "agree",
        F.col("pe_num").cast("long").alias("pe_num"),
        F.when(
            ok,
            F.expr(
                f"CAST((CAST(n AS {DEC38}) * agree - pe_num) * 1000000000"
                f" div (CAST(n AS {DEC38}) * n - pe_num) AS BIGINT)"
            ),
        ).alias("kappa_9"),
        F.when(ok, num.cast("double") / den.cast("double")).alias("kappa"),
    )


def mcnemar_test(
    df: DataFrame, label_col: str, pred_a_col: str, pred_b_col: str
) -> DataFrame:
    """One row: (n, both_correct, only_a, only_b, neither, chi2_9, chi2)
    — McNemar's test for comparing TWO classifiers on the SAME examples
    (the paired design the offline-eval family needs when an A/B model
    swap shares its eval set; an unpaired two-proportion z over the two
    accuracy rates — o27 — throws away the pairing and underpowers).

    Only the discordant cells carry signal: b = only_a = #(A correct,
    B wrong), c = only_b = #(A wrong, B correct); the statistic is the
    exact rational (b - c)^2 / (b + c) — the classical chi-square form
    WITHOUT continuity correction (stated; the corrected variant
    derives downstream from the same integers, which is why the four
    cell counts ship). chi2_9 = floor(1e9 * (b-c)^2 / (b+c)) via one
    truncating decimal(38) division (non-negative operands); chi2
    closes with one fixed-shape IEEE chain; NULL when b + c == 0 (the
    classifiers never disagree — no paired evidence either way).

    Scale shape: ONE map-side-combinable aggregate over the data; the
    statistic is a projection over the single result row."""
    # NULL-robust: a NULL prediction (or label) counts as incorrect for
    # that classifier, so the four cells always partition n exactly
    a_ok = F.coalesce(
        (F.col(pred_a_col) == F.col(label_col)).cast("long"), F.lit(0)
    )
    b_ok = F.coalesce(
        (F.col(pred_b_col) == F.col(label_col)).cast("long"), F.lit(0)
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a_ok * b_ok).alias("both_correct"),
        F.sum(a_ok * (1 - b_ok)).alias("only_a"),
        F.sum((1 - a_ok) * b_ok).alias("only_b"),
        F.sum((1 - a_ok) * (1 - b_ok)).alias("neither"),
    )
    diff = F.col("only_a") - F.col("only_b")
    disc = F.col("only_a") + F.col("only_b")
    ok = disc > 0
    return agg.select(
        "n",
        "both_correct",
        "only_a",
        "only_b",
        "neither",
        F.when(
            ok,
            F.expr(
                f"CAST(CAST(only_a - only_b AS {DEC38})"
                f" * (only_a - only_b) * 1000000000"
                f" div CAST(only_a + only_b AS {DEC38}) AS BIGINT)"
            ),
        ).alias("chi2_9"),
        F.when(
            ok,
            (diff * diff).cast("double") / disc.cast("double"),
        ).alias("chi2"),
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
