"""ROC-AUC + classification report (operators/ml_eval.py) against
brute-force pair-counting / sklearn-free mirrors."""

from __future__ import annotations

from collections import Counter


def _brute_auc(pairs):
    pos = [s for y, s in pairs if y]
    neg = [s for y, s in pairs if not y]
    if not pos or not neg:
        return None
    num2 = 0
    for p in pos:
        for n in neg:
            num2 += 2 if p > n else (1 if p == n else 0)
    return num2, 2 * len(pos) * len(neg)


def test_auc_matches_pair_counting(spark):
    from brontes_spark.operators.ml_eval import roc_auc

    cases = {
        "perfect": [(True, 10), (True, 9), (False, 2), (False, 1)],
        "inverted": [(True, 1), (False, 10)],
        "ties": [(True, 5), (True, 5), (False, 5), (False, 3), (True, 2)],
        "noisy": [(True, 7), (False, 6), (True, 5), (False, 8), (True, 9),
                  (False, 2), (True, 3), (False, 3)],
    }
    for name, pairs in cases.items():
        df = spark.createDataFrame(pairs, "y boolean, s long")
        r = roc_auc(df, "y", "s").collect()[0]
        num2, den2 = _brute_auc(pairs)
        assert (r["auc_num2"], r["auc_den2"]) == (num2, den2), name
        assert r["auc_9"] == (10**9 * num2) // den2, name
        assert abs(r["auc"] - num2 / den2) < 1e-15, name
    perfect = roc_auc(
        spark.createDataFrame(cases["perfect"], "y boolean, s long"), "y", "s"
    ).collect()[0]
    assert perfect["auc"] == 1.0
    inv = roc_auc(
        spark.createDataFrame(cases["inverted"], "y boolean, s long"), "y", "s"
    ).collect()[0]
    assert inv["auc"] == 0.0


def test_auc_degenerate_single_class(spark):
    from brontes_spark.operators.ml_eval import roc_auc

    df = spark.createDataFrame([(True, 1), (True, 2)], "y boolean, s long")
    r = roc_auc(df, "y", "s").collect()[0]
    assert r["n_neg"] == 0 and r["auc"] is None and r["auc_9"] is None


def test_classification_report_counts_and_ratios(spark):
    from brontes_spark.operators.ml_eval import classification_report

    pairs = (
        [("a", "a")] * 8 + [("a", "b")] * 2
        + [("b", "b")] * 5 + [("b", "a")] * 3 + [("b", "c")] * 2
        + [("c", "a")] * 1  # class c never predicted correctly
        + [("d", "d")] * 0
    )
    df = spark.createDataFrame(pairs, "y string, p string")
    got = {r["cls"]: r for r in classification_report(df, "y", "p").collect()}
    labels = Counter(y for y, _ in pairs)
    preds = Counter(p for _, p in pairs)
    tps = Counter(y for y, p in pairs if y == p)
    assert set(got) == set(labels) | set(preds)
    for cls, r in got.items():
        tp, sup, pred = tps[cls], labels[cls], preds[cls]
        assert (r["support"], r["predicted"], r["tp"]) == (sup, pred, tp), cls
        assert (r["fp"], r["fn"]) == (pred - tp, sup - tp), cls
        assert r["precision_9"] == ((10**9 * tp) // pred if pred else None), cls
        assert r["recall_9"] == ((10**9 * tp) // sup if sup else None), cls
        den = 2 * tp + (pred - tp) + (sup - tp)
        assert r["f1_9"] == ((10**9 * 2 * tp) // den if den else None), cls
    # 'c' was predicted (by nobody correctly) AND labeled: both marginals
    assert got["c"]["tp"] == 0 and got["c"]["recall_9"] == 0


def test_cohens_kappa_exact(spark):
    from brontes_spark.operators.ml_eval import cohens_kappa

    # hand case: 2x2 with known kappa
    pairs = [("a", "a")] * 20 + [("a", "b")] * 5 + [("b", "a")] * 10 + [("b", "b")] * 15
    df = spark.createDataFrame(pairs, "y string, p string")
    r = cohens_kappa(df, "y", "p").collect()[0]
    n = 50
    agree = 35
    pe_num = 25 * 30 + 25 * 20  # sup_a*pred_a + sup_b*pred_b
    assert (r["n"], r["agree"], r["pe_num"]) == (n, agree, pe_num)
    num, den = n * agree - pe_num, n * n - pe_num
    assert r["kappa_9"] == (10**9 * num) // den
    assert abs(r["kappa"] - num / den) < 1e-15
    # perfect agreement -> kappa 1; constant table -> NULL
    perf = cohens_kappa(
        spark.createDataFrame([("x", "x"), ("y", "y")], "y string, p string"),
        "y", "p",
    ).collect()[0]
    assert perf["kappa"] == 1.0
    const = cohens_kappa(
        spark.createDataFrame([("x", "x"), ("x", "x")], "y string, p string"),
        "y", "p",
    ).collect()[0]
    assert const["kappa"] is None and const["kappa_9"] is None


def test_negative_kappa_truncates_toward_zero(spark):
    from brontes_spark.operators.ml_eval import cohens_kappa

    # systematic disagreement: kappa < 0; quantization must truncate
    # toward zero (match python's int(num/den) for negative rationals)
    pairs = [("a", "b")] * 10 + [("b", "a")] * 10 + [("a", "a")] * 1
    df = spark.createDataFrame(pairs, "y string, p string")
    r = cohens_kappa(df, "y", "p").collect()[0]
    n, agree = 21, 1
    pe_num = 11 * 11 + 10 * 10
    num, den = n * agree - pe_num, n * n - pe_num
    assert num < 0
    want = int(10**9 * num / den) if num * den > 0 else -((10**9 * -num) // den)
    assert r["kappa_9"] == want
    assert abs(r["kappa"] - num / den) < 1e-15


def test_calibration_bins_and_brier(spark):
    from brontes_spark.operators.ml_eval import calibration_report

    rows = [
        (500, False), (900, False), (1500, True),     # bins 0, 0, 1
        (9500, True), (9900, True), (10000, False),   # bins 9, 9, 9 (clamp)
        (5000, True), (5000, False),                  # bin 5
    ]
    df = spark.createDataFrame(rows, "p long, y boolean")
    got = {r["bin"]: r for r in calibration_report(df, "p", "y").collect()}
    assert set(got) == {0, 1, 5, 9}
    b0 = got[0]
    assert (b0["n"], b0["sum_p_bp"], b0["n_pos"]) == (2, 1400, 0)
    assert b0["brier2_sum"] == 500**2 + 900**2
    assert b0["mean_p_9"] == (10**9 * 1400) // (2 * 10000)
    assert b0["frac_pos_9"] == 0
    b9 = got[9]
    assert (b9["n"], b9["n_pos"]) == (3, 2)
    assert b9["brier2_sum"] == 500**2 + 100**2 + 10000**2
    # global Brier derives: sum(brier2_sum) / (n * 1e8)
    total = sum(r["brier2_sum"] for r in got.values())
    want = sum((p - (10000 if y else 0)) ** 2 for p, y in rows)
    assert total == want


def test_calibration_rejects_bad_bins(spark):
    import pytest

    from brontes_spark.operators.ml_eval import calibration_report

    df = spark.createDataFrame([(1, True)], "p long, y boolean")
    with pytest.raises(ValueError):
        calibration_report(df, "p", "y", n_bins=7)


def _brute_ap(pairs):
    """Step-wise average precision over the distinct-score histogram,
    mirroring the operator's term quantization exactly."""
    from collections import defaultdict

    hist = defaultdict(lambda: [0, 0])
    for y, s in pairs:
        hist[s][0 if y else 1] += 1
    tp = n = 0
    ap12 = 0
    n_scores = 0
    for s in sorted(hist, reverse=True):
        cp, cn = hist[s]
        tp += cp
        n += cp + cn
        ap12 += (10**12 * cp * tp) // n
        n_scores += 1
    p = sum(1 for y, _ in pairs if y)
    return p, len(pairs) - p, n_scores, ap12


def test_pr_auc_matches_histogram_walk(spark):
    from brontes_spark.operators.ml_eval import pr_auc

    cases = {
        "perfect": [(True, 10), (True, 9), (False, 2), (False, 1)],
        "inverted": [(True, 1), (False, 10), (False, 9)],
        "ties": [(True, 5), (True, 5), (False, 5), (False, 3), (True, 2)],
        "noisy": [(True, 7), (False, 6), (True, 5), (False, 8), (True, 9),
                  (False, 2), (True, 3), (False, 3)],
        "single_pos": [(True, 4), (False, 9), (False, 1)],
    }
    for name, pairs in cases.items():
        df = spark.createDataFrame(pairs, "y boolean, s long")
        r = pr_auc(df, "y", "s").collect()[0]
        p, nn, n_scores, ap12 = _brute_ap(pairs)
        assert (r["n_pos"], r["n_neg"], r["n_scores"]) == (p, nn, n_scores), name
        assert r["ap_12_sum"] == ap12, name
        assert r["ap_9"] == ap12 // (1000 * p), name
        assert abs(r["average_precision"] - ap12 / p / 1e12) < 1e-15, name
    # perfect ranking: every term has precision 1 -> AP exactly 1
    r = pr_auc(
        spark.createDataFrame(cases["perfect"], "y boolean, s long"), "y", "s"
    ).collect()[0]
    assert r["average_precision"] == 1.0


def test_pr_auc_no_positives_is_null(spark):
    from brontes_spark.operators.ml_eval import pr_auc

    df = spark.createDataFrame([(False, 3), (False, 1)], "y boolean, s long")
    r = pr_auc(df, "y", "s").collect()[0]
    assert r["n_pos"] == 0
    assert r["ap_9"] is None and r["average_precision"] is None


def test_report_averages_match_counter_mirror(spark):
    from brontes_spark.operators.ml_eval import classification_report_averages

    pairs = (
        [("a", "a")] * 8 + [("a", "b")] * 2
        + [("b", "b")] * 5 + [("b", "a")] * 3 + [("b", "c")] * 2
        + [("c", "a")] * 1          # c: labeled, never predicted right
        + [("a", "d")] * 1          # d: predicted only (support 0)
    )
    df = spark.createDataFrame(pairs, "y string, p string")
    r = classification_report_averages(df, "y", "p").collect()[0]

    labels = Counter(y for y, _ in pairs)
    preds = Counter(p for _, p in pairs)
    tps = Counter(y for y, p in pairs if y == p)
    classes = sorted(set(labels) | set(preds))
    n = len(pairs)

    def p9(c):
        return (10**9 * tps[c]) // preds[c] if preds[c] else 0

    def r9(c):
        return (10**9 * tps[c]) // labels[c] if labels[c] else 0

    def f9(c):
        den = 2 * tps[c] + (preds[c] - tps[c]) + (labels[c] - tps[c])
        return (10**9 * 2 * tps[c]) // den if den else 0

    tp_tot = sum(tps.values())
    assert (r["n"], r["n_classes"]) == (n, len(classes))
    # micro == accuracy for single-label input, all three ways
    assert r["micro_precision_9"] == (10**9 * tp_tot) // n
    assert r["micro_recall_9"] == (10**9 * tp_tot) // n
    assert r["micro_f1_9"] == (10**9 * 2 * tp_tot) // (2 * n)
    assert r["macro_precision_9"] == sum(p9(c) for c in classes) // len(classes)
    assert r["macro_recall_9"] == sum(r9(c) for c in classes) // len(classes)
    assert r["macro_f1_9"] == sum(f9(c) for c in classes) // len(classes)
    assert r["weighted_precision_9"] == sum(labels[c] * p9(c) for c in classes) // n
    assert r["weighted_recall_9"] == sum(labels[c] * r9(c) for c in classes) // n
    assert r["weighted_f1_9"] == sum(labels[c] * f9(c) for c in classes) // n
    # the dead classes drag macro strictly below micro here
    assert r["macro_f1_9"] < r["micro_f1_9"]


def test_report_averages_perfect_prediction(spark):
    from brontes_spark.operators.ml_eval import classification_report_averages

    pairs = [("a", "a")] * 3 + [("b", "b")] * 7
    df = spark.createDataFrame(pairs, "y string, p string")
    r = classification_report_averages(df, "y", "p").collect()[0]
    for c in ("micro", "macro", "weighted"):
        for m in ("precision", "recall", "f1"):
            assert r[f"{c}_{m}_9"] == 10**9, (c, m)


def test_mcnemar_matches_hand_counts(spark):
    from brontes_spark.operators.ml_eval import mcnemar_test

    rows = (
        [("x", "x", "x")] * 10     # both correct
        + [("x", "x", "y")] * 6    # only A
        + [("x", "y", "x")] * 2    # only B
        + [("x", "y", "z")] * 3    # neither
        + [("x", None, "x")] * 1   # NULL pred A -> only B
    )
    df = spark.createDataFrame(rows, "y string, pa string, pb string")
    r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
    assert (r["n"], r["both_correct"]) == (22, 10)
    assert (r["only_a"], r["only_b"], r["neither"]) == (6, 3, 3)
    assert r["both_correct"] + r["only_a"] + r["only_b"] + r["neither"] == r["n"]
    assert r["chi2_9"] == (10**9 * (6 - 3) ** 2) // (6 + 3)
    assert abs(r["chi2"] - 9 / 9) < 1e-15


def test_mcnemar_no_disagreement_is_null(spark):
    from brontes_spark.operators.ml_eval import mcnemar_test

    df = spark.createDataFrame(
        [("a", "a", "a"), ("b", "c", "c")], "y string, pa string, pb string"
    )
    r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
    assert r["only_a"] == 0 and r["only_b"] == 0
    assert r["chi2_9"] is None and r["chi2"] is None
