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
