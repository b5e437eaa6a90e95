"""Governance screens: k-anonymity/l-diversity semantics (NULL classes,
homogeneous-secret leak) and Benford exactness (absent digits, hand gold)."""

from __future__ import annotations

from brontes_spark.operators.benford import BENFORD_P9, benford_screen
from brontes_spark.operators.kanon import kanon_summary, kanon_violations


def _kdf(spark, rows):
    return spark.createDataFrame(rows, "zip string, age string, disease string")


def test_k_and_l_violations(spark):
    rows = (
        # class (A, young): 3 records, all same disease -> l-violation only
        [("A", "young", "flu")] * 3
        # class (B, old): 1 record -> k-violation (and l)
        + [("B", "old", "flu")]
        # class (C, mid): 3 records, 3 diseases -> safe at k=2, l=2
        + [("C", "mid", d) for d in ("flu", "cold", "cough")]
    )
    got = {
        (r["zip"], r["age"]): r
        for r in kanon_violations(
            _kdf(spark, rows), ["zip", "age"], "disease", k=2, l_div=2
        ).collect()
    }
    assert got[("A", "young")]["l_violation"] is True
    assert got[("A", "young")]["k_violation"] is False
    assert got[("B", "old")]["k_violation"] is True
    assert ("C", "mid") not in got


def test_null_qi_is_its_own_class_and_null_sensitive_counts(spark):
    rows = [(None, "x", "flu"), (None, "x", None), ("A", "x", "flu")]
    got = {
        (r["zip"], r["age"]): r
        for r in kanon_violations(
            _kdf(spark, rows), ["zip", "age"], "disease", k=3, l_div=1
        ).collect()
    }
    # the NULL-zip class exists, size 2, with 2 sensitive states (flu, NULL)
    assert got[(None, "x")]["class_size"] == 2
    assert got[(None, "x")]["n_sensitive"] == 2


def test_summary_row(spark):
    rows = [("A", "y", "flu")] * 5 + [("B", "y", "flu")]
    [s] = kanon_summary(_kdf(spark, rows), ["zip", "age"], "disease",
                        k=3, l_div=1).collect()
    assert s["n_classes"] == 2 and s["n_records"] == 6
    assert s["n_violating_classes"] == 1 and s["records_at_risk"] == 1
    assert s["min_class_size"] == 1 and s["min_sensitive_diversity"] == 1


def test_benford_hand_gold_and_absent_digits(spark):
    df = spark.createDataFrame(
        [(10,), (19,), (23,), (10,), (0,), (-5,), (None,)], "cents long"
    )
    got = {r["digit"]: r for r in benford_screen(df, "cents").collect()}
    assert len(got) == 9  # every digit reported
    assert got[1]["n_obs"] == 3 and got[2]["n_obs"] == 1
    n = 4  # zero/negative/NULL excluded
    for d in range(1, 10):
        obs = {1: 3, 2: 1}.get(d, 0)
        dev = 10**9 * obs - n * BENFORD_P9[d]
        assert got[d]["chi2_9"] == dev * dev // (n * BENFORD_P9[d]), d
