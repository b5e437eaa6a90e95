"""Unit tests for transition_stats (operators/markov.py) and twap
(operators/twap.py): hand-computed golds, edge semantics, and a
Fraction-exact Python reference sweep for TWAP."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from brontes_spark.operators.markov import transition_stats
from brontes_spark.operators.twap import twap


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------- markov


def test_markov_hand_computed(spark):
    # user 1: a b a b   -> a>b x2, b>a x1
    # user 2: a a b     -> a>a x1, a>b x1
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
         (2, 1, "a"), (2, 2, "a"), (2, 3, "b")],
        "k int, o int, s string",
    )
    got = _rows(
        transition_stats(df, "k", ["o"], "s"),
        "from_state", "to_state", "n", "n_from", "prob9",
    )
    assert got == [
        ("a", "a", 1, 4, 250_000_000),
        ("a", "b", 3, 4, 750_000_000),
        ("b", "a", 1, 1, 1_000_000_000),
    ]


def test_markov_first_event_not_a_transition(spark):
    df = spark.createDataFrame(
        [(1, 1, "x"), (2, 1, "x"), (3, 1, "x")], "k int, o int, s string"
    )
    assert transition_stats(df, "k", ["o"], "s").count() == 0


def test_markov_prob9_sums_to_at_most_1e9_per_source(spark):
    df = spark.createDataFrame(
        [(1, i, s) for i, s in enumerate("abcabcaabbcc")], "k int, o int, s string"
    )
    out = (
        transition_stats(df, "k", ["o"], "s")
        .groupBy("from_state")
        .agg(F.sum("prob9").alias("p"), F.count(F.lit(1)).alias("k_out"))
        .collect()
    )
    for r in out:
        # floor() loses < 1 per outgoing edge
        assert 1_000_000_000 - r["k_out"] < r["p"] <= 1_000_000_000


def test_markov_tiebreak_makes_equal_ts_deterministic(spark):
    # two events at the SAME order value: tie col fixes the sequence
    df = spark.createDataFrame(
        [(1, 1, 10, "a"), (1, 1, 11, "b"), (1, 2, 12, "c")],
        "k int, o int, tie int, s string",
    )
    got = _rows(
        transition_stats(df, "k", ["o", "tie"], "s"), "from_state", "to_state"
    )
    assert got == [("a", "b"), ("b", "c")]


# ------------------------------------------------------------------ twap


def test_twap_hand_computed(spark):
    # 100 for 2s, then 200 for 2s -> 150; single-obs key -> NULL
    df = spark.createDataFrame(
        [(1, 0, 100.0, 1), (1, 2_000_000_000, 200.0, 2),
         (1, 4_000_000_000, 50.0, 3), (2, 0, 10.0, 4)],
        "k int, ts_ns long, px double, id int",
    )
    got = {r["key"]: r for r in twap(df, "k", "ts_ns", "px", "id").collect()}
    assert got[1]["twap9"] == 150 * 10**9
    assert got[1]["span_ms"] == 4000
    assert got[1]["n_obs"] == 3
    assert got[2]["twap9"] is None
    assert got[2]["span_ms"] == 0


def test_twap_last_observation_contributes_zero(spark):
    # the closing price must NOT pull the average (span ends at last ts)
    df = spark.createDataFrame(
        [(1, 0, 100.0, 1), (1, 1_000_000_000, 999.99, 2)],
        "k int, ts_ns long, px double, id int",
    )
    got = twap(df, "k", "ts_ns", "px", "id").collect()[0]
    assert got["twap9"] == 100 * 10**9


def test_twap_equal_timestamps_latest_tick_supersedes(spark):
    # co-timestamped observations: every one except the LAST (in tie
    # order) gets a zero-length interval, so the last tick at a timestamp
    # is the one that holds until the next timestamp — the market
    # convention for same-instant quote updates
    df = spark.createDataFrame(
        [(1, 0, 100.0, 1), (1, 0, 555.0, 2), (1, 2_000_000_000, 300.0, 3)],
        "k int, ts_ns long, px double, id int",
    )
    got = twap(df, "k", "ts_ns", "px", "id").collect()[0]
    assert got["twap9"] == 555 * 10**9


def test_twap_matches_fraction_reference(spark):
    # pseudo-random walk, exact rational reference with floor to 1e-9
    import random

    rng = random.Random(7)
    rows = []
    ref: dict[int, list[tuple[int, int]]] = {}
    for k in range(4):
        t = 0
        for i in range(25):
            t += rng.randrange(1, 5_000) * 1_000_000  # ms-aligned ns steps
            cents = rng.randrange(100, 99_999)
            rows.append((k, t, cents / 100.0, k * 1000 + i))
            ref.setdefault(k, []).append((t // 1_000_000, cents))
    df = spark.createDataFrame(rows, "k int, ts_ns long, px double, id int")
    got = {r["key"]: r["twap9"] for r in twap(df, "k", "ts_ns", "px", "id").collect()}
    for k, obs in ref.items():
        num = sum(
            c * (obs[i + 1][0] - obs[i][0]) for i, (_, c) in enumerate(obs[:-1])
        )
        den = obs[-1][0] - obs[0][0]
        want = (Fraction(num, den) * Fraction(10**9, 100)).__floor__()
        assert got[k] == want, k
