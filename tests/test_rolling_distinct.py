"""rolling_distinct (operators/rolling_distinct.py) vs a Python
reference: random-event parity, zero-filled silent days, W=1 ≡ daily
distinct, and window nesting."""

from __future__ import annotations

import random
from collections import defaultdict

from brontes_spark.operators.rolling_distinct import rolling_distinct

DAY = 86_400_000_000_000


def _ref(rows, w):
    by_day = defaultdict(set)
    for k, ts in rows:
        by_day[ts // DAY].add(k)
    d0, d1 = min(by_day), max(by_day)
    out = {}
    for d in range(d0, d1 + 1):
        s = set()
        for dd in range(d - w + 1, d + 1):
            s |= by_day.get(dd, set())
        out[d] = len(s)
    return out


def _got(df):
    return {r["day"]: r["n_active"] for r in df.collect()}


def _mk(seed, n=300, span_days=25, users=40):
    rng = random.Random(seed)
    return [
        (rng.randrange(users), rng.randrange(span_days) * DAY + rng.randrange(DAY))
        for _ in range(n)
    ]


def test_matches_reference(spark):
    rows = _mk(5)
    df = spark.createDataFrame(rows, "k long, ts long")
    for w in (1, 3, 7):
        assert _got(rolling_distinct(df, "k", "ts", w)) == _ref(rows, w), w


def test_silent_days_report_zero(spark):
    rows = [(1, 0), (2, 20 * DAY)]  # 19 silent days between
    df = spark.createDataFrame(rows, "k long, ts long")
    got = _got(rolling_distinct(df, "k", "ts", 1))
    assert got[0] == 1 and got[20] == 1
    assert all(got[d] == 0 for d in range(1, 20))
    assert len(got) == 21  # clipped to the observed span


def test_duplicate_user_in_window_counts_once(spark):
    rows = [(7, 0), (7, DAY), (7, 2 * DAY)]
    df = spark.createDataFrame(rows, "k long, ts long")
    got = _got(rolling_distinct(df, "k", "ts", 7))
    assert got == {0: 1, 1: 1, 2: 1}


def test_windows_nest(spark):
    rows = _mk(9)
    df = spark.createDataFrame(rows, "k long, ts long")
    w1 = _got(rolling_distinct(df, "k", "ts", 1))
    w7 = _got(rolling_distinct(df, "k", "ts", 7))
    assert all(w7[d] >= w1[d] for d in w1)
