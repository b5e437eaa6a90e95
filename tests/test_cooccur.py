"""Bipartite co-occurrence projection (operators/cooccur.py) against a
brute-force mirror, including the per-user cap's deterministic
(interactions DESC, item ASC) order and the min_count filter."""

from __future__ import annotations

from collections import Counter


def _brute(interactions, per_user_cap, min_count):
    per_user = {}
    for u, i in interactions:
        per_user.setdefault(u, Counter())[i] += 1
    pair_users = Counter()
    for u, cnt in per_user.items():
        kept = sorted(cnt, key=lambda i: (-cnt[i], i))[:per_user_cap]
        kept = sorted(kept)
        for a_idx, a in enumerate(kept):
            for b in kept[a_idx + 1:]:
                pair_users[(a, b)] += 1
    return {p: n for p, n in pair_users.items() if n >= min_count}


def test_cooccurrence_matches_bruteforce(spark):
    from brontes_spark.operators.bipartite import bipartite_cooccurrence

    interactions = [
        # u1: a twice, b, c -> all pairs
        ("u1", "a"), ("u1", "a"), ("u1", "b"), ("u1", "c"),
        # u2: a, b
        ("u2", "a"), ("u2", "b"),
        # u3: b, c, d
        ("u3", "b"), ("u3", "c"), ("u3", "d"),
        # u4: singleton
        ("u4", "a"),
    ]
    df = spark.createDataFrame(interactions, "user string, item string")
    for cap, mc in [(50, 1), (50, 2), (2, 1)]:
        want = _brute(interactions, cap, mc)
        got = {
            (r["item_a"], r["item_b"]): r["n_users"]
            for r in bipartite_cooccurrence(
                df, "user", "item", per_user_cap=cap, min_count=mc
            ).collect()
        }
        assert got == want, (cap, mc)


def test_cap_tiebreak_is_deterministic(spark):
    from brontes_spark.operators.bipartite import bipartite_cooccurrence

    # u has 3 items all with ONE interaction: cap=2 must keep the two
    # smallest item ids (count ties broken by item ASC), so the only
    # surviving pair is (a, b) via u and v
    rows = [("u", "c"), ("u", "a"), ("u", "b"), ("v", "a"), ("v", "b")]
    df = spark.createDataFrame(rows, "user string, item string")
    got = {
        (r["item_a"], r["item_b"]): r["n_users"]
        for r in bipartite_cooccurrence(
            df, "user", "item", per_user_cap=2, min_count=1
        ).collect()
    }
    assert got == {("a", "b"): 2}
