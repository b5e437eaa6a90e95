"""Association rules (hand-counted basket golds, prune, presence
semantics) and Pareto cover (prefix golds, zero-total, tie order)."""

from __future__ import annotations

from brontes_spark.operators.assoc import association_rules
from brontes_spark.operators.pareto import pareto_cover
import pytest


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, item string")


@pytest.mark.slow
def test_assoc_hand_counts(spark):
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(_baskets(spark, rows), "b", "item", 1).collect()
    }
    r = got[("x", "y")]
    # N=4, n_x=3, n_y=3, n_xy=2
    assert (r["n_a"], r["n_b"], r["n_ab"]) == (3, 3, 2)
    assert r["support_9"] == 500_000_000          # 2/4
    assert r["conf_a_to_b_9"] == 666_666_666      # 2/3 floored
    assert r["lift_9"] == 888_888_888             # 4*2/(3*3)
    # canonical order only: (y, x) never appears
    assert ("y", "x") not in got
    assert got[("x", "z")]["n_ab"] == 1


def test_assoc_prune_and_presence(spark):
    # duplicate membership rows collapse; min_pair_count prunes
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "q")]
    got = association_rules(_baskets(spark, rows), "b", "item", 2).collect()
    assert {(r["item_a"], r["item_b"]) for r in got} == {("x", "y")}
    assert got[0]["n_ab"] == 2 and got[0]["n_a"] == 3


def test_pareto_prefix_gold(spark):
    rows = [
        ("g", "a", 50), ("g", "b", 30), ("g", "c", 15), ("g", "d", 5),
        ("h", "a", 10),
        ("z", "a", 0),
    ]
    df = spark.createDataFrame(rows, "grp string, member string, c long")
    got = {
        r["grp"]: r for r in pareto_cover(df, "grp", "member", "c").collect()
    }
    # g: cum 50, 80, 95 -> 80% of 100 reached at rank 2
    assert got["g"]["n_cover"] == 2
    assert got["g"]["top1_share_9"] == 500_000_000
    assert got["g"]["n_members"] == 4 and got["g"]["total"] == 100
    # single member covers everything
    assert got["h"]["n_cover"] == 1 and got["h"]["top1_share_9"] == 1_000_000_000
    # zero total: share undefined
    assert got["z"]["n_cover"] is None and got["z"]["top1_share_9"] is None


def test_pareto_tie_break_deterministic(spark):
    # equal contributions: prefix order is member-ascending
    rows = [("g", m, 25) for m in ("d", "b", "a", "c")]
    df = spark.createDataFrame(rows, "grp string, member string, c long")
    [r] = pareto_cover(df, "grp", "member", "c", num=1, den=2).collect()
    assert r["n_cover"] == 2  # 50% at the 2nd of four equal members
