"""Association rules over baskets — support / confidence / lift, exact.

Market-basket analysis (Agrawal & Srikant 1994's single-level core):
which item pairs co-occur in the same basket more than their individual
popularity predicts? The analytics-engine staple behind co-purchase
recommendations and — in the corpus world — co-occurrence audits
("sources that ship together"). For the 2-itemset level:

    support(a,b)   = n_ab / N
    confidence a→b = n_ab / n_a
    lift(a,b)      = N * n_ab / (n_a * n_b)

Everything is a basket COUNT, so all three are exact rationals; they
ship as scaled-integer *_9 floors (one positive-operand integer division
each, decimal(38)/HUGEINT identical in both engines) alongside the raw
counts — downstream thresholds can use either.

Scale shape: pair generation is the ONLY superlinear step and it is
bounded by basket size, not corpus size — a self-join of the
(basket, item) relation on the basket key emits sum_b |b|·(|b|-1)/2
pairs (the PMI/cooccur posture: never corpus x corpus). The a < b
canonical order halves the pair stream; distinct-per-basket upstream
(presence semantics) caps |b| at the item vocabulary. Item counts ride
one hash agg; the N dim constant-folds. min_support prunes BEFORE the
lift join: only pairs clearing the count threshold join the broadcast
item-count dim. Skew note: a mega-basket (one key holding 10^5 items)
quadratically dominates — cap basket size upstream (the domain-cap
pattern) or salt the basket key; the gate's baskets are TPC-H orders
(<= 7 items), the benign regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC38 = "decimal(38,0)"


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int,
) -> DataFrame:
    """Canonical-pair rules: (item_a, item_b, n_a, n_b, n_ab, support_9,
    conf_a_to_b_9, conf_b_to_a_9, lift_9) for pairs with
    n_ab >= min_pair_count. Input rows are (basket, item) memberships;
    duplicates collapse (presence semantics). NULL items/baskets drop.
    """
    m = (
        baskets.filter(
            F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
        )
        .select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    n_items = m.groupBy("item").agg(F.count(F.lit(1)).alias("n_i"))
    n_baskets = m.select("b").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    left = m.select("b", F.col("item").alias("item_a"))
    right = m.select("b", F.col("item").alias("item_b"))
    pairs = (
        left.join(right, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_count)
    )
    j = (
        pairs.join(
            F.broadcast(n_items.select(F.col("item").alias("item_a"),
                                       F.col("n_i").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(n_items.select(F.col("item").alias("item_b"),
                                       F.col("n_i").alias("n_b"))),
            "item_b",
        )
        .join(F.broadcast(n_baskets))
    )
    return j.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_ab",
        F.expr(f"(CAST(1000000000 AS {DEC38}) * n_ab) div n").alias("support_9"),
        F.expr(f"(CAST(1000000000 AS {DEC38}) * n_ab) div n_a").alias(
            "conf_a_to_b_9"
        ),
        F.expr(f"(CAST(1000000000 AS {DEC38}) * n_ab) div n_b").alias(
            "conf_b_to_a_9"
        ),
        F.expr(
            f"(CAST(1000000000 AS {DEC38}) * n * n_ab) div "
            f"(CAST(n_a AS {DEC38}) * n_b)"
        ).alias("lift_9"),
    )
