"""Bipartite co-occurrence projection — the item-item (or domain-domain,
token-token, source-source) graph a training-data pipeline builds from a
(user, item) interaction table: edge weight = number of distinct users
touching both endpoints. The backbone of co-click similarity, data-mix
co-occurrence audits, and item-based recommenders (Sarwar et al. 2001).

Scale shape: the quadratic step is the per-user pair explode, so the
operator FIRST bounds every user's item set: distinct (user, item) ->
per-user top ``per_user_cap`` items under the deterministic
(interactions DESC, item ASC) order — WindowGroupLimit runs map-side
before the shuffle, so a pathological user (a crawler touching every
item) contributes at most cap*(cap-1)/2 pairs instead of |items|^2 (the
same hub-suppression the SNM window and the LSH band caps apply; the cap
is part of the operator's definition and both engines' results honor
it). After capping: ONE user-key self-join produces ordered pairs, one
(i, j) count aggregate — two shuffles total, both map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def bipartite_cooccurrence(
    interactions: DataFrame,
    user: str,
    item: str,
    per_user_cap: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """(item_a, item_b, n_users) with item_a < item_b, n_users = distinct
    users interacting with both (after the per-user cap), kept when
    n_users >= min_count."""
    per_ui = (
        interactions.select(F.col(user).alias("u"), F.col(item).alias("i"))
        .groupBy("u", "i")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    rank = F.row_number().over(
        Window.partitionBy("u").orderBy(F.col("n_inter").desc(), F.col("i"))
    )
    capped = per_ui.withColumn("rk", rank).filter(
        F.col("rk") <= per_user_cap
    ).select("u", "i")
    a = capped.select("u", F.col("i").alias("item_a"))
    b = capped.select("u", F.col("i").alias("item_b"))
    pairs = a.join(b, "u").filter(F.col("item_a") < F.col("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= min_count)
    )
