"""2-D skyline (Pareto frontier), maximizing both dimensions.

Point p dominates q iff p.x >= q.x AND p.y >= q.y AND p != q (as a pair).
The skyline is the set of undominated points — the classic multi-criteria
pruning operator (best customers by order count AND spend; best pools by
liquidity AND volume; reference analogue: the "most competitive" bundle
screens in crates/brontes-inspect sort on several PnL axes at once).

Algorithm, all relational:
  1. collapse to distinct points with multiplicity: groupBy(x, y) — one
     hash aggregate with map-side combine;
  2. per-x champion: only max(y) within an x can survive (same x, larger
     y dominates) — rides the SAME aggregate via a second groupBy(x);
  3. sweep x descending: a per-x champion is on the frontier iff its y
     strictly exceeds the running max(y) of all larger x (those have
     x strictly greater, so y >= kills; ties in y lose to the larger x).

Step 3 is an ordered window with no partition key — but its input is the
per-x champion relation, whose size is |distinct x|, not the data. When x
is high-cardinality (continuous), `prune_local=True` inserts a
partition-local sweep FIRST, keyed by spark_partition_id(): dominance is
transitive, so any point dominated inside one partition is dominated
globally — local survivors are a superset of the frontier, typically tiny
(O(log n) expected for independent dims), and only they reach the global
sweep. The pruned result is provably identical (tests pin it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _sweep(pts: DataFrame, x: str, y: str, part_col: str | None) -> DataFrame:
    """Keep rows whose y strictly beats every strictly-larger-x row's y."""
    if part_col is None:
        w = W.orderBy(F.col(x).desc()).rowsBetween(W.unboundedPreceding, -1)
    else:
        w = (
            W.partitionBy(part_col)
            .orderBy(F.col(x).desc())
            .rowsBetween(W.unboundedPreceding, -1)
        )
    cm = F.max(y).over(w)
    return (
        pts.withColumn("_cm", cm)
        .filter(F.col("_cm").isNull() | (F.col(y) > F.col("_cm")))
        .drop("_cm")
    )


def skyline_max2(
    df: DataFrame, x_col: str, y_col: str, prune_local: bool = False
) -> DataFrame:
    """(x, y, n_pts) — the undominated distinct points and how many input
    rows sit exactly on each. Duplicates of a frontier point all count
    (identical points never dominate each other)."""
    pts = df.groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y")).agg(
        F.count(F.lit(1)).alias("n_pts")
    )
    champs = pts.groupBy("x").agg(
        F.max("y").alias("y"), F.expr("max_by(n_pts, y)").alias("n_pts")
    )
    if prune_local:
        # pid is assignment-dependent but ANY assignment yields a frontier
        # superset (transitivity); the global sweep makes the result exact
        local = champs.withColumn("_pid", F.spark_partition_id())
        champs = _sweep(local, "x", "y", "_pid").drop("_pid")
        # local survivors can share an x across partitions: re-champion
        champs = champs.groupBy("x").agg(
            F.max("y").alias("y"), F.expr("max_by(n_pts, y)").alias("n_pts")
        )
    return _sweep(champs, "x", "y", None).select("x", "y", "n_pts")
