"""Deterministic group-aware fold assignment — CV splits without leakage.

Every training pipeline needs a train/validation/test split, and the two
classic failure modes are both LEAKAGE: (1) rows of the same entity
(user, document cluster, domain) landing in different folds, so the
model sees the validation entities during training; (2) nondeterministic
splits, so no two runs evaluate on the same data. Both die with one
rule: fold = md5(group_key) % k — the split is a pure function of the
GROUP key, so every row of a group shares a fold by construction and any
engine reproduces the assignment bit-for-bit (functions/hashing.md5_long,
the repo's cross-engine hash).

The companion report answers "is the split USABLE": per-fold row/group
counts and per-class row counts (a grossly unbalanced class in a small
fold invalidates the metric). Hash-mod folds are binomially balanced,
not exactly equal — the report is where that shows, and exact-n
stratified sampling (operators/sampling.py) is the documented
alternative when exact sizes matter more than group atomicity.

Scale: assignment is one codegen hash per row (zero shuffle, split
columns write with the data); the report is one hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def with_fold(
    df: DataFrame, group_col: str, k: int, out_col: str = "fold",
    seed: int = 0,
) -> DataFrame:
    """Append `out_col` = md5(seed|group) % k — same group, same fold,
    every engine, every run. NULL groups get NULL folds (an unkeyed row
    cannot be leakage-safely assigned; surface them via a dq check)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = md5_long(F.col(group_col).cast("string"), seed=seed)
    return df.withColumn(
        out_col,
        F.when(F.col(group_col).isNotNull(), h % k),
    )


def fold_report(
    df: DataFrame, group_col: str, class_col: str, k: int, seed: int = 0
) -> DataFrame:
    """(fold, class, n_rows, n_groups) — the balance audit. A group
    appearing under two folds here would be leakage; it cannot happen by
    construction, and tests/test_folds.py pins exactly that invariant."""
    folded = with_fold(df, group_col, k, seed=seed).filter(
        F.col("fold").isNotNull()
    )
    return folded.groupBy("fold", F.col(class_col).alias("class")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(group_col).alias("n_groups"),
    )
