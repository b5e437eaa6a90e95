"""Keyed table diff — added / removed / changed rows between snapshots.

The validation primitive behind every migration, backfill, and CDC
pipeline: "what exactly changed between yesterday's table and today's?"
(the reference's equivalent moment is re-running a block range after a
classifier fix and diffing MevBlocks). Full outer join on the key, one
pass, with a per-column comparison vector:

  * added    — key only in `new`
  * removed  — key only in `old`
  * changed  — key in both, at least one compared column differs
  * unchanged rows are DROPPED from the detail output (they are the bulk
    at 100 TB; `diff_counts` reports their count from the same join).

`changed_cols` is a comma-joined, schema-ordered list of differing
columns, so downstream can route fixes per column. NULL-safe equality
(<=>) throughout — NULL -> value and value -> NULL are real changes,
NULL -> NULL is not.

Scale shape: ONE full outer hash join on the key (both sides shuffle
once), comparison vector is pure codegen, detail output is bounded by
the true change set. Duplicate keys are a caller bug (enforce upstream);
the join would pair them combinatorially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tagged(df: DataFrame, key_cols: list[str], cols: list[str], tag: str):
    return df.select(
        *key_cols, *[F.col(c).alias(f"{tag}_{c}") for c in cols]
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key..., status, changed_cols) for every added/removed/changed
    key; unchanged keys are dropped. `compare_cols` defaults to every
    shared non-key column."""
    if not key_cols:
        raise ValueError("table_diff needs at least one key column")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = _tagged(old, key_cols, compare_cols, "o").withColumn(
        "_in_old", F.lit(True)
    )
    n = _tagged(new, key_cols, compare_cols, "n").withColumn(
        "_in_new", F.lit(True)
    )
    j = o.join(n, key_cols, "full_outer")
    in_old = F.coalesce(F.col("_in_old"), F.lit(False))
    in_new = F.coalesce(F.col("_in_new"), F.lit(False))
    diffs = [
        F.when(
            ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_cols = F.concat_ws(",", *diffs) if diffs else F.lit("")
    status = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(changed_cols != F.lit(""), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *key_cols,
            "status",
            F.when(F.col("status") == "changed", changed_cols)
            .otherwise(F.lit("")).alias("changed_cols"),
        )
    )


def diff_counts(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(status, n) including the 'unchanged' bulk — the summary face of
    the same single-join comparison."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = _tagged(old, key_cols, compare_cols, "o").withColumn(
        "_in_old", F.lit(True)
    )
    n = _tagged(new, key_cols, compare_cols, "n").withColumn(
        "_in_new", F.lit(True)
    )
    j = o.join(n, key_cols, "full_outer")
    in_old = F.coalesce(F.col("_in_old"), F.lit(False))
    in_new = F.coalesce(F.col("_in_new"), F.lit(False))
    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
    status = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
