"""Salted equi-join — the explicit hot-key mitigation for shuffle joins:
the skewed (big) side gets a per-row salt in [0, n_salts); the other side
replicates once per salt value; the join key becomes (key, salt). One hot
key's rows then spread across `n_salts` reducers instead of ONE, at the
cost of replicating the small side n_salts times — the classic trade
(documented in every Spark skew playbook; AQE's skewedJoin covers the
sort-merge case automatically by SPLITTING oversized partitions, but
salting remains the tool when the skew feeds a downstream aggregation on
the same key, when the join is a broadcast-ineligible hash join, or when
one key's rows exceed what a single split can hold).

Correctness is salt-invariant BY CONSTRUCTION: every left row joins
exactly the replicate of the right rows carrying its salt, so the result
multiset equals the plain join for ANY salt assignment — which is why the
per-row salt may be nondeterministic (monotonically_increasing_id is not
stable across task retries; any assignment is equally correct, and the
oracle twin is simply the unsalted join)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join `skewed` (the big side with hot keys) to `other` on `on`,
    spreading each key over `n_salts` sub-keys. Column names must be
    disjoint apart from `on`. `how` supports 'inner' and 'left' (the
    shapes where per-row salting is sound; a right/full join would need
    the salt on the other side)."""
    if n_salts < 2:
        raise ValueError(f"n_salts must be >= 2, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    overlap = set(skewed.columns) & set(other.columns) - set(on)
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}: alias one side first"
        )
    l = skewed.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    r = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out_cols = on + [c for c in skewed.columns if c not in on] + [
        c for c in other.columns if c not in on
    ]
    return l.join(r, on + ["_salt"], how).select(*out_cols)
