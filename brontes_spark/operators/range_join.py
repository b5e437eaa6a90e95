"""Interval-overlap (range) join — the time-window join every event
pipeline needs (ad view x click attribution, session x outage overlap,
quote-validity x trade matching) that naive SQL expresses as an
inequality join, which Spark executes as a broadcast NESTED LOOP: O(L x R)
per key and a non-starter at 100 TB.

`interval_overlap_join` instead BUCKETS time: each interval explodes to
the fixed-width bucket ids it covers, the two sides equi-join on
(keys..., bucket) — a plain hash shuffle join Catalyst/AQE can plan like
any other — and the exact half-open overlap predicate filters the
bucket-collisions. A pair overlapping several buckets would duplicate, so
each joined row keeps only the bucket containing the overlap's START
(max of the two starts): every surviving pair is emitted EXACTLY once
with zero distinct/dedup shuffle — the standard banding trick
(DuckDB's IEJoin paper calls it staircase partitioning; Spark's own
range-join hints on Databricks use the same binning).

Bucket width is the one dial: explode factor is ~interval_len/bucket per
row, so set it near the TYPICAL interval length (cost = linear in
covered buckets; correctness is bucket-independent, property-pinned).
Timestamps are integer (epoch-ns here); floor-division bucketing uses the
pmod form so pre-epoch (negative) timestamps band identically in both
engines (the gapfill r8 fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_id(col: str, bucket: int):
    # exact integer floor(col / bucket): subtract the positive remainder
    # then integer-divide — trunc == floor on exact multiples, negatives
    # included; never a double division (epoch-ns exceeds 2^53)
    return F.expr(f"({col} - pmod({col}, {bucket})) div {bucket}")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: list[str] | None = None,
    bucket: int = 3_600_000_000_000,
) -> DataFrame:
    """All (left row, right row) pairs with equal `on` keys whose half-open
    intervals [l_start, l_end) and [r_start, r_end) overlap, each pair
    exactly once. Column names of the two inputs must be disjoint apart
    from `on` (pre-alias; this module refuses to guess a suffix policy).
    Empty/inverted intervals (end <= start) never match, by predicate.

    Output columns: on-keys, then left's columns, then right's columns.
    """
    if bucket < 1:
        raise ValueError(f"bucket must be >= 1, got {bucket}")
    on = list(on or [])
    overlap_left = set(left.columns) & set(right.columns) - set(on)
    if overlap_left:
        raise ValueError(
            f"ambiguous columns {sorted(overlap_left)}: alias one side first"
        )
    # drop empty/inverted intervals BEFORE the explode: they can never
    # match, and Spark's sequence() would otherwise run DESCENDING for
    # end < start and explode garbage buckets
    lb = left.filter(F.col(l_end) > F.col(l_start)).withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket_id(l_start, bucket),
                _bucket_id(f"{l_end} - 1", bucket),
            )
        ),
    )
    rb = right.filter(F.col(r_end) > F.col(r_start)).withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket_id(r_start, bucket),
                _bucket_id(f"{r_end} - 1", bucket),
            )
        ),
    )
    joined = lb.join(rb, on + ["_b"])
    start_max = F.greatest(F.col(l_start), F.col(r_start))
    overlap = (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    first_bucket = F.expr(
        f"(greatest({l_start}, {r_start})"
        f" - pmod(greatest({l_start}, {r_start}), {bucket})) div {bucket}"
    )
    out_cols = on + [c for c in left.columns if c not in on] + [
        c for c in right.columns if c not in on
    ]
    return (
        joined.filter(overlap & (F.col("_b") == first_bucket))
        .withColumn("overlap_start", start_max)
        .withColumn("overlap_end", F.least(F.col(l_end), F.col(r_end)))
        .select(*out_cols, "overlap_start", "overlap_end")
    )
