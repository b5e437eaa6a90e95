"""Deterministic cardinality sketches.

Engines estimate distinct counts with HLL-family sketches
(`approx_count_distinct`); their merge internals are implementation-defined,
so two engines never agree bit-for-bit. The KMV (k-minimum-values)
estimator gives the same statistical machinery — bounded-size sketch,
mergeable, ~1/sqrt(k) relative error — from a DETERMINISTIC hash: the k
smallest md5 values of the key set are a pure function of the data, so the
sketch AND the estimate are engine-identical (a DuckDB oracle can check
them exactly), and re-running on any partitioning gives the same answer.

Estimator (Bar-Yossef et al. 2002): with hashes uniform on [0, M), the
k-th smallest hash h_(k) of n distinct values ≈ k*M/n, so
n̂ = (k-1) * M / h_(k)  (the unbiased form). Integer division keeps the
estimate engine-portable (both engines truncate positive division).

Scale shape: the hash dedup is a map-side-combined groupBy on 60-bit longs;
the per-group k-smallest is a bounded window (rank <= k) — the sketch rows
that leave the shuffle are k per group, never the value set. Sketches merge
by union + re-rank (union of two KMVs' value lists, take k smallest), which
is how a 100 TB per-partition pass folds into a global estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: hash space size: md5_long default is 15 hex chars = 60 bits
_M = 1 << 60


def kmv_sketch(
    df: DataFrame, key_col: str, val_col: str, k: int = 64
) -> DataFrame:
    """(key, pos, hv) — the k smallest distinct 60-bit hashes of `val_col`
    per `key_col` group: the mergeable sketch itself (k rows per group)."""
    hashed = df.select(
        F.col(key_col).alias("key"), md5_long(F.col(val_col)).alias("hv")
    ).distinct()
    w = W.partitionBy("key").orderBy("hv")
    return (
        hashed.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select("key", "pos", "hv")
    )


def kmv_distinct(
    df: DataFrame, key_col: str, val_col: str, k: int = 64
) -> DataFrame:
    """(key, n_seen, kth_min, est_distinct) per group.

    Groups with fewer than k distinct values report their EXACT count
    (n_seen < k means the sketch saw everything — the standard KMV small-
    cardinality fallback); larger groups report the (k-1)*M/h_(k) integer
    estimate. `n_seen` = min(k, true distinct) rides along so callers can
    tell which regime a row is in."""
    sk = kmv_sketch(df, key_col, val_col, k)
    agg = sk.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max(F.when(F.col("pos") == k, F.col("hv"))).alias("kth_min"),
    )
    # (k-1)*M exceeds BIGINT (63 * 2^60 ≈ 7.3e19): compute the numerator in
    # Python and ship it as a DECIMAL(38,0) literal — a `{k-1} * {M}` SQL
    # expression would constant-fold in LONG and overflow under ANSI
    numer = (k - 1) * _M
    # nullif guards the 2^-60-per-value corner where a hash is exactly 0 and
    # h_(k)=0 (non-zero odds over a 100 TB corpus): the estimate degrades to
    # NULL instead of the division throwing under ANSI mode (ADVICE r6).
    return agg.select(
        "key",
        "n_seen",
        "kth_min",
        F.when(F.col("n_seen") < k, F.col("n_seen"))
        .otherwise(
            F.expr(f"CAST('{numer}' AS DECIMAL(38,0)) div nullif(kth_min, 0)")
        )
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge KMV sketches (outputs of kmv_sketch over disjoint or
    overlapping slices): union the value lists, drop duplicate hashes, and
    re-rank to the k smallest per key — the distributed fold that lets a
    100 TB corpus sketch per-partition and combine. Union of the SAME data
    split any way reproduces the full-data sketch exactly (property-pinned
    in tests/test_property.py)."""
    merged = sketches[0].select("key", "hv")
    for s in sketches[1:]:
        merged = merged.unionByName(s.select("key", "hv"))
    w = W.partitionBy("key").orderBy("hv")
    return (
        merged.distinct()
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select("key", "pos", "hv")
    )
