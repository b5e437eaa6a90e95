"""Exact-quantile bucketize + RFM segmentation.

Feature discretization at scale: map a numeric column into k
near-equal-population buckets using EXACT quantile cut values. The naive
form — ntile(k) over a global window — is a single-partition sort (one
task owns the whole relation), the canonical 100 TB anti-pattern. This
operator instead:

  1. computes the k-1 cut values with the two-pass histogram->refine
     rank-selection core (operators/sketches._ranks_exact: one hash agg
     + one bounded refine shuffle — never a global sort);
  2. bakes the cuts into a pure-codegen comparison chain
     (bucket = 1 + sum_i [v > cut_i]) — ZERO additional shuffle, and the
     bucketed scan stays inside whole-stage codegen.

Cut convention: cut_i = value at ascending rank ceil(i*n/k)
(percentile_disc 'lower' — an actual data value), ties collapse into the
LOWER bucket on both engines. Duplicate cuts (heavy ties) skip bucket
labels consistently: if c1 == c2, no value lands in bucket 2 — bucket
POPULATIONS equalize only as far as tie mass allows, which is the honest
semantics of quantile binning (ntile's forced equal counts split tied
values arbitrarily — not reproducible, not meaningful).

RFM segmentation (recency / frequency / monetary quintiles) is the
classic consumer of exactly this primitive: one per-key aggregate, three
cut computations over the (much smaller) per-user relation, three
codegen bucket chains. Exact integers end to end.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import _ranks_exact


def quantile_cuts(
    df: DataFrame, val_col: str, k: int, buckets: int = 4096
) -> list[int]:
    """The k-1 exact cut values (ascending, possibly with duplicates).

    Driver-side bounded result (k-1 integers — a summary, never
    data-sized). Empty input returns []. n < k degenerates gracefully:
    ranks repeat, duplicate cuts skip labels.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    vals = df.select(F.col(val_col).alias("v")).filter(F.col("v").isNotNull())
    n = vals.count()
    if n == 0:
        return []
    ranks = sorted({max(1, math.ceil(i * n / k)) for i in range(1, k)})
    rv = {r["rank"]: r["value"] for r in _ranks_exact(vals, ranks, buckets).collect()}
    return [rv[max(1, math.ceil(i * n / k))] for i in range(1, k)]


def bucket_expr(val: Column, cuts: list[int]) -> Column:
    """1 + sum_i [val > cut_i] as a literal comparison chain (codegen)."""
    out = F.lit(1)
    for c in cuts:
        out = out + (val > F.lit(c)).cast("int")
    return out


def rfm_segments(
    events: DataFrame,
    key_col: str,
    ts_ns_col: str,
    cents_col: str,
    k: int = 5,
) -> DataFrame:
    """(key, recency_ns, frequency, monetary, r_bucket, f_bucket, m_bucket).

    recency_ns = global max event time minus the key's last event time
    (smaller = more recent, so bucket 1 is the MOST recent cohort —
    consistent with frequency/monetary where bucket k is the top cohort
    only if you flip; the raw metrics ship alongside the buckets so any
    scoring convention can be applied downstream).
    """
    agg = events.groupBy(key_col).agg(
        F.max(ts_ns_col).alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents_col).alias("monetary"),
    )
    gmax = agg.agg(F.max("last_ts").alias("gmax"))
    base = agg.join(F.broadcast(gmax)).select(
        key_col,
        (F.col("gmax") - F.col("last_ts")).alias("recency_ns"),
        "frequency",
        "monetary",
    )
    # the per-key relation re-reads three times for cut computation; cut
    # it loose from the event scan so each pass reuses the aggregate
    base = base.localCheckpoint(eager=False)
    cuts = {m: quantile_cuts(base, m, k) for m in ("recency_ns", "frequency", "monetary")}
    return base.select(
        key_col,
        "recency_ns",
        "frequency",
        "monetary",
        bucket_expr(F.col("recency_ns"), cuts["recency_ns"]).alias("r_bucket"),
        bucket_expr(F.col("frequency"), cuts["frequency"]).alias("f_bucket"),
        bucket_expr(F.col("monetary"), cuts["monetary"]).alias("m_bucket"),
    )
