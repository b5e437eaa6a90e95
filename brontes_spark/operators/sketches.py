"""Deterministic cardinality and frequency sketches.

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
    # NULL values are not set members — and a NULL hash would rank FIRST
    # in Spark's ascending order but LAST in DuckDB's, displacing a real
    # k-minimum (the bloom NULL bug class, ADVICE r7)
    hashed = df.filter(F.col(val_col).isNotNull()).select(
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


def hll_sketch(
    df: DataFrame, key_col: str, val_col: str, p: int = 6
) -> DataFrame:
    """(key, bucket, rho_max) — HyperLogLog registers (Flajolet et al.
    2007) per `key_col` group, m = 2^p buckets, from the SAME deterministic
    md5 hash as KMV so the registers themselves are oracle-recomputable:
    bucket = the hash's top p bits, rho = position of the first 1-bit in
    the remaining 60-p (via the integer-exact length-of-binary-string
    trick — Spark `length(conv(w,10,2))` == DuckDB `length(bin(w))`, no
    float log2 whose 1-ulp misround could shift a register).

    Only OBSERVED buckets emit rows (absent bucket == register 0), so the
    sketch is at most m rows per key and merges by max — the 100 TB fold
    is a map-side-combined max groupBy, like count-min's."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    w_bits = 60 - p
    # NULLs are not set members (a NULL hash would emit a NULL-bucket
    # register row and corrupt the estimate; same class as kmv/bloom)
    hashed = df.filter(F.col(val_col).isNotNull()).select(
        F.col(key_col).alias("key"), md5_long(F.col(val_col)).alias("hv")
    )
    bucketed = hashed.select(
        "key",
        F.shiftright("hv", w_bits).alias("bucket"),
        # hv is non-negative 60-bit, so mod == low-bits mask (Column & is
        # boolean AND in PySpark, not bitwise)
        (F.col("hv") % F.lit(1 << w_bits)).alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(w_bits + 1)).otherwise(
            F.lit(w_bits) - F.length(F.conv(F.col("w"), 10, 2)) + 1
        ),
    )
    return bucketed.groupBy("key", "bucket").agg(F.max("rho").alias("rho_max"))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge HLL sketches (outputs of hll_sketch over any slicing): the
    element-wise register max — union semantics exactly, the same
    distributed fold as countmin_merge."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("key", "bucket").agg(F.max("rho_max").alias("rho_max"))


def _hll_alpha(m: int) -> tuple[int, int]:
    """The standard HLL bias constant as an exact rational (num, den)."""
    if m == 16:
        return 673, 1000
    if m == 32:
        return 697, 1000
    if m == 64:
        return 709, 1000
    return 7213 * m, 10000 * m + 10790


def hll_distinct(
    df: DataFrame, key_col: str, val_col: str, p: int = 6
) -> DataFrame:
    """(key, n_buckets, zeros, s_num, raw_est, est_distinct) per group.

    The raw HLL estimate alpha_m * m^2 / sum_j 2^(-M_j) is computed as ONE
    integer division: the indicator sum scales to s_num = sum_j 2^(B - M_j)
    with B = 61 - p (the max possible rho), empty registers contributing
    2^B each — s_num <= m * 2^B = 2^61 fits a bigint, and
    raw_est = alpha_num * m^2 * 2^B div (alpha_den * s_num) is exact and
    engine-identical (`raw_est`, `s_num`, `zeros` are the gate-checkable
    columns). `est_distinct` applies the standard small-range correction —
    linear counting m * ln(m / zeros) when raw_est <= 5m/2 and zeros > 0 —
    as a double (ln is float; pytest-pinned for accuracy, never hashed)."""
    m = 1 << p
    b = 61 - p
    a_num, a_den = _hll_alpha(m)
    sk = hll_sketch(df, key_col, val_col, p)
    agg = sk.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({b} - rho_max AS INT))")
        ).alias("s_obs"),
    )
    zeros = F.lit(m) - F.col("n_buckets")
    s_num = F.col("s_obs") + zeros * F.lit(1 << b)
    raw = F.expr(
        f"CAST({a_num} AS DECIMAL(38,0)) * {m} * {m}"
        f" * CAST({1 << b} AS DECIMAL(38,0))"
        f" div (CAST({a_den} AS DECIMAL(38,0)) * s_num)"
    ).cast("long")
    out = (
        agg.withColumn("zeros", zeros)
        .withColumn("s_num", s_num)
        .withColumn("raw_est", raw)
    )
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros"))
    est = F.when(
        (F.col("raw_est") <= (5 * m) // 2) & (F.col("zeros") > 0), lc
    ).otherwise(F.col("raw_est").cast("double"))
    return out.select(
        "key", "n_buckets", "zeros", "s_num", "raw_est", est.alias("est_distinct")
    )


def quantiles_exact(
    df: DataFrame,
    val_col: str,
    qs: list[float],
    buckets: int = 4096,
) -> DataFrame:
    """EXACT order statistics without a full sort — the two-pass
    histogram-refine pattern for "p50/p95/p99 over 100 TB":

    Pass 1: one hash aggregate over equi-width buckets (exact DECIMAL
    bucket math — (v-min)*B can overflow BIGINT on full-range longs). The
    <= `buckets`-row histogram is collected driver-side: a bounded summary
    dimension, the same documented exception class as the token-graph
    (SURVEY §4) — it never grows with the data.
    Pass 2: locate each target rank's bucket in the histogram, then ONE
    filtered scan shuffles ONLY the targeted buckets' rows (~N/buckets
    each) into per-bucket sort windows and picks the in-bucket offsets.

    Rank convention: k = max(1, ceil(q*N)) over non-null values ascending
    (the percentile_disc 'lower' form — every returned value is an actual
    data value, never an interpolation). Returns (q double, rank long,
    value long). Integral columns only: exactness is integer exactness
    (quantize doubles upstream, the repo-wide decimal policy).

    Worst case: a single dominant value concentrates its bucket (refine
    sorts that bucket's rows); correctness is unaffected and `buckets` is
    the dial. Min/max/count ride the same pass-1 aggregate, so the whole
    operator is two scans + one bounded shuffle.
    """
    import math

    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("quantiles must lie in [0, 1]")
    spark = df.sparkSession
    out_schema = "q double, rank long, value long"
    vals = df.select(F.col(val_col).alias("v")).filter(F.col("v").isNotNull())
    n = vals.count()
    if n == 0:
        return spark.createDataFrame([], out_schema)
    rank_of = {q: max(1, math.ceil(q * n)) for q in qs}
    rv = _ranks_exact(vals, sorted(set(rank_of.values())), buckets)
    pairs = spark.createDataFrame(
        [(q, r) for q, r in rank_of.items()], "q double, rank long"
    )
    return pairs.join(F.broadcast(rv), "rank").select("q", "rank", "value")


def _ranks_exact(vals: DataFrame, ranks: list[int], buckets: int) -> DataFrame:
    """(rank, value) for explicit 1-based ascending ranks over the non-null
    `v` column — the shared histogram->refine core of quantiles_exact and
    percentiles_cont. Pass 1's <= `buckets`-row histogram collects
    driver-side (bounded summary, never data-sized); pass 2 shuffles only
    the targeted buckets."""
    spark = vals.sparkSession
    stats = vals.agg(F.min("v").alias("mn"), F.max("v").alias("mx")).collect()[0]
    mn, mx = int(stats["mn"]), int(stats["mx"])
    width_den = mx - mn + 1
    bexpr = (
        f"CAST((CAST(v AS DECIMAL(38,0)) - {mn}) * {buckets} "
        f"div {width_den} AS INT)"
    )
    hist = vals.groupBy(F.expr(bexpr).alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).collect()
    counts = {r["b"]: r["cnt"] for r in hist}
    # cumulative counts in bucket order -> (bucket, in-bucket offset) per rank
    order = sorted(counts)
    cum, running = {}, 0
    for bkt in order:
        cum[bkt] = running  # rows strictly before this bucket
        running += counts[bkt]
    targets: list[tuple[int, int, int]] = []  # (rank, bucket, off)
    for rank in ranks:
        for bkt in order:
            if cum[bkt] + counts[bkt] >= rank:
                targets.append((rank, bkt, rank - cum[bkt]))
                break
    need = sorted({t[1] for t in targets})
    in_bucket = (
        vals.withColumn("b", F.expr(bexpr))
        .filter(F.col("b").isin(need))
        .withColumn("pos", F.row_number().over(W.partitionBy("b").orderBy("v")))
    )
    wanted = spark.createDataFrame(
        [(r, bkt, off) for r, bkt, off in targets], "rank long, b int, pos int"
    )
    return in_bucket.join(F.broadcast(wanted), ["b", "pos"]).select(
        "rank", F.col("v").cast("long").alias("value")
    )


def percentiles_cont(
    df: DataFrame,
    val_col: str,
    qs: list[tuple[int, int]],
    buckets: int = 4096,
) -> DataFrame:
    """EXACT interpolated percentiles (the percentile_cont / SQL-standard
    convention: position p = q*(n-1) 0-indexed, linear interpolation
    between the bracketing order statistics) via the same two-pass
    histogram->refine as quantiles_exact — no full sort.

    `qs` are RATIONALS (num, den), so the bracketing ranks and the
    interpolation weight are exact integers: r_lo = (num*(n-1)) div den
    (0-based), rem = (num*(n-1)) mod den, and

        value_cont = (v_lo * (den - rem) + v_hi * rem) / den

    — one integer-to-double division, IEEE-identical in both engines (the
    gapfill fixed-evaluation-shape policy). Returns (q_num, q_den, rank_lo,
    rem, v_lo, v_hi, value_cont). Integral columns only, like
    quantiles_exact."""
    if not qs or any(
        d < 1 or not 0 <= nu <= d for nu, d in qs
    ):
        raise ValueError("each q must be a rational (num, den) in [0, 1]")
    spark = df.sparkSession
    out_schema = (
        "q_num int, q_den int, rank_lo long, rem long, "
        "v_lo long, v_hi long, value_cont double"
    )
    vals = df.select(F.col(val_col).alias("v")).filter(F.col("v").isNotNull())
    n = vals.count()
    if n == 0:
        return spark.createDataFrame([], out_schema)
    spec = []
    for nu, d in qs:
        p = nu * (n - 1)
        r_lo = p // d + 1  # 1-based
        rem = p % d
        spec.append((nu, d, r_lo, rem, r_lo + 1 if rem else r_lo))
    ranks = sorted({r for *_, r in spec} | {s[2] for s in spec})
    rv = {r.rank: r.value for r in _ranks_exact(vals, ranks, buckets).collect()}
    rows = []
    for nu, d, r_lo, rem, r_hi in spec:
        v_lo, v_hi = rv[r_lo], rv[r_hi]
        rows.append(
            (nu, d, r_lo, rem, v_lo, v_hi,
             (v_lo * (d - rem) + v_hi * rem) / d)
        )
    return spark.createDataFrame(rows, out_schema)


def frequent_items(
    df: DataFrame,
    val_col: str,
    freq_num: int = 1,
    freq_den: int = 100,
    counters: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters (items with count > freq_num/freq_den of all
    rows) in two passes — the 100 TB pattern for "frequent tokens /
    domains / shingles" where a full groupBy would shuffle every row:

    Pass 1 (NO shuffle): each partition folds its rows into a Misra-Gries
    summary of `counters` entries inside one mapInPandas generator (state
    carries across the partition's Arrow batches; per-batch exact
    value_counts merge via the standard add-then-subtract-(k+1)th-largest
    compaction of Agarwal et al. 2013, which is itself an MG summary).
    Pigeonhole completeness: an item with global frequency > num/den has
    partition frequency > 1/(counters+1) in at least one partition (the
    default counters = den//num makes 1/(counters+1) < num/den), so it
    SURVIVES that partition's summary — the candidate union provably
    contains every true heavy hitter. Candidates are bounded by
    partitions x counters rows (1000 executors x 100 counters = 10^5,
    trivially broadcastable).

    Pass 2 (one bounded shuffle): broadcast the candidate set, group the
    full data by candidate-or-null (non-candidates collapse into the null
    group, so the aggregate output is <= candidates+1 rows), take exact
    counts, derive the total row count from the SAME aggregate (a window
    sum over the tiny result — no second scan, no driver-side count), and
    keep items with count * den > num * total: an exact integer
    comparison, no float threshold.

    Returns (val_col, n, total). Null keys are excluded up front (a null
    is not an item; pandas value_counts would drop it mid-summary
    otherwise). False positives from pass 1 are eliminated by pass 2's
    exact counts, so the result equals the plain
    groupBy-count-filter-by-fraction plan on ANY partitioning —
    property-pinned in tests/test_sketches.py.

    Reference analog: the reference keeps running most-active address/
    searcher tallies (brontes-database searcher stats); this is the
    bounded-memory form a 100 TB corpus needs.
    """
    import pandas as pd

    if freq_num <= 0 or freq_den <= 0 or freq_num >= freq_den:
        raise ValueError("need 0 < freq_num/freq_den < 1")
    k = counters or max(1, freq_den // freq_num)
    dtype = dict(df.dtypes)[val_col]
    selected = df.select(F.col(val_col).alias("v")).filter(
        F.col("v").isNotNull()
    )

    def summarize(batches) -> "object":
        counts: dict = {}
        for pdf in batches:
            for v, c in pdf["v"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > k:
                sub = sorted(counts.values(), reverse=True)[k]
                counts = {v: c - sub for v, c in counts.items() if c > sub}
        yield pd.DataFrame({"v": list(counts.keys())})

    cand = selected.mapInPandas(summarize, schema=f"v {dtype}").distinct()
    flagged = selected.join(
        F.broadcast(cand.withColumn("is_c", F.lit(True))), "v", "left"
    )
    g = flagged.groupBy(
        F.when(F.col("is_c"), F.col("v")).alias("cv")
    ).agg(F.count(F.lit(1)).alias("n"))
    out = g.withColumn("total", F.sum("n").over(W.partitionBy(F.lit(1))))
    return (
        out.filter(
            F.col("cv").isNotNull()
            & (F.col("n") * freq_den > freq_num * F.col("total"))
        )
        .select(F.col("cv").alias(val_col), "n", "total")
    )


def countmin_sketch(
    df: DataFrame, val_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """(row, col, cnt) — a depth x width count-min counter matrix (Cormode
    & Muthukrishnan 2005) of `val_col` occurrences. Deterministic: row r's
    hash is md5_long(r || '|' || val) % width, so the matrix is a pure
    function of the data — a DuckDB oracle recomputes it exactly.

    Scale shape: occurrences explode to depth (row, col) pairs map-side,
    but the groupBy's partial aggregation bounds what any task emits to
    depth*width rows — the shuffle carries a BOUNDED summary per task
    regardless of input size (the whole point of sketching 100 TB).
    Estimates are one-sided: est >= true count always, with overcount
    bounded by collisions (width is the dial, error ~ N/width per row,
    min over depth rows takes the least-collided)."""
    if width < 1 or depth < 1:
        raise ValueError(f"width and depth must be >= 1, got {width}x{depth}")
    df = df.filter(F.col(val_col).isNotNull())  # a NULL occurrence counts nothing
    pairs = [
        F.struct(
            F.lit(r).alias("row"),
            (md5_long(F.col(val_col).cast("string"), seed=r) % width).alias("col"),
        )
        for r in range(depth)
    ]
    return (
        df.select(F.explode(F.array(*pairs)).alias("p"))
        .select(F.col("p.row").alias("row"), F.col("p.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise sum of counter matrices: the sketch of a union of
    slices is exactly the sum of the slices' sketches (how a 100 TB build
    folds per-partition summaries, and how streaming micro-batches fold
    into a running sketch)."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def countmin_estimate(
    items: DataFrame, sketch: DataFrame, val_col: str, width: int, depth: int = 4
) -> DataFrame:
    """(val_col, est) — the count-min estimate (min over depth rows) for
    each item. The sketch side is depth*width rows at most and broadcasts;
    the item side explodes its depth probes in place, so the only shuffle
    is the per-item min fold. A probed cell with no sketch row means count
    0 (the item was never seen)."""
    probes = [
        F.struct(
            F.lit(r).alias("row"),
            (md5_long(F.col(val_col).cast("string"), seed=r) % width).alias("col"),
        )
        for r in range(depth)
    ]
    exploded = items.select(
        F.col(val_col), F.explode(F.array(*probes)).alias("p")
    ).select(val_col, F.col("p.row").alias("row"), F.col("p.col").alias("col"))
    return (
        exploded.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(val_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def _kmv_union_topk(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int
) -> DataFrame:
    """Shared core of the KMV set-relation estimators: per key, the union
    sketch's k-minima with per-side membership tallies — (key,
    n_union_seen, kth, n_a, n_b, n_both)."""
    ua = sketch_a.select("key", "hv", F.lit(1).alias("a"), F.lit(0).alias("b"))
    ub = sketch_b.select("key", "hv", F.lit(0).alias("a"), F.lit(1).alias("b"))
    u = (
        ua.unionByName(ub)
        .groupBy("key", "hv")
        .agg(F.max("a").alias("in_a"), F.max("b").alias("in_b"))
    )
    w = W.partitionBy("key").orderBy("hv")
    topk = u.withColumn("pos", F.row_number().over(w)).filter(F.col("pos") <= k)
    return topk.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_union_seen"),
        F.max(F.when(F.col("pos") == k, F.col("hv"))).alias("kth"),
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )


def kmv_containment(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64
) -> DataFrame:
    """ASYMMETRIC set overlap from KMV sketches: per key,

      (key, n_union_seen, n_a, n_b, n_both,
       containment_a_in_b, containment_b_in_a)

    containment(A in B) = |A ∩ B| / |A|, estimated as n_both / n_a over
    the union sketch's k-minima (each is a uniform union sample, so the
    in-A subset is a uniform sample of A — Beyer et al. 2007's estimator
    family). The asymmetric number is what Jaccard hides: a 100-line file
    wholly pasted inside a 10,000-line file has Jaccard ~0.01 but
    containment(A in B) ~1.0 — the quote-/subset-detection signal for
    dedup triage and source attribution. Exact below k, like every KMV
    figure; ratios are single-op integer-to-double divisions (both
    engines IEEE-identical)."""
    agg = _kmv_union_topk(sketch_a, sketch_b, k)
    return agg.select(
        "key", "n_union_seen", "n_a", "n_b", "n_both",
        (F.col("n_both") / F.col("n_a")).alias("containment_a_in_b"),
        (F.col("n_both") / F.col("n_b")).alias("containment_b_in_a"),
    )


def kmv_set_relations(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 64
) -> DataFrame:
    """Set-relation estimates between two keyed value sets from their KMV
    sketches alone (Beyer et al. 2007's KMV synopses): per key,

      (key, n_union_seen, est_union, n_both, jaccard_est, est_intersect)

    The union sketch is the k smallest hashes of the merged value lists;
    within those k, the fraction also present in BOTH inputs is an
    unbiased Jaccard estimate (each of the union's k-minima is a uniform
    sample of the union), and est_intersect = jaccard * est_union. When
    the union has fewer than k distinct hashes the sketch saw everything
    and every figure is exact (the same small-regime fallback as
    kmv_distinct).

    Inputs are kmv_sketch outputs — k rows per key — so this never touches
    the original data: it's the "compare two 100 TB corpora from their
    kilobyte summaries" operation (vocabulary overlap between sources,
    user-set overlap between event streams). All integer/min/count math:
    deterministic, oracle-checkable.
    """
    agg = _kmv_union_topk(sketch_a, sketch_b, k)
    numer = (k - 1) * _M
    est_union = (
        F.when(F.col("n_union_seen") < k, F.col("n_union_seen"))
        .otherwise(F.expr(f"CAST('{numer}' AS DECIMAL(38,0)) div nullif(kth, 0)"))
        .cast("long")
    )
    return agg.select(
        "key",
        "n_union_seen",
        est_union.alias("est_union"),
        "n_both",
        (F.col("n_both") / F.col("n_union_seen")).alias("jaccard_est"),
    ).withColumn(
        # integer div (not a double cast: Spark truncates, DuckDB rounds),
        # in DECIMAL because n_both * est_union can pass 2^63 when the kth
        # minimum is pathologically small
        "est_intersect",
        F.expr(
            "CAST(CAST(n_both AS DECIMAL(38,0)) * est_union "
            "div n_union_seen AS BIGINT)"
        ),
    )


def value_histogram(
    df: DataFrame, val_col: str, buckets: int = 64
) -> DataFrame:
    """(bucket, lo, hi, cnt) — equi-width histogram over an integral
    column with EXACT decimal bucket math (quantiles_exact's pass 1
    surfaced as its own operator: the one-hash-aggregate distribution
    summary dashboards and optimizers both want). Bucket bounds are the
    exact integer ranges [lo, hi] each bucket covers; empty buckets emit
    no row (the consumer treats absence as zero, as with every sparse
    summary in this module). One map-side-combined aggregate; the output
    is bounded by `buckets`, never the data."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    vals = df.select(F.col(val_col).alias("v")).filter(F.col("v").isNotNull())
    stats = vals.agg(F.min("v").alias("mn"), F.max("v").alias("mx")).collect()[0]
    if stats["mn"] is None:
        return df.sparkSession.createDataFrame(
            [], "bucket int, lo long, hi long, cnt long"
        )
    mn, mx = int(stats["mn"]), int(stats["mx"])
    width_den = mx - mn + 1
    b = F.expr(
        f"CAST((CAST(v AS DECIMAL(38,0)) - {mn}) * {buckets} div {width_den} AS INT)"
    )
    # exact inverse of the bucket map: bucket k covers
    # [mn + ceil(k*span/B), mn + ceil((k+1)*span/B) - 1]
    lo = F.expr(
        f"{mn} + CAST((CAST(bucket AS DECIMAL(38,0)) * {width_den} + {buckets - 1}) "
        f"div {buckets} AS BIGINT)"
    )
    hi = F.expr(
        f"{mn} + CAST(((CAST(bucket AS DECIMAL(38,0)) + 1) * {width_den} + {buckets - 1}) "
        f"div {buckets} AS BIGINT) - 1"
    )
    return (
        vals.groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("bucket", lo.alias("lo"), hi.alias("hi"), "cnt")
    )


def join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    col_a: str,
    col_b: str,
    k: int = 256,
) -> DataFrame:
    """Pre-join cardinality estimate from kilobyte summaries — the
    planner-adjacent question ("will this join explode?") answered
    without running the join:

      est_rows = est_keys_in_common · (rows_a / distinct_a)
                                    · (rows_b / distinct_b)

    i.e. the System-R uniform-multiplicity model with the key-overlap
    term refined by a KMV intersection estimate (kmv_set_relations over
    each side's join-column sketch) instead of the containment
    assumption. Exact in the small regime (distinct union < k, uniform
    multiplicities); at scale the error is the KMV ~1/sqrt(k) band times
    the multiplicity-skew factor — a SKEWED join (hot keys) is
    underestimated by design, the documented limit of any
    frequency-blind sketch (count-min per side is the upgrade path when
    skew matters).

    One scan per side (sketch + count/distinct share it); output is a
    single row: (rows_a, rows_b, est_distinct_a, est_distinct_b,
    est_key_overlap, est_join_rows)."""
    # md5_long hashes strings: normalize the join column's rendering once
    ra = a.select(F.lit("j").alias("g"), F.col(col_a).cast("string").alias("v"))
    rb = b.select(F.lit("j").alias("g"), F.col(col_b).cast("string").alias("v"))
    sk_a = kmv_sketch(ra, "g", "v", k=k)
    sk_b = kmv_sketch(rb, "g", "v", k=k)
    rel = kmv_set_relations(sk_a, sk_b, k=k).select(
        F.col("est_union"), F.col("n_both"), F.col("n_union_seen")
    )
    da = kmv_distinct(ra, "g", "v", k=k).select(
        F.col("est_distinct").alias("est_distinct_a")
    )
    db = kmv_distinct(rb, "g", "v", k=k).select(
        F.col("est_distinct").alias("est_distinct_b")
    )
    ca = a.agg(F.count(F.lit(1)).alias("rows_a"))
    cb = b.agg(F.count(F.lit(1)).alias("rows_b"))
    j = F.lit(1)
    one = (
        rel.withColumn("_j", j)
        .join(F.broadcast(da.withColumn("_j", j)), "_j")
        .join(F.broadcast(db.withColumn("_j", j)), "_j")
        .join(F.broadcast(ca.withColumn("_j", j)), "_j")
        .join(F.broadcast(cb.withColumn("_j", j)), "_j")
    )
    overlap = F.expr(
        "CAST(CAST(n_both AS DECIMAL(38,0)) * est_union "
        "div nullif(n_union_seen, 0) AS BIGINT)"
    )
    est = F.expr(
        "CAST(CAST(est_key_overlap AS DECIMAL(38,0)) * rows_a * rows_b "
        "div nullif(CAST(est_distinct_a AS DECIMAL(38,0)) "
        "* est_distinct_b, 0) AS BIGINT)"
    )
    return (
        one.withColumn("est_key_overlap", overlap)
        .withColumn("est_join_rows", est)
        .select(
            "rows_a", "rows_b", "est_distinct_a", "est_distinct_b",
            "est_key_overlap", "est_join_rows",
        )
    )


def weighted_percentiles_by_group(
    df: DataFrame,
    group_col: str,
    val_col: str,
    weight_col: str,
    qs: list[tuple[int, int]],
) -> DataFrame:
    """Exact per-group WEIGHTED percentiles, fully distributed (no
    driver-side histogram — unlike quantiles_exact, whose collected
    summary is global): for each group and each target fraction
    q = q_num/q_den (an exact rational, never a float), the smallest
    value whose cumulative weight reaches q of the group's total — the
    weighted percentile_disc 'lower' convention, so every returned
    value is an actual data value.

    The weighted generalization answers "the token-count p95 weighted
    by document quality mass" / "the latency p99 weighted by request
    volume" without expanding weights into repeated rows. Rows with
    NULL or non-positive weight drop (a zero-weight row cannot carry
    percentile mass); groups with no surviving rows vanish.

    Exactness: the defining inequality is evaluated in integers —
    cumw * q_den >= total_w * q_num — with both products in
    decimal(38,0) so full-range bigint weights cannot overflow; no
    division anywhere.

    Scale shape: ONE hash aggregate to the per-(group, value) weight
    histogram (the only data-sized pass, map-side combinable), one
    per-group ordered window over the VALUE DOMAIN (bounded by distinct
    values per group — quantize continuous values upstream, the
    repo-wide policy), then a |qs|-way conditional min aggregate on the
    same grouping, which rides the window's exchange. Output: (group,
    q_num, q_den, value, total_w), one row per group x q.
    """
    if not qs:
        raise ValueError("weighted_percentiles_by_group: qs must be non-empty")
    for qn, qd in qs:
        if qd < 1 or qn < 0 or qn > qd:
            raise ValueError(f"bad percentile rational {qn}/{qd}")
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(val_col).alias("v"),
        F.col(weight_col).cast("long").alias("w"),
    ).filter(F.col("v").isNotNull() & (F.col("w") > 0))
    hist = base.groupBy("g", "v").agg(F.sum("w").alias("wv"))
    wcum = W.partitionBy("g").orderBy("v").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy("g").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = hist.select(
        "g",
        "v",
        F.sum("wv").over(wcum).cast("decimal(38,0)").alias("cumw"),
        F.sum("wv").over(wall).cast("decimal(38,0)").alias("totw"),
    )
    aggs = [
        F.min(
            F.when(
                F.col("cumw") * F.lit(qd) >= F.col("totw") * F.lit(qn),
                F.col("v"),
            )
        ).alias(f"_p_{qn}_{qd}")
        for qn, qd in qs
    ]
    wide = cum.groupBy("g").agg(
        F.max(F.col("totw").cast("long")).alias("total_w"), *aggs
    )
    parts = [
        wide.select(
            "g",
            F.lit(qn).cast("long").alias("q_num"),
            F.lit(qd).cast("long").alias("q_den"),
            F.col(f"_p_{qn}_{qd}").alias("value"),
            "total_w",
        )
        for qn, qd in qs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
