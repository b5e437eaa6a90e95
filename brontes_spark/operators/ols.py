"""Group-wise simple linear regression (OLS trend), exact-integer.

Per-key least-squares fit y = a + b·t — the trend screen behind drift
detection, price-impact slopes, and per-entity health metrics (the
reference's possible-MEV discovery uses mean+2σ outlier screens, I14;
a fitted slope is the ordered-data sibling of that family).

The closed form needs only four per-key sums:

    b = (n·Σty − Σt·Σy) / (n·Σt² − (Σt)²)

and every one is an exact integer if t and y enter as integers. The
engine-parity problem is OVERFLOW, not rounding, so the operator:

  * re-bases t per key (t := t − min(t)) with a window over the SAME key
    shuffle the aggregate uses — epoch-scale abscissas would put Σt² at
    ~1e31 while a rebased span keeps it ≤ span²·n;
  * keeps the sums as bigint (caller guarantees the documented envelope:
    span_units²·n_rows < 2^63, e.g. 30-day second-grained keys with 10⁶
    rows sit at 7e18·… — use a coarser grain when the envelope breaks);
  * lifts ONLY the two final cross-products into decimal(38,0), where the
    numerator/denominator (≤ ~1e21 at the envelope edge) are exact, and
    floors the scaled slope in integer arithmetic. DuckDB runs the same
    expressions in HUGEINT — both engines agree digit-for-digit.

slope9 = floor(1e9 · b): positive-denominator floor division (the
denominator is n·Σt² − (Σt)² ≥ 0 by Cauchy-Schwarz, zero only when all t
coincide — those keys return NULL). INTEGER division truncates toward
zero in BOTH engines (Spark `div`, and DuckDB's `//` too — it floors
only for DOUBLEs; measured -7 // 2 = -3), so the floor for negative
numerators is an explicit (num - (den-1)) adjustment on both sides —
parity-pinned at the gate, where real per-user slopes go negative.

Scale shape: ONE shuffle on the key (window min + aggregate share it, the
twap.py exprId discipline), map-side-combined sums, output one row per
key. Nothing downstream of the scan depends on row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DEC38 = "decimal(38,0)"


def ols_trend(
    df: DataFrame,
    key_col: str,
    t_col: str,
    y_col: str,
    t_unit: int = 1,
) -> DataFrame:
    """(key, n, t_span, slope9, intercept9) per key.

    ``t_col`` integer abscissa; ``t_unit`` divides it (floor) to a coarser
    grain FIRST — the envelope dial. ``y_col`` integer ordinate.
    slope9 = floor(1e9 · b) in y-units per t-grain; intercept9 =
    floor(1e9 · (ȳ − b·t̄)) at the REBASED origin (t = per-key min).
    Keys where every observation shares one t (or n == 1) yield NULLs.
    """
    t_floor = F.expr(
        f"({t_col} - pmod({t_col}, {t_unit})) div {t_unit}"
    )
    w = W.partitionBy(key_col)
    base = df.select(
        key_col,
        t_floor.alias("_t_raw"),
        F.col(y_col).cast("long").alias("_y"),
    ).withColumn("_t", F.col("_t_raw") - F.min("_t_raw").over(w))
    agg = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("_t").alias("t_span"),
        F.sum("_t").alias("_st"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_t") * F.col("_y")).alias("_sty"),
        F.sum(F.col("_t") * F.col("_t")).alias("_stt"),
    )
    # cross-products in decimal(38,0): exact for |value| < 1e38; the
    # bigint envelope above keeps operands < 2^63 so products < ~8.5e37
    num = F.expr(f"CAST(n AS {DEC38}) * CAST(_sty AS {DEC38})"
                 f" - CAST(_st AS {DEC38}) * CAST(_sy AS {DEC38})")
    den = F.expr(f"CAST(n AS {DEC38}) * CAST(_stt AS {DEC38})"
                 f" - CAST(_st AS {DEC38}) * CAST(_st AS {DEC38})")
    out = agg.withColumn("_num", num).withColumn("_den", den)
    # floor division with a POSITIVE denominator and either-sign
    # numerator: Spark `div` truncates toward zero, so subtract (den-1)
    # from negative numerators first — equals DuckDB's native `//` floor
    slope9 = F.expr(
        "CAST(CASE WHEN _den = 0 THEN NULL "
        "WHEN _num >= 0 THEN (_num * 1000000000) div _den "
        "ELSE ((_num * 1000000000) - (_den - 1)) div _den END AS BIGINT)"
    )
    out = out.withColumn("slope9", slope9)
    # intercept9 = floor(1e9·(Σy·den − b9_exact…)/…) — computed from the
    # same exact sums: a = (Σy − b·Σt)/n with b = num/den, so
    # a·1e9 = (1e9·Σy·den − 1e9·num·Σt) / (n·den)
    inum = F.expr(
        f"CAST(_sy AS {DEC38}) * _den * 1000000000"
        f" - _num * 1000000000 * CAST(_st AS {DEC38})"
    )
    iden = F.expr(f"CAST(n AS {DEC38}) * _den")
    intercept9 = F.expr(
        "CAST(CASE WHEN _iden = 0 THEN NULL "
        "WHEN _inum >= 0 THEN _inum div _iden "
        "ELSE (_inum - (_iden - 1)) div _iden END AS BIGINT)"
    )
    return (
        out.withColumn("_inum", inum)
        .withColumn("_iden", iden)
        .withColumn("intercept9", intercept9)
        .select(key_col, "n", "t_span", "slope9", "intercept9")
    )


def pearson_corr(
    df: DataFrame,
    key_col: str,
    t_col: str,
    y_col: str,
    t_unit: int = 1,
) -> DataFrame:
    """(key, n, corr9) — per-key Pearson correlation of (t, y), exact
    sums with ONE double step at the very end.

    r = (n·Σty − Σt·Σy) / sqrt((n·Σt² − (Σt)²) · (n·Σy² − (Σy)²))

    Numerator and both variance terms are exact integers (same envelope
    discipline as ols_trend: per-key re-based t, bigint sums). The final
    step converts each to double and computes 1e9·num/sqrt(d1·d2): every
    operation in that chain — int64→double conversion, multiply, sqrt
    (IEEE-mandated), divide — is correctly rounded, so identical inputs
    give the bit-identical double in every conforming engine, and the
    floor to corr9 agrees. (Never compute d1·d2 in integers first: the
    >2^53 product would hit the decimal→double conversion divergence
    documented in functions/decimals.py; converting d1 and d2 SEPARATELY
    keeps every conversion an int64→double.) corr9 ∈ [-1e9, 1e9]; NULL
    when either variance is zero (constant series) or n < 2."""
    t_floor = F.expr(f"({t_col} - pmod({t_col}, {t_unit})) div {t_unit}")
    w = W.partitionBy(key_col)
    base = df.select(
        key_col,
        t_floor.alias("_t_raw"),
        F.col(y_col).cast("long").alias("_y"),
    ).withColumn("_t", F.col("_t_raw") - F.min("_t_raw").over(w))
    agg = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_t").alias("_st"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_t") * F.col("_y")).alias("_sty"),
        F.sum(F.col("_t") * F.col("_t")).alias("_stt"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    num = F.expr(f"CAST(n AS {DEC38}) * CAST(_sty AS {DEC38})"
                 f" - CAST(_st AS {DEC38}) * CAST(_sy AS {DEC38})")
    d1 = F.expr(f"CAST(n AS {DEC38}) * CAST(_stt AS {DEC38})"
                f" - CAST(_st AS {DEC38}) * CAST(_st AS {DEC38})")
    d2 = F.expr(f"CAST(n AS {DEC38}) * CAST(_syy AS {DEC38})"
                f" - CAST(_sy AS {DEC38}) * CAST(_sy AS {DEC38})")
    out = (
        agg.withColumn("_num", num.cast("long"))
        .withColumn("_d1", d1.cast("long"))
        .withColumn("_d2", d2.cast("long"))
    )
    corr9 = F.expr(
        "CAST(CASE WHEN _d1 > 0 AND _d2 > 0 THEN "
        "FLOOR(1000000000.0 * CAST(_num AS DOUBLE) / "
        "SQRT(CAST(_d1 AS DOUBLE) * CAST(_d2 AS DOUBLE))) END AS BIGINT)"
    )
    return out.select(key_col, "n", corr9.alias("corr9"))


def pearson_corr_xy(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """(key, n, corr9) — per-key Pearson correlation of two INTEGER
    columns; the general bivariate face of pearson_corr (which fixes x to
    re-based time). Same exactness contract: all five sums exact bigints,
    cross-products in decimal(38,0), ONE final correctly-rounded double
    chain; NULL when either variance is zero or n < 2. Rows where either
    column is NULL are excluded (pairwise-complete semantics). Envelope:
    caller keeps |x|,|y| small enough that (a) sum(x*x) fits bigint and
    (b) the d-terms n*sxx - sx^2 / n*syy - sy^2 fit bigint TOO — the
    decimal cross-products are deliberately cast back to int64 before the
    double chain because int64->double is correctly rounded on BOTH
    engines, while DuckDB's HUGEINT->DOUBLE is a two-step upper/lower
    conversion that can be 1 ulp off past 2^53 (the cross-engine
    bit-parity contract, see x20's oracle note). A d-term past 2^63
    nulls on the decimal->long cast (non-ANSI), so corr9 degrades to
    NULL — never garbage. The ols_trend discipline (re-base/rescale
    upstream) keeps real inputs far inside both bounds."""
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        key_col,
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    agg = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    num = F.expr(f"CAST(n AS {DEC38}) * CAST(_sxy AS {DEC38})"
                 f" - CAST(_sx AS {DEC38}) * CAST(_sy AS {DEC38})")
    d1 = F.expr(f"CAST(n AS {DEC38}) * CAST(_sxx AS {DEC38})"
                f" - CAST(_sx AS {DEC38}) * CAST(_sx AS {DEC38})")
    d2 = F.expr(f"CAST(n AS {DEC38}) * CAST(_syy AS {DEC38})"
                f" - CAST(_sy AS {DEC38}) * CAST(_sy AS {DEC38})")
    out = (
        agg.withColumn("_num", num.cast("long"))
        .withColumn("_d1", d1.cast("long"))
        .withColumn("_d2", d2.cast("long"))
    )
    corr9 = F.expr(
        "CAST(CASE WHEN _d1 > 0 AND _d2 > 0 THEN "
        "FLOOR(1000000000.0 * CAST(_num AS DOUBLE) / "
        "SQRT(CAST(_d1 AS DOUBLE) * CAST(_d2 AS DOUBLE))) END AS BIGINT)"
    )
    return out.select(key_col, "n", corr9.alias("corr9"))


def autocorr(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    y_col: str,
    lag: int,
) -> DataFrame:
    """Per-key lag-k autocorrelation: (key, lag, n, corr9).

    The sample ACF point estimate in its pairwise form — corr(y_t,
    y_{t-lag}) over the key's totally-ordered series (pass a tiebreak in
    ``order_cols``). The lag pairing is ONE ordered window (lag() rides
    the same key exchange the correlation aggregate then reuses), so the
    whole statistic costs exactly what pearson_corr costs. Keys with
    fewer than lag+2 observations return NULL corr9 (n < 2 pairs) or no
    row (n == 0 pairs). The drift-screen sibling of CUSUM: high lag-1
    autocorrelation of residuals is the classic symptom CUSUM then
    localizes in time."""
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    w = W.partitionBy(key_col).orderBy(*order_cols)
    paired = df.withColumn("_prev", F.lag(y_col, lag).over(w))
    return (
        pearson_corr_xy(paired, key_col, "_prev", y_col)
        .select(key_col, F.lit(lag).cast("long").alias("lag"), "n", "corr9")
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of k integer columns in ONE pass:
    (col_a, col_b, n, corr9) for every a < b pair.

    The 100 TB story is the aggregate shape: all k sums, k squares, and
    k(k-1)/2 cross-products compute in a SINGLE map-side-combined hash
    aggregate over one scan — the cost of a corr matrix is the cost of
    one count(*), independent of k's quadratic pair count (which only
    widens the 1-row aggregate). The pair rows then unpivot from that
    single row with a literal stack — no second scan, no join.

    Rows with a NULL in ANY of `cols` are excluded (listwise-complete —
    the matrix is over a single common sample, unlike pearson_corr_xy's
    pairwise-complete two-column face). Exactness contract as ever:
    integer sums, decimal(38) cross-terms, one correctly-rounded double
    chain per pair. Envelope: sum(x*x) per column must fit bigint."""
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    base = df
    for c in cols:
        base = base.filter(F.col(c).isNotNull())
    base = base.select([F.col(c).cast("long").alias(c) for c in cols])
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(F.col(a)).alias(f"s_{i}"))
        aggs.append(F.sum(F.col(a) * F.col(a)).alias(f"q_{i}"))
        for j in range(i + 1, len(cols)):
            aggs.append(
                F.sum(F.col(a) * F.col(cols[j])).alias(f"p_{i}_{j}")
            )
    row = base.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for j in range(i + 1, len(cols)):
            pairs.append((i, j, a, cols[j]))
    stack = ", ".join(
        f"'{a}', '{b}', p_{i}_{j}, s_{i}, s_{j}, q_{i}, q_{j}"
        for i, j, a, b in pairs
    )
    long_rows = row.select(
        "n",
        F.expr(
            f"stack({len(pairs)}, {stack}) AS "
            "(col_a, col_b, sxy, sx, sy, sxx, syy)"
        ),
    )
    num = F.expr(f"CAST(n AS {DEC38}) * CAST(sxy AS {DEC38})"
                 f" - CAST(sx AS {DEC38}) * CAST(sy AS {DEC38})")
    d1 = F.expr(f"CAST(n AS {DEC38}) * CAST(sxx AS {DEC38})"
                f" - CAST(sx AS {DEC38}) * CAST(sx AS {DEC38})")
    d2 = F.expr(f"CAST(n AS {DEC38}) * CAST(syy AS {DEC38})"
                f" - CAST(sy AS {DEC38}) * CAST(sy AS {DEC38})")
    out = (
        long_rows.withColumn("_num", num.cast("long"))
        .withColumn("_d1", d1.cast("long"))
        .withColumn("_d2", d2.cast("long"))
    )
    corr9 = F.expr(
        "CAST(CASE WHEN _d1 > 0 AND _d2 > 0 THEN "
        "FLOOR(1000000000.0 * CAST(_num AS DOUBLE) / "
        "SQRT(CAST(_d1 AS DOUBLE) * CAST(_d2 AS DOUBLE))) END AS BIGINT)"
    )
    return out.select("col_a", "col_b", "n", corr9.alias("corr9"))
