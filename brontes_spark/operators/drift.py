"""Corpus distribution drift — comparing token distributions between two
corpus slices (yesterday's crawl vs today's, source A vs source B, train
vs eval) is the monitoring primitive of every data pipeline. The usual
scores (KL divergence, PSI, G-test) are log-based and therefore never
bit-identical across engines; TOTAL VARIATION distance is not:

    TV(P, Q) = 1/2 * sum_t | P(t) - Q(t) |
             = 1/2 * sum_t | a_t * N_b - b_t * N_a |  /  (N_a * N_b)

with a_t/b_t the token counts and N_a/N_b the totals — the numerator is
an exact integer, so both the aggregate distance and every token's
contribution are oracle-checkable (TV is also the f-divergence with the
cleanest reading: the largest possible difference in probability either
distribution assigns to any event set).

Plan shape: one token scan per side (or one scan + a slice predicate), a
full-outer count join on token (absent = 0), one global sum. Numerators
bound by N_a * N_b <= ~2^80 at corpus scale: summed in DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tv_drift(
    counts_a: DataFrame,
    counts_b: DataFrame,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Total-variation distance between two count relations, optionally per
    group. Inputs are (key_cols..., tok, cnt) count relations (build with a
    groupBy upstream). Returns per group: n_a, n_b (totals), tv_num (the
    exact integer sum of |a*N_b - b*N_a|), and tv = tv_num / (2*N_a*N_b)
    as one float division.

    Degenerate groups (either side empty) are dropped: TV against a
    nothing-distribution is undefined, and emitting 1.0 would hide a data
    bug — absence should be loud."""
    keys = list(key_cols or [])
    a = counts_a.select(*keys, F.col("tok").alias("tok"), F.col("cnt").alias("a"))
    b = counts_b.select(*keys, F.col("tok").alias("tok"), F.col("cnt").alias("b"))
    joined = a.join(b, keys + ["tok"], "full_outer").select(
        *keys, "tok",
        F.coalesce(F.col("a"), F.lit(0)).alias("a"),
        F.coalesce(F.col("b"), F.lit(0)).alias("b"),
    )
    grp = joined.groupBy(*keys) if keys else joined.groupBy()
    totals = grp.agg(F.sum("a").alias("n_a"), F.sum("b").alias("n_b"))
    if keys:
        with_tot = joined.join(totals, keys)
    else:
        # 1-row totals dim on a literal key (the tfidf.py convention: a
        # keyless join is a cartesian product, banned even for one row)
        with_tot = (
            joined.withColumn("_j", F.lit(1))
            .join(F.broadcast(totals.withColumn("_j", F.lit(1))), "_j")
            .drop("_j")
        )
    term = F.abs(
        F.col("a").cast("decimal(38,0)") * F.col("n_b")
        - F.col("b").cast("decimal(38,0)") * F.col("n_a")
    )
    out_grp = with_tot.groupBy(*keys, "n_a", "n_b") if keys else with_tot.groupBy(
        "n_a", "n_b"
    )
    return (
        out_grp.agg(F.sum(term).cast("decimal(38,0)").alias("tv_num"))
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .withColumn(
            "tv",
            F.col("tv_num").cast("double")
            / (2.0 * F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        )
    )


def token_counts(
    df: DataFrame, text_col: str, key_cols: list[str] | None = None
) -> DataFrame:
    """(key_cols..., tok, cnt) whitespace-token counts — the upstream
    relation tv_drift consumes."""
    from ..functions.text import ws_tokens

    keys = list(key_cols or [])
    return (
        df.select(*keys, F.explode(ws_tokens(F.col(text_col))).alias("tok"))
        .groupBy(*keys, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
