"""Chi-squared feature selection over a labeled corpus — exact integers.

The standard feature screen for training data curation: which terms are
most associated with a class label (language, source, quality bucket)?
Used to build classifier vocabularies (the fastText-style quality/langid
models the C4/CCNet pipelines train) and to audit corpus slices for
label leakage. Presence-based 2x2 contingency per (term, class):

    a = docs of class containing term          b = df - a
    c = n_class - a                            d = N - df - n_class + a

    chi2 = N * (a*d - b*c)^2 / (df * (N-df) * n_class * (N-n_class))

Everything is a COUNT, so the statistic is an exact rational. The
operator keeps it that way: chi2_9 = floor(1e9 * chi2) computed with
integer `div` on decimal(38,0) numerators — both engines agree
digit-for-digit (DuckDB runs the identical arithmetic in HUGEINT).
Overflow envelope: num = 1e9 * N * det^2 with |det| <= N^2 needs
N <= ~2e6 docs per strata for decimal(38), and den = df*(N-df)*
n_class*(N-n_class) <= N^4/16 (~25 digits at N=2e6) is built in
decimal(38,0) too — as a bigint it would wrap silently around N ~ 110k,
far below the numerator's bound. Above ~2e6, chi2-screen a
deterministic per-class SAMPLE (the statistic converges long before
2e6 docs — selection, not estimation).

Scale shape: ONE token-explode scan (array_distinct BEFORE the explode —
presence semantics also cut the shuffle to distinct (doc, term) pairs),
one (term, class) hash agg, df as a window over the term partition (no
second scan), class sizes as a broadcast dim built from the column-pruned
base table, N as a constant-folded 1-row dim, and the final top-k as a
rank<=k window that compiles to WindowGroupLimit (Partial map-side +
Final) so only k rows per class survive the last exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

DEC38 = "decimal(38,0)"


def chi2_topk_terms(
    docs: DataFrame,
    class_col: str,
    tokens_col: Column,
    k: int,
) -> DataFrame:
    """Top-k terms per class by chi2: (class, term, a, df, n_class, chi2_9, rank).

    ``tokens_col``: array<string> expression over ``docs``. Terms present
    in every document (df == N) and degenerate strata (n_class == N) have
    an undefined chi2 (0/0) and are excluded, matching the oracle.
    """
    base = docs.select(
        F.col(class_col).alias("class"),
        F.array_distinct(tokens_col).alias("_toks"),
    )
    n_class = base.groupBy("class").agg(F.count(F.lit(1)).alias("n_class"))
    total = base.agg(F.count(F.lit(1)).alias("n"))
    occ = base.select("class", F.explode("_toks").alias("term"))
    ac = occ.groupBy("class", "term").agg(F.count(F.lit(1)).alias("a"))
    wd = ac.withColumn("df", F.sum("a").over(W.partitionBy("term")))
    j = wd.join(F.broadcast(n_class), "class").join(F.broadcast(total))
    det = (
        F.col("a") * (F.col("n") - F.col("df") - F.col("n_class") + F.col("a"))
        - (F.col("df") - F.col("a")) * (F.col("n_class") - F.col("a"))
    ).cast("long")
    # den peaks at ~N^4/16 — build it in decimal(38,0) like the numerator:
    # a bigint product wraps silently (non-ANSI) around N ~ 110k docs, far
    # below the numerator's ~2e6 envelope (ADVICE r8 item 2)
    den = (
        F.col("df").cast(DEC38)
        * (F.col("n") - F.col("df")).cast(DEC38)
        * F.col("n_class").cast(DEC38)
        * (F.col("n") - F.col("n_class")).cast(DEC38)
    )
    scored = (
        j.withColumn("_det", det)
        .withColumn("_den", den)
        .filter(F.col("_den") > 0)
        .withColumn(
            "_num",
            F.lit(1_000_000_000).cast(DEC38)
            * F.col("n").cast(DEC38)
            * F.col("_det").cast(DEC38)
            * F.col("_det").cast(DEC38),
        )
        .withColumn("chi2_9", F.expr("_num div _den"))
    )
    w = W.partitionBy("class").orderBy(F.desc("chi2_9"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("class", "term", "a", "df", "n_class", "chi2_9", "rank")
    )
