"""Join-key skew profiling — "will this shuffle melt an executor?".

The pre-flight check for any big join/groupBy: per candidate key column,
how concentrated is the key mass? One hot key turns a 1000-executor
shuffle into a single straggler task (the failure mode the salted-join
operator exists for; operators/salted.py documents the measured
crossover). This profiler produces the numbers that pick the strategy:

    n_rows, n_keys            — density (rows per key on average)
    max_cnt, top-k hot keys   — the worst offenders, by name
    skew_ratio_9              — max_cnt / mean_cnt, scaled 1e9
                                 (= max_cnt * n_keys / n_rows, exact)
    p_hot_9                   — share of ALL rows owned by the top key

Decision rule of thumb (documented, not enforced): skew_ratio < ~10x is
a plain shuffle; 10-1000x wants AQE skew-join splitting; above that (or
when the hot keys are FEW and KNOWN) the salted join wins — feed the
top-k list straight into salted.salted_join's hot-key set.

Scale shape: one hash aggregate per key column (map-side combined), then
the rank<=k hot list compiles to TakeOrderedAndProject (map-side partial
top-k, k rows per task to the driver-side final — plan-pinned in
tests/test_skew.py) and a 1-row summary — the profile costs one scan
regardless of key cardinality. All ratios are
exact scaled integers (one positive integer division each); KMV
join_size_estimate (operators/sketches.py) answers the companion
"how big is the join OUTPUT" question from the same scan family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DEC38 = "decimal(38,0)"


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Hot-key list: (key, cnt, rank) for the top_k heaviest keys (NULL
    keys profile like any other value — a NULL-heavy join column is the
    classic accidental hot key)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.orderBy(F.desc("cnt"), F.asc_nulls_last("key"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("key", "cnt", "rank")
    )


def key_skew_summary(df: DataFrame, key_col: str) -> DataFrame:
    """One-row verdict: (n_rows, n_keys, max_cnt, skew_ratio_9, p_hot_9).

    skew_ratio_9 = floor(1e9 * max_cnt * n_keys / n_rows) — the hot key's
    multiple of the mean key load; p_hot_9 = floor(1e9 * max_cnt / n_rows).
    Exact integers; empty input yields no row.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    agg = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    return agg.select(
        "n_rows",
        "n_keys",
        "max_cnt",
        F.expr(
            f"(CAST(1000000000 AS {DEC38}) * max_cnt * n_keys) div n_rows"
        ).alias("skew_ratio_9"),
        F.expr(
            f"(CAST(1000000000 AS {DEC38}) * max_cnt) div n_rows"
        ).alias("p_hot_9"),
    )
