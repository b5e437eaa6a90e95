"""Table profiling — the ANALYZE / SUMMARIZE surface (DuckDB's SUMMARIZE,
Spark's df.summary, every warehouse's column-stats collector): per-column
row count, null count, exact distinct count, and min/max, in ONE pass
over the table.

Plan shape: a single global aggregate computes every column's stats at
once — Spark plans the multiple COUNT(DISTINCT)s with one Expand (k
replicas of each row tagged per distinct-aggregate, partial-aggregated
map-side), which is one scan and one shuffle regardless of how many
columns are profiled; a per-column UNION of aggregates would scan the
table k times. The wide 1-row result unpivots to long format with stack()
driver-side-free.

min/max are emitted as strings (computed on the native type, THEN cast)
so one long-format schema covers heterogeneous columns; profile integer/
decimal/date/string columns for engine-identical rendering — float
formatting differs across engines and is the documented exclusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n, n_null, n_distinct, min_str, max_str) — one row per
    profiled column, one scan total. `n` is the table row count; distinct
    counts are EXACT (swap in hll/kmv sketches when approximate is enough
    at 100 TB — same plan shape, no Expand)."""
    if not cols:
        raise ValueError("profile_table needs at least one column")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_cnt_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _n - _cnt_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column, n_null, n_distinct, min_str, max_str)"
        ),
        F.col("_n").alias("n"),
    ).select("column", "n", "n_null", "n_distinct", "min_str", "max_str")
