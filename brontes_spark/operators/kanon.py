"""k-anonymity / l-diversity screens — privacy governance over shared data.

Before a 100 TB corpus (or an extract of its metadata) leaves the
pipeline, the release question is: can a row be re-identified by joining
its quasi-identifiers (QI) against an outside dataset? Sweeney's
k-anonymity says every QI equivalence class must contain >= k records;
Machanavajjhala's l-diversity additionally requires >= l distinct values
of the sensitive attribute per class (a k-sized class that is
homogeneous in the secret still leaks it).

Both are pure GROUP BY surfaces — one hash aggregate over the QI tuple
(count + count distinct sensitive per group compile to a single
two-phase aggregate), then a filter to the violating classes. The
violator relation is the actionable output: it is small by construction
when the data is nearly safe (the usual release loop: generalize the QI,
re-run, repeat), and bounded by total group count otherwise. NULL QI
values form their own equivalence class (SQL grouping semantics — a
NULL zip is itself a quasi-identifier state and must be audited, not
dropped); a NULL sensitive value counts as one distinct state.

Scale: one shuffle on the QI key, map-side partial counts; the summary
variant is the same aggregate re-aggregated to one row. Nothing is
row-order dependent — exact integers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kanon_violations(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int,
    l_div: int,
) -> DataFrame:
    """QI classes violating k-anonymity or l-diversity:
    (qi..., class_size, n_sensitive, k_violation, l_violation)."""
    grouped = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        # count_distinct skips NULLs; add the NULL state back explicitly
        (
            F.countDistinct(sensitive_col)
            + F.max(F.col(sensitive_col).isNull().cast("long"))
        ).alias("n_sensitive"),
    )
    return grouped.select(
        *qi_cols,
        "class_size",
        "n_sensitive",
        (F.col("class_size") < k).alias("k_violation"),
        (F.col("n_sensitive") < l_div).alias("l_violation"),
    ).filter(F.col("k_violation") | F.col("l_violation"))


def kanon_summary(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int,
    l_div: int,
) -> DataFrame:
    """One-row release verdict: total classes/records, violating classes,
    records at risk, and the smallest class size (the k the data DOES
    satisfy is min_class_size)."""
    grouped = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        (
            F.countDistinct(sensitive_col)
            + F.max(F.col(sensitive_col).isNull().cast("long"))
        ).alias("n_sensitive"),
    )
    viol = (F.col("class_size") < k) | (F.col("n_sensitive") < l_div)
    return grouped.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").alias("n_records"),
        F.sum(viol.cast("long")).alias("n_violating_classes"),
        F.sum(F.when(viol, F.col("class_size")).otherwise(0)).alias(
            "records_at_risk"
        ),
        F.min("class_size").alias("min_class_size"),
        F.min("n_sensitive").alias("min_sensitive_diversity"),
    )
