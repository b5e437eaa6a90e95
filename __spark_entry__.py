"""Driver contract for the spark-graft builder (PySpark target).

Backed by the brontes_spark package: the query registry
(brontes_spark/plans/) pairs every implemented SURVEY.md §2 operator with a
DuckDB oracle; this module just re-exports it in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from brontes_spark import plans as _plans
from brontes_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    q = _plans.queries()
    name = "i1_sandwich_pairs" if "i1_sandwich_pairs" in q else "q1_pricing_summary"
    return q[name](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _plans.queries()


def oracle_sql() -> dict[str, str]:
    return _plans.oracle_sql()
