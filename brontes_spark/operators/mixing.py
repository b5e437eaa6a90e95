"""Corpus mixing: temperature-scaled domain sampling weights.

Multilingual / multi-source training sets up-weight rare domains by
sampling domain i with probability proportional to n_i^(1/T) (T=1 is
natural frequency, T→∞ is uniform; GPT-3 / XLM-R style "temperature
sampling"). The engine-exactness problem is pow: n^(1/T) for general T is
a libm call with no cross-engine bit contract. Two paths:

  * T=2 (the common default) is sqrt — IEEE 754 REQUIRES sqrt to be
    correctly rounded, so Spark's java.lang.Math.sqrt and any other
    conforming engine produce the identical double, and
    floor(sqrt(bigint)) is therefore engine-exact even in the off-by-one
    twilight near perfect squares (both engines are wrong the same way;
    the operator's contract is floor∘sqrt, not isqrt).
  * general T: `temperature_weights_float` (tests only) — documented as
    non-portable, never behind a hash-checked gate.

weight9 = floor(1e9 * s_i / sum_j s_j) in pure bigint arithmetic on the
floored sqrts, so the gate output is exact.

Scale shape: ONE hash aggregate over the corpus (map-side combined) down
to |domains| rows; the total is a 1-row scalar dim joined on a literal —
Catalyst constant-folds it to a 1-row-build broadcast (the bm25.py
pattern). Nothing after the aggregate depends on corpus size. The weights
then FEED `sample_stratified` (operators/dedup.py, the per-stratum
md5-threshold keep-rate filter): weights are the plan, hash-bucket
sampling is the executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temperature_weights_sqrt(df: DataFrame, domain_col: str) -> DataFrame:
    """(domain, n, s, weight9) at temperature 2: s = floor(sqrt(n))."""
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n")
    )
    scaled = counts.withColumn(
        "s", F.floor(F.sqrt(F.col("n").cast("double"))).cast("long")
    )
    total = scaled.agg(F.sum("s").alias("s_total")).withColumn("j", F.lit(1))
    return (
        scaled.withColumn("j", F.lit(1))
        .join(F.broadcast(total), "j")
        .select(
            "domain",
            "n",
            "s",
            F.expr("(1000000000 * s) div s_total").cast("long").alias("weight9"),
        )
    )


def temperature_weights_float(
    df: DataFrame, domain_col: str, temperature: float
) -> DataFrame:
    """General-T variant (double pow). NOT engine-portable — pytest-only
    by policy; gate-checked results must use the T=2 exact path."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n")
    )
    scaled = counts.withColumn(
        "s_f", F.pow(F.col("n").cast("double"), F.lit(1.0 / temperature))
    )
    total = scaled.agg(F.sum("s_f").alias("s_total")).withColumn("j", F.lit(1))
    return (
        scaled.withColumn("j", F.lit(1))
        .join(F.broadcast(total), "j")
        .select("domain", "n", (F.col("s_f") / F.col("s_total")).alias("weight"))
    )
