"""Edit-distance (Levenshtein) fuzzy deduplication.

Shingle/MinHash dedup misses the "same document, light edits" class when
the edits are dense but small (OCR noise, template variable substitution,
typo storms): 30 single-char edits can break every 5-gram shingle while
the strings stay 95% identical. Edit distance catches exactly that class,
and both engines ship the same unit-cost Wagner-Fischer (Spark
`levenshtein` == DuckDB `levenshtein` on ASCII, spot-pinned in tests), so
the verdict is oracle-checkable. Unicode caveat (test-pinned): Spark
counts CODEPOINTS, DuckDB counts BYTES — on non-ASCII text this module
keeps Spark's codepoint semantics (run functions/normalize first; the
driver-gate corpus is ASCII so the oracle holds exactly).

Scale shape: Levenshtein is O(len²) per pair — NEVER run it corpus×corpus.
`edit_dup_pairs` is the verify stage: pairs come from a blocking key
(language/domain/length-bucket here; at 100 TB the MinHash/SimHash LSH
candidate stream — `verify_pairs_levenshtein` plugs the same verifier
behind any pair generator), with the |len(a)-len(b)| <= max_dist necessary
condition pushed down BEFORE the quadratic kernel (distance >= length
difference, so the filter is lossless). Spark 4's thresholded
levenshtein(a, b, t) early-exits the DP at t — the kernel cost is
O(len·t), not O(len²), for the non-matches that dominate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    max_dist: int,
) -> DataFrame:
    """(id_a, id_b, dist) — within-block pairs (id_a < id_b) with
    levenshtein(text_a, text_b) <= max_dist. Lossless length prefilter;
    thresholded kernel."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    t = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.col(text_col).alias("txt"),
        F.length(F.col(text_col)).alias("n"),
    )
    a = t.select(
        F.col("id").alias("id_a"), F.col("blk"),
        F.col("txt").alias("txt_a"), F.col("n").alias("n_a"),
    )
    b = t.select(
        F.col("id").alias("id_b"), F.col("blk"),
        F.col("txt").alias("txt_b"), F.col("n").alias("n_b"),
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("n_a") - F.col("n_b")) <= max_dist)
        )
        .withColumn(
            "dist", F.levenshtein(F.col("txt_a"), F.col("txt_b"), max_dist)
        )
        .filter(F.col("dist") >= 0)  # thresholded form returns -1 past max
        .select("id_a", "id_b", "dist")
    )


def verify_pairs_levenshtein(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
) -> DataFrame:
    """Verify an (id_a, id_b) candidate stream (MinHash/SimHash LSH output)
    with the exact edit-distance predicate: returns the pairs that survive,
    with their distance. Two broadcast-or-shuffle joins against the doc
    texts — the candidate stream, not the corpus, pays them."""
    t = docs.select(F.col(id_col).alias("_vid"), F.col(text_col).alias("_vtxt"))
    witha = pairs.join(t.withColumnRenamed("_vid", "id_a").withColumnRenamed("_vtxt", "_ta"), "id_a")
    withb = witha.join(t.withColumnRenamed("_vid", "id_b").withColumnRenamed("_vtxt", "_tb"), "id_b")
    return (
        withb.withColumn("dist", F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist))
        .filter(F.col("dist") >= 0)
        .drop("_ta", "_tb")
    )
