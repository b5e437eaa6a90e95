"""Sorted-neighborhood method (SNM) for near-duplicate / entity-
resolution candidate generation (Hernández & Stolfo 1995) — the third
candidate-generation family beside hash blocking (dedup_exact) and
MinHash/SimHash LSH (dedup.py): sort the corpus by a discriminating key
and compare each record only to its `window` successors in sort order.
Where LSH bounds misses probabilistically, SNM bounds them spatially —
records whose keys sort far apart are never compared — which is the
right tool when a cheap sort key (length, normalized prefix, zip code,
timestamp) is known to cluster true matches.

Scale shape: candidate generation is ONE window over ONE exchange — no
self-join, no O(n^2) block. Each row carries its `window` successors
out of the sort via lead() structs (text rides through the sort instead
of being re-joined by id afterward: two id-joins would re-shuffle the
corpus twice to rebuild what the sort order already had adjacent). The
window is PARTITIONED by the blocking columns, so the sort is a
parallel hash/range exchange, never the single-partition global window
Spark would execute for an unpartitioned ORDER BY — the classic
multi-pass SNM answer to cross-block misses is to run the operator
again under a second key (pass_cols), exactly as the literature
prescribes, not to serialize the sort. The verify stage (edit distance
on the text the structs carried) runs once per CANDIDATE, in the same
task, with no further shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    sort_keys: list[Column | str],
    window: int = 3,
) -> DataFrame:
    """(block..., id_a, id_b, gap, dist): every ordered pair of records
    at sort-rank distance 1..window within a block, with the Levenshtein
    distance of their texts. id_a is the sort-earlier record; `gap` is
    the rank distance (1 = adjacent)."""
    w = W.partitionBy(*block_cols).orderBy(*sort_keys, id_col)
    me = F.struct(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    # window pass first, generator second: Spark rejects window
    # expressions and posexplode in the same projection
    led = df.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("_txt_a"),
        F.array(*[F.lead(me, k).over(w) for k in range(1, window + 1)]).alias("succ"),
    )
    rows = led.select(
        *block_cols,
        "id_a",
        "_txt_a",
        F.posexplode("succ").alias("pos", "s"),
    ).filter(F.col("s").isNotNull())
    return rows.select(
        *block_cols,
        "id_a",
        F.col("s.id").alias("id_b"),
        (F.col("pos") + 1).cast("long").alias("gap"),
        F.levenshtein(F.col("_txt_a"), F.col("s.txt")).alias("dist"),
    )


def snm_duplicate_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    sort_keys: list[Column | str],
    window: int = 3,
    max_dist: int = 5,
) -> DataFrame:
    """(id, is_dup): a record is flagged when some sort-earlier neighbor
    within the window is within max_dist edits — the keep-first SNM
    dedup decision (order-dependent by construction, deterministic
    because the sort key tie-breaks on id)."""
    pairs = sorted_neighborhood_pairs(df, id_col, text_col, block_cols, sort_keys, window)
    dup_ids = (
        pairs.filter(F.col("dist") <= max_dist)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.select(id_col).join(
        dup_ids.withColumn("is_dup", F.lit(True)), id_col, "left"
    ).select(id_col, F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
