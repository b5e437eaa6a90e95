"""Skip-gram co-occurrence counting + PMI-style association scoring —
the statistics behind collocation extraction, word-embedding training
data (word2vec/GloVe consume exactly these (center, context) pairs), and
phrase mining over a pretraining corpus.

Scale shape — the key design decision is that PAIR GENERATION IS NOT A
JOIN. The naive formulation self-joins the exploded token relation on
(doc_id, |pos_i - pos_j| <= k), which shuffles the full token stream
twice and detonates on long documents. Here each document pairs its own
token array in place: for every offset j in 1..window, zip the array
against itself shifted by j (two slices of the SAME array, zero data
movement), flatten, and explode. The only shuffle in the whole operator
is the (w1, w2) hash aggregation, whose input is at most window * tokens
rows and whose output is the distinct-pair vocabulary — tiny. Marginals
ride as windows over that aggregated relation (the tfidf.py/bm25.py
plan audit: re-joining re-scans, windows do not), and the corpus total
is a 1-row broadcast dim.

Association score: `lift9 = floor(1e9 * n_xy * T / (n_x * n_y))` — the
integer-scaled PMI exponent (PMI = ln of it minus ln 1e9). ln is
monotone, so rankings/thresholds on lift9 equal rankings on PMI, and the
all-integer form is exact DECIMAL(38,0) arithmetic both engines truncate
identically (the tfidf/bm25 score9 convention; cross-engine float-ln is
not bit-stable). Precision envelope: n_xy * T * 1e9 <= T^2 * 1e9 must
stay under 10^38 → T < ~3e14 context pairs (a ~100 TB corpus at window
3); past that drop the scale to 1e6 or score per-shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import ws_tokens


def skipgram_pairs(
    docs: DataFrame, text_col: str, window: int = 3, keep_cols: list[str] | None = None
) -> DataFrame:
    """(w1, w2) directed skip-gram pairs: every token paired with each of
    the `window` tokens following it, per document. No join — each row
    zips its own token array against j-shifted slices of itself."""
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    shifted = [
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - j, F.lit(0))),
            F.slice(toks, j + 1, F.greatest(n - j, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        for j in range(1, window + 1)
    ]
    pair = F.explode(F.flatten(F.array(*shifted))).alias("p")
    out = docs.select(*(keep_cols or []), pair)
    return out.select(*(keep_cols or []), F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def pmi_cooccur(
    docs: DataFrame, text_col: str, window: int = 3, min_count: int = 2
) -> DataFrame:
    """(w1, w2, n_xy, n_x, n_y, lift9): skip-gram pair counts with left/
    right marginals and the integer-scaled PMI exponent. `min_count`
    prunes rare pairs AFTER marginals (so n_x/n_y are true corpus
    marginals, not post-filter ones)."""
    pairs = skipgram_pairs(docs, text_col, window)
    # cache the aggregated pair relation: both the scalar total and the
    # scored output consume it, and without the pin the corpus explode
    # would run twice (the kmeans_refine localCheckpoint lesson)
    c = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy")).cache()
    # corpus total from the AGGREGATED relation (sum of n_xy == pair
    # count), not from `pairs` — a second scan of the explode would
    # double the corpus read for one scalar
    dim = c.agg(F.sum("n_xy").alias("t_pairs")).withColumn("j", F.lit(1))
    c = c.withColumn("n_x", F.sum("n_xy").over(W.partitionBy("w1"))).withColumn(
        "n_y", F.sum("n_xy").over(W.partitionBy("w2"))
    )
    scored = (
        c.withColumn("j", F.lit(1))
        .join(F.broadcast(dim), "j")
        .drop("j")
        .withColumn(
            "lift9",
            F.expr(
                "CAST(n_xy AS DECIMAL(38,0)) * t_pairs"
                " * CAST(1000000000 AS DECIMAL(38,0))"
                " div (CAST(n_x AS DECIMAL(38,0)) * n_y)"
            ),
        )
    )
    return scored.filter(F.col("n_xy") >= min_count).select(
        "w1", "w2", "n_xy", "n_x", "n_y", F.col("lift9").cast("long").alias("lift9")
    )
