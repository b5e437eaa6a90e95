"""EXACT set-similarity join via prefix filtering (AllPairs / PPJoin
family — Bayardo, Ma & Srikant, WWW 2007) — every pair of documents whose
set Jaccard (over any array column: word tokens, shingle hashes, feature
ids) reaches a threshold, with NO false negatives.

This is the exact complement of dedup_minhash_lsh: LSH trades recall for
a fixed candidate budget; prefix filtering keeps EXACT semantics and
prunes with two lossless rules instead:

  * prefix rule — order every doc's distinct tokens by ascending global
    document frequency (rarest first; ties by token). If
    jaccard(A, B) >= t then |A ∩ B| >= ceil(t/(1+t) * (|A|+|B|)), so two
    qualifying sets MUST share a token among each one's first
    p = |d| - ceil(t * |d|) + 1 tokens: only those prefix tokens enter
    the inverted index — the df-rarest tokens, so index postings are the
    SHORTEST lists in the corpus (the whole point of the df ordering).
  * length rule — jaccard(A, B) >= t implies t * |A| <= |B| <= |A| / t:
    candidates outside the band drop before any intersection work.

Verification computes the exact intersection with array_intersect on the
carried sorted token arrays — per-candidate cost, never corpus x corpus.
Every rule is a published inequality; correctness = brute force is
property-pinned in tests, and the pruning factor is measured in SCALE.md.

Scale shape: one token scan; df as a window over the distinct (doc,
token) relation; the inverted index holds PREFIX postings only; the
candidate join shuffles on single tokens (rare by construction — the
heaviest index lists are exactly the ones the prefix rule excludes); the
pair-level distinct is bounded by candidates. Jaccard compares as exact
integers (inter * denominator vs threshold numerator) — no float ratio
near the boundary.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def jaccard_similarity_join(
    df: DataFrame,
    id_col: str,
    set_col,
    threshold: Fraction | float,
    num: int | None = None,
    den: int | None = None,
) -> DataFrame:
    """(id_a, id_b, inter, sz_a, sz_b, jaccard) for every id_a < id_b whose
    SETS (the distinct elements of array column/expression `set_col` —
    word tokens, shingle hashes, feature ids...) have Jaccard >=
    threshold. Pass the threshold as a rational (num/den, e.g. 1/10) — the
    qualifying test runs in exact integer arithmetic:
    inter * den >= num * (sz_a + sz_b - inter)."""
    set_expr = F.col(set_col) if isinstance(set_col, str) else set_col
    elements = df.select(
        F.col(id_col).alias("id"), F.explode(set_expr).alias("tok")
    )
    return jaccard_join_elements(elements, "id", "tok", threshold, num=num, den=den)


def jaccard_join_elements(
    elements: DataFrame,
    id_col: str,
    el_col: str,
    threshold: Fraction | float | None = None,
    num: int | None = None,
    den: int | None = None,
) -> DataFrame:
    """Same join over a pre-exploded (id, element) relation — the entry
    point when elements come from a codegen pipeline (e.g. the window-lead
    shingle hasher in operators/dedup._doc_shingles; Spark evaluates
    higher-order-function array lambdas INTERPRETED, so building big
    element sets via F.transform costs ~10x the codegen form — the
    _doc_shingles lesson). Duplicate (id, element) rows are deduped here."""
    if num is None or den is None:
        frac = Fraction(threshold).limit_denominator(1_000_000)
        num, den = frac.numerator, frac.denominator
    if not 0 < num <= den:
        raise ValueError(f"threshold must be in (0, 1], got {num}/{den}")

    toks = elements.select(
        F.col(id_col).alias("id"), F.col(el_col).alias("tok")
    ).distinct()
    # global df ordering, rarest first (ties by token): one window over
    # the same distinct relation — no corpus re-scan
    ranked = toks.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("tok"))
    )
    # per-doc ordered token array + size; prefix length
    # p = sz - ceil(t*sz) + 1 = sz - floor((num*sz + den - 1)/den) + 1
    docs = (
        ranked.groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df", "tok"))
            ).alias("ordered"),
        )
        .select(
            "id",
            F.transform(F.col("ordered"), lambda s: s["tok"]).alias("toks"),
            F.size("ordered").alias("sz"),
        )
        .withColumn(
            "p",
            F.col("sz")
            - F.expr(f"(sz * {num} + {den} - 1) div {den}").cast("int")
            + 1,
        )
    )
    # the per-doc array relation feeds THREE plan branches (both sides of
    # the prefix join and the verify re-join); Spark's ReuseExchange does
    # not fire across join branches, so without a checkpoint the token
    # scan + groupBy re-runs per branch (the _two_level_top1 lesson in
    # operators/similarity.py). One localCheckpoint on the n_docs-row
    # relation collapses them. It also lets the candidate DISTINCT run on
    # bare (id_a, id_b) pairs — the token ARRAYS never enter that shuffle.
    docs = docs.localCheckpoint(eager=False)
    prefix = docs.select(
        "id", "sz", F.explode(F.slice("toks", 1, F.col("p"))).alias("ptok")
    )
    a = prefix.select(
        F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), "ptok"
    )
    b = prefix.select(
        F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), "ptok"
    )
    cand_ids = (
        a.join(b, "ptok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length band: t*sz_a <= sz_b <= sz_a/t, integer-exact
            & (F.col("sz_b") * den >= F.col("sz_a") * num)
            & (F.col("sz_a") * den >= F.col("sz_b") * num)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    cands = cand_ids.join(
        docs.select(
            F.col("id").alias("id_a"), F.col("toks").alias("toks_a"),
            F.col("sz").alias("sz_a"),
        ),
        "id_a",
    ).join(
        docs.select(
            F.col("id").alias("id_b"), F.col("toks").alias("toks_b"),
            F.col("sz").alias("sz_b"),
        ),
        "id_b",
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    qual = inter * den >= num * (F.col("sz_a") + F.col("sz_b") - inter)
    return (
        cands.withColumn("inter", inter)
        .filter(qual)
        .select(
            "id_a", "id_b", F.col("inter").cast("long").alias("inter"),
            F.col("sz_a").cast("long").alias("sz_a"),
            F.col("sz_b").cast("long").alias("sz_b"),
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )
