"""Substring-level exact deduplication (duplicate-span removal).

Document-level dedup (exact / MinHash / SimHash) misses the dominant
failure mode of web-scale corpora: long passages repeated VERBATIM inside
otherwise-distinct pages — boilerplate, license blocks, syndicated
articles. Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better") remove these at the substring level with a suffix array
over the concatenated corpus; the relational re-expression over token
sequences: a k-token window whose token sequence occurs more than once in
the corpus is a duplicate span — keep the FIRST occurrence (minimal
(doc_id, position)), flag every other occurrence, and merge overlapping /
touching flagged windows into maximal per-document removal intervals.

Scale shape (the 100 TB story):
  * gram hashing is the _doc_shingles formulation (posexplode + window
    leads — pure codegen; array-lambda HOFs are interpreted and measured
    ~18x slower in operators/dedup.py), hashed to 60-bit longs BEFORE any
    shuffle so the inverted index moves fixed-width keys;
  * the inverted index is ONE unordered window over the gram hash — one
    corpus scan and one fixed-width shuffle total (the groupBy + join-back
    alternative scans and re-hashes the corpus twice, and its map-side
    combine buys nothing on mostly-unique gram hashes);
  * the interval merge is one document-key shuffle over ONLY the flagged
    windows (count > 1 minus canonicals) — never the corpus.

No suffix array is materialized: the fixed-k windowing trades Lee et al.'s
"any length >= L match" for "every length >= k*token match is covered by
its k-token sub-windows", which flags a superset of the same spans (every
duplicated passage of >= k tokens contains a duplicated k-window at each
offset, so the merged intervals reconstruct the full passage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..functions.text import ws_tokens


def gram_occurrences(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, pos, gh) — every k-token window, as a 60-bit md5 hash of the
    space-joined token slice, with its 0-based token offset. NOT distinct:
    positions matter (the whole point is span-level granularity)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = W.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, k)]
    return (
        toks.select("id", "pos", *[p.alias(f"t{j}") for j, p in enumerate(parts)])
        .filter(F.col(f"t{k-1}").isNotNull())
        .select(
            "id",
            "pos",
            md5_long(F.concat_ws(" ", *[f"t{j}" for j in range(k)])).alias("gh"),
        )
    )


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Merged removal intervals per document: (id, span_start, span_end),
    0-based half-open token offsets.

    Keep-first semantics: for each duplicated k-gram, the occurrence with
    the lexicographically minimal (id, pos) is canonical and never flagged;
    every other occurrence contributes its [pos, pos+k) window. Overlapping
    AND touching windows merge (their union is one contiguous removal
    region), so each output row is a maximal duplicated passage.
    """
    # Single-scan formulation: a groupBy(gh) + join-back would scan and
    # gram-hash the corpus TWICE (plan-audited: two FileScans), and partial
    # aggregation buys almost nothing because gram hashes are mostly unique.
    # One unordered window over gh moves the same occurrence rows through
    # one shuffle and computes the duplicate count + canonical occurrence
    # in place — one corpus scan total, no join.
    occ = gram_occurrences(df, id_col, text_col, k)
    wg = W.partitionBy("gh")
    flagged = (
        occ.select(
            "id",
            "pos",
            F.count(F.lit(1)).over(wg).alias("n"),
            F.min(F.struct("id", "pos")).over(wg).alias("canon"),
        )
        .filter(
            (F.col("n") > 1)
            & ~(
                (F.col("id") == F.col("canon.id"))
                & (F.col("pos") == F.col("canon.pos"))
            )
        )
        .select("id", F.col("pos").alias("s"), (F.col("pos") + k).alias("e"))
    )
    # classic interval merge: a window starts a new group iff it begins
    # strictly after the running max end of everything before it
    w = W.partitionBy("id").orderBy("s")
    prev_end = F.max("e").over(w.rowsBetween(W.unboundedPreceding, -1))
    grouped = flagged.withColumn(
        "grp",
        F.sum(
            F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0)
        ).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        grouped.groupBy("id", "grp")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select("id", "span_start", "span_end")
    )


def span_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Per-document removal accounting: (id, n_tokens, dup_tokens,
    dup_frac). Documents with no duplicated span report 0 / 0.0 — the
    left join keeps the corpus side complete so downstream keep/drop
    decisions (e.g. drop docs with dup_frac > 0.8, trim spans otherwise)
    see every document."""
    spans = duplicate_spans(df, id_col, text_col, k)
    per_doc = spans.groupBy("id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens")
    )
    counts = df.select(
        F.col(id_col).alias("id"),
        F.size(ws_tokens(F.col(text_col))).alias("n_tokens"),
    )
    return (
        counts.join(per_doc, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            (
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1))
            ).alias("dup_frac"),
        )
    )


def trim_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """(id, text_trimmed, n_tokens, kept_tokens) — the corpus with every
    duplicate span REMOVED (keep-first: canonical occurrences survive),
    i.e. the apply step of substring-level dedup. Documents with no
    flagged span pass through with their tokenized form intact.

    Plan: the merged intervals fold back onto the corpus as ONE per-doc
    array (collect_list after the interval merge), and the token drop is
    in-row array math — zip tokens with positions, keep those covered by
    no interval, rejoin. The corpus is joined once against the (small)
    flagged-doc interval table; untouched docs take the left-join null
    path with zero work. Output is the token-normalized text (single
    spaces): the trim operates on the SAME token stream the detection
    hashed, so removed == flagged exactly."""
    spans = duplicate_spans(df, id_col, text_col, k)
    per_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("iv")
    )
    toks = df.select(
        F.col(id_col).alias("id"), ws_tokens(F.col(text_col)).alias("toks")
    )
    joined = toks.join(per_doc, "id", "left")
    # index-aware filter lambda: no zip_with/sequence companion array —
    # sequence(0, size-1) is the DESCENDING [0, -1] on empty docs (the
    # same Spark trap operators/sampling.py documents) and zip_with would
    # null-pad; filter over the tokens themselves is empty-safe
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            F.coalesce(F.col("iv"), F.array()),
            lambda v: (i >= v["span_start"]) & (i < v["span_end"]),
        ),
    )
    return joined.select(
        "id",
        F.concat_ws(" ", kept).alias("text_trimmed"),
        F.size("toks").alias("n_tokens"),
        F.size(kept).alias("kept_tokens"),
    )
