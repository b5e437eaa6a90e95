"""Deterministic Bloom-filter membership sketch.

Spark's own runtime Bloom filters (`bloom_filter_agg` / `might_contain`,
injected by the optimizer for runtime row-group pruning) are internal and
implementation-defined; this one is built from the repo's md5 hash policy
(functions/hashing.py) so the bitmap — and therefore every membership
verdict — is a pure function of the data: engine-identical, partitioning-
invariant, and recomputable by a DuckDB oracle.

Use case at 100 TB: membership pre-filtering against a set that is too big
to broadcast as a join hash relation. A billion 60-bit shingles cost ~8 GB
as a broadcast set; a 2^30-bit Bloom bitmap holding them at ~1% false-
positive rate costs 128 MB. Bloom filters have ZERO false negatives, so

    corpus -> bloom prefilter (no shuffle) -> exact verify join on the
    surviving candidates (tiny)

is exactly equal to the exact semi-join (test-pinned in
tests/test_bloom.py) while never moving the corpus.

Representation: the bitmap is m_bits packed into m_bits/64 longs —
either a DataFrame (word_idx, bits) that stays distributed and merges by
bitwise OR (partial builds over corpus slices fold exactly: OR is
idempotent/commutative), or a driver-side dense list for the
literal-codegen membership test. The literal path embeds the bitmap in
the plan, good to ~2^22 bits (64 KB of longs); past that, keep the
DataFrame form and probe via k broadcast joins (`bloom_member_join`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def _positions(val: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """k deterministic bit positions: md5_long(i || '|' || val) % m_bits.

    DuckDB twin of position i:
      ('0x' || substr(md5(i || '|' || val), 1, 15))::BIGINT % m_bits
    """
    if m_bits <= 0 or m_bits % 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    return [md5_long(val.cast("string"), seed=i) % m_bits for i in range(n_hashes)]


def bloom_build(
    df: DataFrame, val_col: str, m_bits: int = 1 << 20, n_hashes: int = 4
) -> DataFrame:
    """(word_idx, bits) — the Bloom bitmap of `val_col`'s values, packed 64
    bits per row, absent rows meaning all-zero words. Built distributed:
    the per-value positions explode map-side and fold through ONE
    map-side-combined bit_or groupBy, so the shuffle carries at most
    m_bits/64 rows per task regardless of input size."""
    pos = F.explode(
        F.array(*_positions(F.col(val_col), m_bits, n_hashes))
    ).alias("pos")
    return (
        # a NULL value hashes to NULL positions and would emit a (NULL
        # word_idx, NULL mask) row that crashes bloom_words' int() — NULLs
        # are not set members, drop them at the scan
        df.filter(F.col(val_col).isNotNull())
        .select(pos)
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """OR-fold of bitmaps built over slices of a set: exactly the bitmap of
    the union (bitwise OR is how 100 TB builds per-partition and folds)."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_words(words_df: DataFrame, m_bits: int) -> list[int]:
    """Collect a (word_idx, bits) bitmap to a dense driver-side list of
    m_bits/64 longs (the literal-codegen membership path). The collect is
    bounded by the bitmap size, never the data."""
    dense = [0] * (m_bits // 64)
    for r in words_df.collect():
        dense[int(r["word_idx"])] = int(r["bits"])
    return dense


def with_bloom_member(
    df: DataFrame,
    val_col: str,
    words: list[int],
    n_hashes: int = 4,
    out_col: str = "bloom_member",
) -> DataFrame:
    """Adds boolean `out_col`: true iff all k hash bits of `val_col` are set
    in the literal bitmap — one whole-stage-codegen projection, no joins,
    no shuffle. m_bits is implied by len(words) * 64."""
    m_bits = len(words) * 64
    out = df.withColumn("_bw", F.lit(words))
    cond = F.lit(True)
    for i, p in enumerate(_positions(F.col(val_col), m_bits, n_hashes)):
        out = out.withColumn(f"_bp{i}", p)
        cond = cond & F.expr(
            f"(element_at(_bw, CAST(shiftright(_bp{i}, 6) + 1 AS INT)) "
            f"& shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} & 63 AS INT))) != 0"
        )
    # a NULL value probes NULL positions and the conjunction goes NULL —
    # membership is a predicate, so NULL input means false, not unknown
    # (bloom_member_join gets the same via its per-probe coalesce)
    return out.withColumn(out_col, F.coalesce(cond, F.lit(False))).drop(
        "_bw", *[f"_bp{i}" for i in range(n_hashes)]
    )


def bloom_member_join(
    df: DataFrame,
    val_col: str,
    words_df: DataFrame,
    m_bits: int,
    n_hashes: int = 4,
    out_col: str = "bloom_member",
) -> DataFrame:
    """Membership test against a bitmap too big to embed as a literal: the
    (word_idx, bits) DataFrame broadcasts once (128 MB at 2^30 bits) and
    each of the k probes is a broadcast hash join on word_idx — zero
    shuffles on `df`'s side. A missing word row means an all-zero word,
    i.e. definitely-not-member."""
    out = df
    cond = F.lit(True)
    for i, p in enumerate(_positions(F.col(val_col), m_bits, n_hashes)):
        out = out.withColumn(f"_bp{i}", p)
        side = F.broadcast(
            words_df.select(
                F.col("word_idx").alias(f"_bw{i}"), F.col("bits").alias(f"_bits{i}")
            )
        )
        out = out.join(
            side, F.shiftright(F.col(f"_bp{i}"), 6) == F.col(f"_bw{i}"), "left"
        )
        cond = cond & F.expr(
            f"coalesce((_bits{i} & shiftleft(CAST(1 AS BIGINT), "
            f"CAST(_bp{i} & 63 AS INT))) != 0, false)"
        )
    drop = [c for i in range(n_hashes) for c in (f"_bp{i}", f"_bw{i}", f"_bits{i}")]
    return out.withColumn(out_col, cond).drop(*drop)


def decontaminate_bloom(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_hits: int = 1,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Benchmark decontamination with a Bloom pre-filter: EXACTLY equal to
    operators.dedup.decontaminate (the verify join removes every false
    positive; zero false negatives by construction — test-pinned), but the
    corpus side is reduced to bloom-positive shingle occurrences BEFORE any
    join, and the verify join is deliberately NOT broadcast-hinted: the
    scale regime this exists for is an eval/blocklist set of ~10^9 shingles
    that no longer fits a broadcast hash relation, where the bitmap still
    ships to every executor and the sort-merge verify shuffles only the
    (tiny) candidate set plus one pass of the eval side. At gate scale AQE
    picks broadcast on its own."""
    from .dedup import _doc_shingles

    cs = _doc_shingles(corpus, id_col, text_col, n)
    ev = _doc_shingles(eval_docs, id_col, text_col, n).select(
        "shingle_h", F.col("id").alias("eval_id")
    )
    # the eval shingle relation feeds TWO actions — the bitmap build's
    # collect (below, eager at construction time) and the verify join —
    # and without a cut the second pass re-tokenizes and re-hashes the
    # eval docs. A lazy lineage cut computes it once; the relation is
    # eval-set-sized, never corpus-sized (r11 interleaved A/B at sf0.1:
    # base 1.97 s, cut 1.81 s, persist 1.92 s — the RDD cut wins over the
    # columnar cache, the bfs.py finding). Storage-cost caveat (r11
    # advice): at the module's stated ~1e9-eval-shingle ceiling these
    # checkpoint blocks are a multi-GB deserialized MEMORY_AND_DISK copy
    # held until the RDD is GC'd; in that regime trade the cut for
    # serialized storage (persist(StorageLevel.MEMORY_AND_DISK_SER)) or
    # re-derive — the cut's win here is measured at eval-set scale.
    ev = ev.localCheckpoint(eager=False)
    words = bloom_words(bloom_build(ev, "shingle_h", m_bits, n_hashes), m_bits)
    cand = (
        with_bloom_member(cs, "shingle_h", words, n_hashes)
        .filter(F.col("bloom_member"))
        .drop("bloom_member")
    )
    return (
        cand.join(ev, "shingle_h")
        .groupBy("id")
        .agg(
            F.countDistinct("shingle_h").alias("n_hits"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_hits") >= min_hits)
    )
