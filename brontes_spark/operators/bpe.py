"""Byte-pair-encoding tokenizer training, Spark-first.

BPE training (Sennrich et al. 2016) is the canonical tokenizer-building
loop: count adjacent symbol pairs across the corpus vocabulary, merge the
most frequent pair everywhere, repeat. The key scale observation: after
ONE corpus scan that builds the (word, count) vocabulary, every further
round runs on the VOCABULARY relation — bounded by distinct words, not
corpus tokens — so a 100 TB corpus pays the scan once and then iterates
over megabytes. The driver loop only assembles plans plus one bounded
1-row argmax collect per merge (the documented scalar-action pattern);
lineage is cut per merge with localCheckpoint, since each round rewrites
the symbol column the next round re-reads.

Symbols live as a space-joined string per word (the classic
representation): a merge is ONE codegen regexp_replace over the
vocabulary — left-to-right, non-overlapping, whole-symbol anchored via
lookarounds, exactly the list-walk greedy semantics of the reference
Python implementation (tests pin the 'a a a' overlap case).

Pair statistics are exact integer sums, so the stats step is
DuckDB-twin-able verbatim; tie-breaks are total (count DESC, then pair
lexicographic) so the learned merge sequence is deterministic and
engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel, one symbol; chosen outside [a-z] so it can never
#: collide with corpus characters after the ascii_only filter
END = "</w>"


def word_vocabulary(
    docs: DataFrame, text_col: str = "text", ascii_only: bool = True
) -> DataFrame:
    """(word, n) — whitespace-split lowercase vocabulary with counts.

    ``ascii_only`` keeps ^[a-z]+$ words: it makes per-character arithmetic
    byte/codepoint-agnostic across engines (the fuzzy.py lesson) and drops
    punctuation glue that BPE-over-words should not learn."""
    w = F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    words = docs.select(w)
    if ascii_only:
        words = words.filter(F.col("word").rlike("^[a-z]+$"))
    else:
        words = words.filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def initial_symbols(
    vocab: DataFrame, end_marker: bool = True
) -> DataFrame:
    """Add `syms`: the word as space-joined characters (+ END marker)."""
    spaced = F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 "))
    syms = F.concat(spaced, F.lit(" " + END)) if end_marker else spaced
    return vocab.withColumn("syms", syms)


def pair_stats(with_syms: DataFrame) -> DataFrame:
    """(a, b, pair_n) — adjacent-symbol pair counts weighted by word
    frequency. One explode over symbol positions (codegen element_at),
    one map-side-combined hash aggregate; output bounded by |alphabet|^2
    of the current symbol set."""
    arr = F.split(F.col("syms"), " ")
    pairs = with_syms.filter(F.size(arr) >= 2).select(
        # the size filter must precede sequence(): Spark's sequence(1, 0)
        # is the DESCENDING [1, 0], not empty, and element_at(_, 0) throws
        F.col("n"),
        arr.alias("_a"),
        F.explode(F.sequence(F.lit(1), F.size(arr) - 1)).alias("i"),
    ).select(
        F.element_at("_a", F.col("i")).alias("a"),
        F.element_at("_a", F.col("i") + 1).alias("b"),
        "n",
    )
    return pairs.groupBy("a", "b").agg(F.sum("n").alias("pair_n"))


def _merge_pattern(a: str, b: str) -> str:
    # \Q..\E literal-quotes the symbols; lookarounds anchor to whole
    # symbols so merging ('a','b') never touches 'ab c' or 'xa b'
    return rf"(?<!\S)\Q{a}\E \Q{b}\E(?!\S)"


def apply_merge(with_syms: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite 'a b' -> 'ab' (whole symbols, left-to-right greedy)."""
    merged = (a + b).replace("\\", "\\\\").replace("$", "\\$")
    return with_syms.withColumn(
        "syms", F.regexp_replace(F.col("syms"), _merge_pattern(a, b), merged)
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    end_marker: bool = True,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn `n_merges` merges; returns (merge list in order, final
    vocabulary with merged `syms`). Stops early when no pair remains."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    vocab = initial_symbols(
        word_vocabulary(docs, text_col), end_marker=end_marker
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_stats(vocab)
            .orderBy(F.col("pair_n").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = apply_merge(vocab, a, b).localCheckpoint(eager=False)
    return merges, vocab


def encode_words(
    vocab_syms: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge sequence to a fresh `initial_symbols` relation
    (tokenize new text with a trained tokenizer). Merge order matters —
    the sequence is replayed, not re-ranked."""
    out = vocab_syms
    for a, b in merges:
        out = apply_merge(out, a, b)
    return out
