"""Corpus-trained character-n-gram model coverage — a deterministic
perplexity proxy for quality filtering.

CCNet-style pipelines score documents with a language-model perplexity and
drop the worst tail. True perplexity needs log-probabilities — floating
transcendentals that never bit-match across engines — so the filterable
signal here is the exact counting core of the same idea: train a top-M
character-bigram table on a deterministic sample of the corpus, then score
each document by the fraction of its bigram OCCURRENCES the table covers.
Natural text in the corpus's dominant register scores high; junk bytes,
wrong-language text, and boilerplate-free noise score low — the same
ranking a unigram/bigram LM induces, in integer-exact form.

Scale shape: pass 1 trains on an md5-thresholded sample (the dial — at
100 TB you train on ~1e-4 of the corpus; the table is top-M rows and
TakeOrdered never global-sorts); pass 2 broadcasts the M-row table and
scores every document with one explode + one broadcast join + one
per-document fold — corpus shuffled once, on the document id, with
map-side combine."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: md5 space for the sampling threshold (15 hex chars)
_M16 = 16**15


def _char_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bg) — every overlapping 2-char window of lower(text).

    DuckDB twin: substr(lower(text), i, 2) over unnest(range(1, length))."""
    base = df.select(
        F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("t")
    ).filter(F.length("t") >= 2)
    return base.select(
        "id", F.explode(F.sequence(F.lit(1), F.length("t") - 1)).alias("i"), "t"
    ).select("id", F.expr("substring(t, i, 2)").alias("bg"))


def char_bigram_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_m: int = 200,
    sample_rate: float = 0.2,
    salt: str = "bgs",
) -> DataFrame:
    """(bg) — the top_m most frequent character bigrams of a deterministic
    md5-thresholded document sample, tie-broken (count DESC, bg ASC) so the
    table is a pure function of (corpus, rate, salt)."""
    if not 0.0 < sample_rate <= 1.0:
        raise ValueError(f"sample_rate must be in (0, 1], got {sample_rate}")
    thr = int(sample_rate * _M16)
    sampled = df.filter(
        md5_long(F.col(id_col).cast("string"), seed=salt) < F.lit(thr)
    )
    return (
        _char_bigrams(sampled, id_col, text_col)
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bg"))
        .limit(top_m)
        .select("bg")
    )


def char_bigram_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_m: int = 200,
    sample_rate: float = 0.2,
    salt: str = "bgs",
) -> DataFrame:
    """(id, n_bigrams, covered, coverage) per document with >= 1 bigram:
    the fraction of bigram occurrences present in the corpus-trained
    table. coverage = covered / n_bigrams (one IEEE division, exact)."""
    model = char_bigram_model(df, id_col, text_col, top_m, sample_rate, salt)
    scored = _char_bigrams(df, id_col, text_col).join(
        F.broadcast(model.withColumn("in_m", F.lit(1))), "bg", "left"
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce(F.col("in_m"), F.lit(0))).cast("long").alias("covered"),
        )
        .withColumn("coverage", F.col("covered") / F.col("n_bigrams"))
    )
