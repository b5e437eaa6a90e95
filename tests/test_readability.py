"""Readability: hand-counted words/sentences/syllable-groups, exact
flesch_9 golds (incl. negative truncation), empty-doc NULL."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.functions.text import readability_counts, with_flesch_9


def _run(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    c = readability_counts(F.col("text"))
    base = df.select(
        "doc_id", c["words"].alias("words"), c["sentences"].alias("sentences"),
        c["syllables"].alias("syllables"),
    )
    return {
        r["doc_id"]: r
        for r in with_flesch_9(base, "words", "sentences", "syllables").collect()
    }


def _flesch9(w, s, y):
    num = 206_835_000_000 * s * w - 1_015_000_000 * w * w - 84_600_000_000 * y * s
    den = 1000 * s * w
    q = abs(num) // den
    return q if num >= 0 else -q  # truncation toward zero


def test_hand_counts(spark):
    got = _run(spark, ["The cat sat. It sat well!"])
    r = got[0]
    # words: 6; sentences: 2 ('.' and '!'); syllables: e,a,a,i,a,e = 6
    assert (r["words"], r["sentences"], r["syllables"]) == (6, 2, 6)
    assert r["flesch_9"] == _flesch9(6, 2, 6)


def test_ellipsis_is_one_boundary_and_fragment_floors(spark):
    got = _run(spark, ["wait... what", "no punctuation here"])
    assert got[0]["sentences"] == 1
    assert got[1]["sentences"] == 1  # floored, no boundary chars


def test_negative_score_truncates_toward_zero(spark):
    # one long jargon word: W=1, S=1, syl high -> deeply negative score
    got = _run(spark, ["antidisestablishmentarianism."])
    r = got[0]
    w, s, y = r["words"], r["sentences"], r["syllables"]
    assert r["flesch_9"] == _flesch9(w, s, y) and r["flesch_9"] < 0


def test_empty_doc_null(spark):
    got = _run(spark, ["", "   "])
    assert got[0]["flesch_9"] is None and got[1]["flesch_9"] is None
    assert got[0]["words"] == 0
