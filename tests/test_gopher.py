"""Gopher rule filter (functions/gopher.py): each rule flips on exactly
its violation class; boundary exactness of the cleared-integer ratios."""

from __future__ import annotations

from pyspark.sql import functions as F

from brontes_spark.functions.gopher import gopher_rules

GOOD = ("the cat and the dog have been to the house of a friend with "
        "many other animals that were happy " * 3)  # ~51 plain words


def _run(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "t string")
    out = gopher_rules(F.col("t"), **kw)
    return df.select(*[c.alias(k) for k, c in out.items()]).collect()[0]


def test_good_doc_passes(spark):
    r = _run(spark, GOOD)
    assert r.gopher_pass, r.asDict()


def test_each_violation_flips_its_rule(spark):
    r = _run(spark, "too few words here")
    assert not r.rule_word_count
    assert not r.gopher_pass

    r = _run(spark, GOOD + " " + "# " * 30)
    assert not r.rule_symbol_ratio and not r.gopher_pass
    assert r.rule_word_count  # still long enough

    bullets = "\n".join("- item" for _ in range(10))
    r = _run(spark, bullets)
    assert not r.rule_bullet_lines

    r = _run(spark, GOOD + "\n" + "\n".join("and then..." for _ in range(9)))
    assert not r.rule_ellipsis_lines

    r = _run(spark, ("111 222 " * 30).strip())
    assert not r.rule_alpha_words and not r.rule_stopwords

    r = _run(spark, ("glyph " * 60).strip())  # no required stopwords
    assert not r.rule_stopwords and r.rule_alpha_words

    long_words = ("extraordinarily " * 60).strip()  # mean word len 16 > 10
    r = _run(spark, long_words)
    assert not r.rule_mean_word_len


def test_ratio_boundaries_are_inclusive_integer_exact(spark):
    # exactly 10% symbols: 10 * n_symbols == n_words -> rule HOLDS (<=)
    words = "the be to of and that have with ok fine"  # 10 words
    r = _run(spark, words + " #", min_words=1)
    # '#' makes an 11th token; build instead: 10 words, one '#' INSIDE a word
    df_text = "the# be to of and that have with ok fine"
    r = _run(spark, df_text, min_words=1)
    assert r.n_words == 10 and r.n_symbols == 1
    assert r.rule_symbol_ratio  # 10 * 1 <= 10 holds
    r2 = _run(spark, "the# be# to of and that have with ok fine", min_words=1)
    assert r2.n_symbols == 2 and not r2.rule_symbol_ratio


def test_counts_match_hand_values(spark):
    text = "the cat...\n- one\n- two\nplain line with the end..."
    r = _run(spark, text, min_words=1)
    assert r.n_lines == 4
    assert r.n_bullet_lines == 2
    assert r.n_ellipsis_lines == 2
    assert r.n_symbols == 2  # two '...' occurrences
