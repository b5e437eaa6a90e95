"""Gopher-style rule-based document quality filtering — the published
heuristic rule set (Rae et al. 2021, "Scaling Language Models: ... Gopher",
§A1.1; reused by MassiveText/RefinedWeb/Dolma-class pipelines) that a
training-data engine must expose as a first-class filter, distinct from
learned quality scores: every rule is an auditable threshold on a counted
feature, so acceptance is reproducible and oracle-checkable.

Rules implemented (each emitted as its own boolean so pipelines can tune
thresholds or drop rules without re-counting):

  * word count within [min_words, max_words]
  * mean word length within [3, 10] characters
  * symbol-to-word ratio (# and ... occurrences per word) <= 0.1
  * fraction of lines starting with a bullet char <= 0.9
  * fraction of lines ending with an ellipsis <= 0.3
  * fraction of words containing an alphabetic character >= 0.8
  * at least `min_stop_hits` of the 8 canonical English stopwords present

All pure codegen column expressions over engine-portable constructs
(split / size / filter / rlike character classes); ratio comparisons are
cleared to INTEGER inequalities (e.g. 10 * symbols <= words) so the
thresholds are boundary-exact in both engines — no float ratio ever
crosses an oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import ws_tokens

#: the Gopher paper's required-stopword list
STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: bullets the line-start rule recognizes (the common plain-text set)
_BULLET = r"^[ \t]*([-*•‣▪●])"


def gopher_rules(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
) -> dict[str, Column]:
    """Per-rule booleans + the counted features they derive from + the
    conjunction `gopher_pass`. Keys: n_words, n_chars_in_words, n_symbols,
    n_lines, n_bullet_lines, n_ellipsis_lines, n_alpha_words,
    n_stop_hits, and rule_* booleans."""
    words = ws_tokens(text)
    n_words = F.size(words)
    # sum of word lengths == length of the words concatenated (codegen,
    # no interpreted HOF aggregate)
    n_chars_in_words = F.length(F.concat_ws("", words))
    # '#' occurrences + '...' occurrences (the paper's symbol set)
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    n_symbols = (n_hash + n_ell).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_bullet_lines = F.size(F.filter(lines, lambda l: l.rlike(_BULLET)))
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"\.\.\.[ \t]*$"))
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    n_stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in STOPWORDS]),
            lambda s: F.array_contains(words, s),
        )
    )
    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        # 3 <= mean word len <= 10, cleared: 3*n <= chars AND chars <= 10*n
        "rule_mean_word_len": (n_chars_in_words >= 3 * n_words)
        & (n_chars_in_words <= 10 * n_words),
        "rule_symbol_ratio": 10 * n_symbols <= n_words,
        "rule_bullet_lines": 10 * n_bullet_lines <= 9 * n_lines,
        "rule_ellipsis_lines": 10 * n_ellipsis_lines <= 3 * n_lines,
        "rule_alpha_words": 10 * n_alpha_words >= 8 * n_words,
        "rule_stopwords": n_stop_hits >= min_stop_hits,
    }
    gopher_pass = F.lit(True)
    for r in rules.values():
        gopher_pass = gopher_pass & r
    return {
        "n_words": n_words.cast("long"),
        "n_chars_in_words": n_chars_in_words.cast("long"),
        "n_symbols": n_symbols,
        "n_lines": n_lines.cast("long"),
        "n_bullet_lines": n_bullet_lines.cast("long"),
        "n_ellipsis_lines": n_ellipsis_lines.cast("long"),
        "n_alpha_words": n_alpha_words.cast("long"),
        "n_stop_hits": n_stop_hits.cast("long"),
        **rules,
        "gopher_pass": gopher_pass,
    }
