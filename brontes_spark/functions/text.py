"""Text primitives for the LLM-data-pipeline operators (dedup, quality,
language-ID, token counting). Each has an exact DuckDB-SQL twin used by the
oracle harness; semantics are deliberately restricted to constructs both
engines implement identically (split on single space, character-class
regexes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ws_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties removed.

    DuckDB twin: list_filter(string_split(lower(text), ' '), x -> x != '')
    """
    return F.filter(F.split(F.lower(text), " "), lambda x: x != F.lit(""))


def word_ngrams(tokens: Column, n: int = 3) -> Column:
    """Array of space-joined word n-grams (may contain duplicates).

    DuckDB twin (n=3):
      [tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
       for i in range(1, len(tokens)-1)]   -- via range() lateral join
    """
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    return F.when(F.size(tokens) >= n, F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )).otherwise(F.array().cast("array<string>"))


def norm_text(text: Column) -> Column:
    """Normalization for fingerprinting: lowercase, collapse whitespace, trim.

    The whitespace class is EXPLICIT, not \\s: Java's \\s includes vertical
    tab (\\x0B) but DuckDB's RE2 \\s does not, so \\s-normalized fingerprints
    diverge between engines on any document containing one.

    DuckDB twin: trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))
    """
    return F.trim(F.regexp_replace(F.lower(text), r"[ \t\n\r\f\x0B]+", " "))


#: PII patterns restricted to constructs Java regex and RE2 evaluate
#: identically (no backrefs, no lookaround; \b and bounded quantifiers are
#: common to both). Pattern order matters: emails scrub before IPs so the
#: host part of an address is consumed by the email pattern, not re-matched.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\[\] .-]{6,}[0-9]", "<PHONE>"),
]


def scrub_pii(text: Column) -> tuple[Column, dict[str, Column]]:
    """Redact emails/IPs/phones with typed placeholders; returns the
    scrubbed column plus per-type match counts (computed BEFORE scrubbing,
    on the same evolving text each pattern actually saw, so counts always
    equal the number of replacements made).

    The standard privacy pass a training-data pipeline runs before
    publication; pure column expressions — one codegen projection, no
    Python, no shuffle.

    DuckDB twins: regexp_replace(x, pat, rep, 'g') and
    length(x) - length(regexp_replace(x, pat, '', 'g')) style counting via
    len(regexp_extract_all(x, pat)).
    """
    counts: dict[str, Column] = {}
    cur = text
    for name, pat, rep in PII_PATTERNS:
        counts[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        cur = F.regexp_replace(cur, pat, rep)
    return cur, counts


#: HTML entity decode order: named entities first, the ampersand LAST so
#: double-escaped sequences (&amp;lt;) decode exactly one level per pass —
#: the standard single-pass entity semantics
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_to_text(html: Column) -> Column:
    """Extract visible text from HTML markup: drop <script>/<style> blocks
    and comments, strip remaining tags to spaces, decode the common
    entities, collapse whitespace (explicit class — see norm_text for why
    not \\s). The crawl-pipeline landing transform that runs BEFORE every
    text operator in this module.

    Pure column expressions restricted to regex constructs Java regex and
    RE2 evaluate identically ((?is) flags and lazy quantifiers; NO
    backreferences — script and style strip as separate patterns because
    RE2 has no \\1). Documented limitation, shared with every regex-based
    extractor: a literal '>' inside an attribute value truncates that tag
    early.

    DuckDB twin: the same regexp_replace(x, pat, ' ', 'gis') chain +
    replace() entity ladder.
    """
    c = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"[ \t\n\r\f\x0B]+", " "))


#: Unicode script classes for script_profile: (name, Java regex, RE2/DuckDB
#: regex). Java spells scripts \p{IsX}, RE2 \p{X}; the CLASSES are the same
#: Unicode property and count identically (cross-engine parity is pinned in
#: tests/test_script_profile.py on a mixed-script fixture).
SCRIPT_CLASSES = [
    ("latin", r"\p{IsLatin}", r"\p{Latin}"),
    ("cyrillic", r"\p{IsCyrillic}", r"\p{Cyrillic}"),
    ("greek", r"\p{IsGreek}", r"\p{Greek}"),
    ("han", r"\p{IsHan}", r"\p{Han}"),
    ("arabic", r"\p{IsArabic}", r"\p{Arabic}"),
    ("hebrew", r"\p{IsHebrew}", r"\p{Hebrew}"),
    ("hangul", r"\p{IsHangul}", r"\p{Hangul}"),
    ("kana", r"[\p{IsHiragana}\p{IsKatakana}]", r"[\p{Hiragana}\p{Katakana}]"),
    ("digit", r"[0-9]", r"[0-9]"),
    ("space", r"\s", r"\s"),
]


def script_profile(text: Column) -> dict[str, Column]:
    """Integer codepoint counts per Unicode script class, plus total and
    the not-any-listed-class remainder — the script histogram multilingual
    corpus curation filters on (wrong-script contamination, mixed-script
    spam, digit walls). Pure codegen: count(class) = length(x) -
    length(regexp_replace(x, class, '')), codepoint semantics in both
    engines; classes are disjoint scripts so `other` = total - sum.

    DuckDB twin per class: length(x) - length(regexp_replace(x, re2_pat,
    '', 'g')) — the 'g' flag matters (DuckDB replaces first-only without
    it; Spark always replaces all)."""
    counts = {
        name: F.length(text) - F.length(F.regexp_replace(text, java_pat, ""))
        for name, java_pat, _ in SCRIPT_CLASSES
    }
    total = F.length(text)
    other = total
    for c in counts.values():
        other = other - c
    return {"n_chars_total": total, **{f"n_{k}": v for k, v in counts.items()},
            "n_other": other}


def readability_counts(text: Column) -> dict[str, Column]:
    """Flesch-style readability inputs, zero-shuffle codegen: words,
    sentence groups, and vowel-group syllable proxies — each an exact
    integer from one regexp pass over the row.

    * words: whitespace tokens (the ws_tokens convention).
    * sentences: maximal [.!?]+ runs ("..." is ONE boundary), floored at
      1 so fragment docs don't divide by zero.
    * syllables: maximal [aeiouy]+ runs over the lowercased text — the
      classic dictionary-free proxy (whitespace breaks runs at word
      boundaries on its own, so no explode is needed). Counted as
      len(replace(runs -> 1 char)) - len(replace(runs -> '')), a pair of
      codegen regexp_replace calls with byte-identical semantics in
      DuckDB (verified: 'beautiful' -> 'bVtVfVl' in both engines).

    DuckDB twins mirror each expression 1:1; see txt_readability's oracle.
    """
    lowered = F.lower(text)
    def _groups(col: Column, pat: str) -> Column:
        return (
            F.length(F.regexp_replace(col, pat, "V"))
            - F.length(F.regexp_replace(col, pat, ""))
        ).cast("long")

    return {
        "words": F.size(ws_tokens(text)).cast("long"),
        "sentences": F.greatest(F.lit(1).cast("long"), _groups(text, "[.!?]+")),
        "syllables": _groups(lowered, "[aeiouy]+"),
    }


def with_flesch_9(
    df, words_col: str, sentences_col: str, syllables_col: str,
    out_col: str = "flesch_9",
):
    """Append Flesch reading ease scaled 1e9, exact integer arithmetic:

        F = 206.835 - 1.015*(W/S) - 84.6*(syl/W)
          = (206835*S*W - 1015*W^2 - 84600*syl*S) / (1000*S*W)

    as ONE integer division over decimal(38,0) columns. The numerator
    goes NEGATIVE for dense jargon, and integer division truncates
    TOWARD ZERO identically in Spark (`div`) and DuckDB (`//`, measured
    -7 // 2 = -3), so the twin agrees without a floor adjustment —
    truncation, not floor, is this function's documented rounding.
    NULL when words == 0 (empty doc: no prose to score). Envelope:
    1015e9 * W^2 needs W < ~6e12 words per document — any document.
    """
    d = "decimal(38,0)"
    w = F.col(words_col).cast(d)
    s = F.col(sentences_col).cast(d)
    y = F.col(syllables_col).cast(d)
    num = (
        F.lit(206_835_000_000).cast(d) * s * w
        - F.lit(1_015_000_000).cast(d) * w * w
        - F.lit(84_600_000_000).cast(d) * y * s
    )
    den = F.lit(1000).cast(d) * s * w
    return (
        df.withColumn("_fnum", num)
        .withColumn("_fden", den)
        .withColumn(
            out_col,
            F.when(F.col(words_col) > 0, F.expr("_fnum div _fden")),
        )
        .drop("_fnum", "_fden")
    )
