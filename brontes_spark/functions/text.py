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
