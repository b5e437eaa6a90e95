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
