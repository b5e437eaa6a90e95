"""Unicode text normalization — the landing-zone cleanup a multilingual
corpus needs before any hashing/dedup/tokenization (two byte-different
encodings of "café" must fingerprint identically).

Two layers, split by where they can run:

* `clean_text` — pure codegen column math: control-character strip,
  zero-width removal, Unicode-space unification, typographic quote/dash
  folding, whitespace collapse. Patterns embed the literal characters
  (not engine-specific escape dialects) and stay inside the RE2∩Java
  subset, so the DuckDB twin is the same expression text.
* `with_nfc` — canonical composition (NFC) via Python's unicodedata in an
  Arrow-batched mapInPandas kernel: NFC is a ~30k-entry Unicode data
  table, not an expressible formula. The oracle runs DuckDB's
  nfc_normalize (utf8proc) — two INDEPENDENT implementations of the same
  Unicode standard, so the parity gate cross-validates both.

Scale: clean_text is one whole-stage-codegen projection; with_nfc is a
stateless map (no shuffle) whose kernel is a C-speed library call per
string — the same posture as every other mapInPandas landing transform.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: zero-width + BOM characters, embedded literally
_ZERO_WIDTH = "​‌‍﻿"
#: C0/C1 controls except \t \n \r (which unify to space below)
_CONTROLS = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
#: anything Unicode calls a space, plus the three kept controls
_SPACES = "[\\t\\n\\r\\p{Zs}]"


def clean_text(col: Column) -> Column:
    """Control strip, zero-width strip, space unification, typographic
    quote/dash folding, whitespace collapse, trim. DuckDB twin: the same
    five regexp_replace/translate steps (RE2 reads \\p{Zs} identically)."""
    c = F.regexp_replace(col, _CONTROLS, "")
    c = F.translate(c, _ZERO_WIDTH, "")
    c = F.regexp_replace(c, _SPACES, " ")
    c = F.translate(c, "‘’‚“”„–—", "'''\"\"\"--")
    c = F.regexp_replace(c, "  +", " ")
    return F.trim(c)


def with_nfc(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Adds `out_col` (default: replaces `text_col`) = NFC-composed text.
    Null-safe; non-string junk never reaches the kernel (schema-typed
    column). Stateless mapInPandas — zero shuffle, Arrow both ways."""
    import unicodedata

    out = out_col or text_col
    schema_df = df.withColumn(out, F.col(text_col))
    schema = schema_df.schema
    names = [f.name for f in schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = pdf[text_col]
            pdf = pdf.copy()
            pdf[out] = [
                unicodedata.normalize("NFC", v) if isinstance(v, str) else v
                for v in vals
            ]
            yield pdf[names]

    return schema_df.mapInPandas(kernel, schema=schema)
