"""JSON path extraction — the semi-structured column surface.

Event/properties columns ship as JSON strings (the events table's
`props` is exactly this); the engine needs first-class path extraction,
not regexp mining. Spark's `get_json_object` and DuckDB's
`json_extract_string` agree on the PARITY ENVELOPE this module exposes
(probed, not assumed):

  * scalar string/number/bool leaf paths ($.a.b)   -> same text
  * array indexing ($.a.b[1], zero-based)          -> same text
  * JSON null and missing paths                    -> SQL NULL in both

Outside the envelope — extracting an OBJECT subtree re-serializes it,
and while both engines minify simple docs identically, key-order and
escape normalization are not contractual across engines — so oracle-
checked pipelines extract scalars (take the subtree apart with deeper
paths instead). Typed getters cast the extracted text with try-semantics
(malformed numbers -> NULL, never a crashed job: at 100 TB there is
ALWAYS a malformed row).

All of this is codegen string work — zero shuffle, fused into the scan,
pushdown-friendly (a filter on an extracted field still prunes columns
to the one JSON string).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_get(col: Column, path: str) -> Column:
    """Scalar text at `path` ($.dotted[idx] form); NULL for missing or
    JSON-null. DuckDB twin: json_extract_string(col, path)."""
    return F.get_json_object(col, path)


def json_get_long(col: Column, path: str) -> Column:
    """Integer at `path`; NULL for missing/malformed (try cast)."""
    return F.get_json_object(col, path).try_cast("long")


def json_get_double(col: Column, path: str) -> Column:
    """Double at `path`; NULL for missing/malformed (try cast)."""
    return F.get_json_object(col, path).try_cast("double")
