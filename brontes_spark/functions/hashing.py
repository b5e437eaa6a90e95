"""Deterministic, engine-portable hashing.

Spark's `hash()`/`xxhash64()` and DuckDB's `hash()` use different algorithms,
so every hash that feeds a correctness-checked result derives from md5 hex —
identical everywhere. Performance note: md5 here is a JVM-side codegen'd
expression (no Python roundtrip); at 100 TB scale the md5 cost is dwarfed by
the shuffle it feeds (MinHash/LSH bucketing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(c: Column, seed: Column | str | int | None = None, chars: int = 15) -> Column:
    """First `chars` hex chars of md5 as a non-negative bigint (max 15 → 60 bits).

    DuckDB twin: ('0x' || substr(md5(<expr>), 1, chars))::BIGINT
    """
    payload = c if seed is None else F.concat(F.lit(str(seed)), F.lit("|"), c)
    return F.conv(F.substring(F.md5(payload), 1, chars), 16, 10).cast("long")


def md5_bit(c: Column, bit_source_char: int = 1) -> Column:
    """One pseudo-random bit from an md5 hex digit (parity of its value).

    DuckDB twin: ('0x' || substr(md5(<expr>), pos, 1))::BIGINT % 2
    """
    return (F.conv(F.substring(F.md5(c), bit_source_char, 1), 16, 10).cast("long") % 2)
