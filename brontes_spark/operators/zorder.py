"""Z-order (Morton) interleaving — the multi-dimensional data-CLUSTERING
key for write-side layout: sort a 100 TB table by the interleaved bits of
its two or three hottest filter columns and parquet row-group min/max
statistics prune BOTH dimensions at scan time (the Delta/Iceberg OPTIMIZE
ZORDER story; a single-column sort clusters one dimension and scatters
the rest). The index itself is the engine primitive: pure integer bit
interleaving, one codegen projection, exact and oracle-checkable.

Each input column is masked to `bits` low bits (values are expected
pre-normalized into that range — rank, bucket id, or truncated key; the
mask is a guard, not a hash) and bit b of column i lands at position
b * k + i of the z-value, so k * bits must fit a signed long (<= 63).

`zorder_sql` emits the identical expression in DuckDB syntax, so gates
can hash-match the interleave exactly — and `zorder_skip_ratio` (SCALE.md)
measures the actual row-group pruning a z-sorted write buys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _check(n_cols: int, bits: int) -> None:
    if n_cols < 2:
        raise ValueError("z-ordering needs >= 2 columns (sort handles 1)")
    if bits < 1 or n_cols * bits > 63:
        raise ValueError(
            f"{n_cols} cols x {bits} bits = {n_cols * bits} z-bits; must be in [1, 63]"
        )


def zorder_index(cols: list[str], bits: int = 16) -> Column:
    """The Morton interleave of `cols` (column names, integer-typed) as one
    bigint codegen expression: bit b of cols[i] -> z-bit b*k + i."""
    _check(len(cols), bits)
    k = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                f"(shiftleft((shiftright(CAST({c} AS BIGINT), {b}) & 1), {b * k + i}))"
            )
    return F.expr(" | ".join(terms))


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """DuckDB twin of zorder_index — same interleave, DuckDB bit-op
    spelling (xor-free: | of disjoint shifted bits)."""
    _check(len(cols), bits)
    k = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"((({c}::BIGINT >> {b}) & 1) << {b * k + i})")
    return " | ".join(terms)
