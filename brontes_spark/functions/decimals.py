"""Exact-decimal arithmetic policy.

The reference computes amounts/prices with exact rationals (malachite
`Rational`, e.g. `crates/brontes-types/src/normalized_actions/swaps.rs:63-64`);
SURVEY.md §1.2 maps this to Spark decimals. Beyond semantics this buys
*determinism*: double aggregation order differs run-to-run across shuffle
partitions, while decimal sums are exact integer arithmetic — so results are
bit-identical between Spark, DuckDB oracles, and any cluster size. Policy:

  * cast inputs once to a small-precision decimal (DEC = 18,6 / DEC9 = 18,9);
  * keep operand precision low so products NEVER exceed precision 38 — no
    intermediate rounding ever happens (Spark rounds HALF_UP, DuckDB
    HALF_EVEN; by never rounding mid-plan the difference can't surface);
  * convert to double only in the final projection (`to_dbl`).

Doubles cast to decimal can't hit exact half-grid midpoints (a binary
fraction is never k·10^-7 with odd k), so the input cast is also
engine-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"   # money/amount columns (testdata doubles are 2dp)
# Embedding components: 6dp at precision 9 keeps a 64-dim dot product's
# unscaled sum below 2^53, so even a DIRECT decimal→double cast is correctly
# rounded in both engines — no scale-reduction step (and no midpoint-rounding
# divergence) anywhere in the similarity pipeline.
DEC9 = "decimal(9,6)"


def dec(c: Column | str) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast(DEC)


def dec9(c: Column | str) -> Column:
    # widen float→double BEFORE the decimal cast: Spark converts float→decimal
    # via the float's shortest string repr (which manufactures exact midpoints
    # like "0.1234565" that round differently from the true binary value);
    # the double's repr is precise enough that both engines round identically.
    return (F.col(c) if isinstance(c, str) else c).cast("double").cast(DEC9)


def to_dbl(c: Column | str, scale: int = 6) -> Column:
    """Decimal → double via an exact scale-normalization step.

    Direct decimal→double conversion diverges between engines by 1 ulp when
    the unscaled int128 exceeds 2^53 (DuckDB divides doubles; the JVM rounds
    correctly). Our decimal values carry at most ~`scale` digits of true
    content (inputs are 2dp money values; see module docstring), so casting
    to DECIMAL(38,scale) first is *exact*, and the resulting unscaled value
    fits 2^53 — after which both engines produce the identical double.

    DuckDB twin: CAST(CAST(x AS DECIMAL(38,scale)) AS DOUBLE)
    """
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(f"decimal(38,{scale})").cast("double")
