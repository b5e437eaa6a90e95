"""Time-weighted average price (TWAP) over irregular observations.

X4/X6 (operators/vwap.py) weight by traded VOLUME; TWAP weights each
observation by how long it remained the live price — the standard benchmark
for quote streams where volume is absent or untrusted (the reference's CEX
quote tables, crates/brontes-database/src/libmdbx/cex_utils.rs hold
bid/ask snapshots exactly like this). Piecewise-constant semantics: an
observation holds from its own timestamp until the next observation of the
same key; the final observation closes the window and contributes zero
duration (the [first, last] span is covered exactly once).

Exactness policy: prices enter as exact cents (decimal(18,2) cast, never a
double round-trip), durations as integer milliseconds, and the weighted
mean leaves as twap9 = floor(1e9 * dollars) computed with the two-step
integer division

    q = num div den;  twap9 = q * 10^7 + ((num - q * den) * 10^7) div den

which is floor(1e7 * num / den) exactly while every intermediate stays
under 2^63: num = sum(cents_i * dur_ms_i) <= max_cents * span_ms, and the
remainder term is bounded by den * 10^7 = span_ms * 10^7.

Scale shape (100 TB): ONE shuffle on the key for the ordered lead window,
then a map-side-partial hash aggregate per key — no join against a
calendar, no explode. The millisecond grain is the documented dial: finer
grains shrink the headroom on num (microseconds are safe up to
max_cents * span_us < 2^63, ~10 days of 100.00-priced quotes per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

NS_PER_MS = 1_000_000


def twap(
    df: DataFrame,
    key_col: str,
    ts_ns_col: str,
    price_col: str,
    tie_col: str,
) -> DataFrame:
    """(key, n_obs, span_ms, twap9) per key; twap9 NULL for span-zero keys.

    ``tie_col`` must make (ts, tie) unique per key so the lead is a total
    order. Co-timestamped observations: all but the LAST in tie order get
    zero-length intervals, so the last tick at a timestamp is the one that
    holds until the next — the market convention for same-instant updates.
    """
    w = W.partitionBy(key_col).orderBy(ts_ns_col, tie_col)
    # FLOOR-aligned integer division (never a double divide): the pmod
    # subtraction makes Spark's truncating `div` floor for pre-epoch
    # timestamps too, matching DuckDB's `//` (the gapfill.py parity policy)
    ms = F.expr(
        f"({ts_ns_col} - pmod({ts_ns_col}, {NS_PER_MS})) div {NS_PER_MS}"
    )
    # keep key_col's ORIGINAL attribute through the aggregate: aliasing it
    # first mints a new exprId and Catalyst can no longer prove the window
    # exchange already partitions by the group key — the rename would cost
    # a second full shuffle (verified on .explain; 2 exchanges -> 1)
    stepped = df.select(
        key_col,
        F.col(price_col).cast("decimal(18,2)").alias("_px"),
        (F.lead(ms).over(w) - ms).alias("dur_ms"),
    )
    # last observation per key: lead is NULL -> zero duration
    terms = stepped.select(
        key_col,
        F.coalesce(F.col("dur_ms"), F.lit(0)).alias("dur_ms"),
        (F.col("_px") * 100).cast("long").alias("cents"),
    )
    agg = terms.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("dur_ms").alias("span_ms"),
        F.sum(F.col("cents") * F.col("dur_ms")).alias("_num"),
    )
    q = F.expr("_num div span_ms")
    rem9 = F.expr("((_num - (_num div span_ms) * span_ms) * 10000000) div span_ms")
    return agg.select(
        F.col(key_col).alias("key"),
        "n_obs",
        "span_ms",
        F.when(F.col("span_ms") > 0, (q * F.lit(10_000_000) + rem9).cast("long"))
        .alias("twap9"),
    )
