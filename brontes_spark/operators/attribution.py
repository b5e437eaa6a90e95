"""Multi-touch attribution over an event stream.

Marketing/conversion analytics' core join: for every conversion, find the
touch events of the same key inside a lookback horizon and split credit
across them — linear (equal split, exact rational), plus first/last-touch
flags so the single-touch models fall out of the same relation (last-touch
alone is X1's as-of join; this operator is its many-to-many elder).

Composition, not a new join: the (conversion, touch) pair stream is the
bucket-banded interval join (operators/range_join.interval_overlap_join)
with conversions widened to [ts − horizon, ts] and touches as unit
intervals — so the pair generation inherits the equi-join scale shape
(explode to covered buckets, hash join, exactly-once predicate; never a
nested-loop inequality join). Credit normalization is ONE window over the
pair stream keyed by conversion: credit9 = floor(1e9 / n_touch) in pure
integer arithmetic; first/last flags compare against min/max touch time
in the same window pass (three frame-free aggregates share one window
spec, one exchange).

Skew note: a bot key with 10⁶ touches inside one horizon makes every
conversion of that key a 10⁶-row fan-out — that is the OUTPUT, not an
intermediate (the join is output-bound, like the salted-join family); cap
with a per-conversion touch limit upstream when the product, not the
analysis, is the concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .range_join import interval_overlap_join


def linear_attribution(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    touch_type: str,
    conv_type: str,
    horizon_ns: int,
) -> DataFrame:
    """(key, conv_id, touch_id, gap_ns, n_touch, credit9, is_first,
    is_last) — one row per attributed (conversion, touch) pair; touches at
    or before the conversion, within `horizon_ns` (inclusive bounds).
    Conversions with zero in-horizon touches emit nothing (inner
    semantics; count them upstream with an anti-join if needed)."""
    if horizon_ns < 0:
        raise ValueError(f"horizon_ns must be >= 0, got {horizon_ns}")
    conv = events.filter(F.col(type_col) == conv_type).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("conv_id"),
        F.col(ts_col).alias("conv_ts"),
        (F.col(ts_col) - F.lit(horizon_ns)).alias("_c_lo"),
        (F.col(ts_col) + 1).alias("_c_hi"),
    )
    touch = events.filter(F.col(type_col) == touch_type).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
        (F.col(ts_col) + 1).alias("_t_hi"),
    )
    pairs = interval_overlap_join(
        conv,
        touch,
        "_c_lo",
        "_c_hi",
        "touch_ts",
        "_t_hi",
        on=["key"],
    )
    w = W.partitionBy("conv_id")
    return pairs.select(
        "key",
        "conv_id",
        "touch_id",
        (F.col("conv_ts") - F.col("touch_ts")).alias("gap_ns"),
        F.count(F.lit(1)).over(w).alias("n_touch"),
        F.col("touch_ts").alias("_tts"),
        F.min("touch_ts").over(w).alias("_first_ts"),
        F.max("touch_ts").over(w).alias("_last_ts"),
    ).select(
        "key",
        "conv_id",
        "touch_id",
        "gap_ns",
        "n_touch",
        F.expr("CAST(1000000000 div n_touch AS BIGINT)").alias("credit9"),
        (F.col("_tts") == F.col("_first_ts")).alias("is_first"),
        (F.col("_tts") == F.col("_last_ts")).alias("is_last"),
    )
