"""As-of join — the workhorse behind the reference's price lookups:
`DexQuotes::price_at_or_before` (`crates/brontes-types/src/db/dex.rs:154-170`)
and CEX `get_quote_at` (`db/cex/quotes/cex_quotes.rs:124+`); SURVEY.md §4
item 1.

Spark has no native as-of join. This is the one-shuffle union trick:

  union(left tagged 1, right tagged 0)
  → window last(right_payload) ignore nulls
      over (partition by keys order by time, tag, tiebreak)

Every left row picks up the most recent right payload at-or-before its time.
Scale: a single shuffle on the join keys, no range explosion, no driver-side
loop; skewed keys are handled by AQE. Tie semantics: right rows at the exact
left timestamp ARE visible (tag orders rights first); among equal-time right
rows the greatest tiebreak wins — identical to
  row_number() over (partition by left order by r.time desc, r.tiebreak desc) = 1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    tiebreak: str | None = None,
    payload_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """For each left row: latest right row with right_time <= left_time.

    Returns left columns + right payload columns renamed `{payload_prefix}{col}`.
    ``how='left'`` keeps unmatched left rows with null payload.
    """
    on = list(on)
    r_payload = [c for c in right.columns if c not in on]
    tagged_r = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    tagged_l = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(tagged_r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    order = [F.col("__t"), F.col("__tag")]
    if tiebreak is not None:
        # among right rows with equal time, the greatest tiebreak must win →
        # sort it last so `last()` picks it
        tagged_r = tagged_r.withColumn("__tb", F.col(f"__payload.{tiebreak}"))
        tagged_l = tagged_l.withColumn("__tb", F.lit(None).cast(dict(tagged_r.dtypes)["__tb"]))
        order = [F.col("__t"), F.col("__tag"), F.col("__tb").asc_nulls_last()]
    w = W.partitionBy(*on).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=False)
    matched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__tag") == 1)
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: unknown how={how!r} (use 'inner' or 'left')")
    if how == "inner":
        # test the struct itself, not its first field — a matched right row
        # whose first payload column is legitimately NULL must survive
        matched = matched.filter(F.col("__match").isNotNull())
    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{payload_prefix}{c}") for c in r_payload],
    )
