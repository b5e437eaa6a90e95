"""Driver-gated CEX quote-routing queries (X2/X3, SURVEY.md §2.5) over
literal planted quote/rank/fee dims — closed-form, so the DuckDB oracle is
the golden VALUES relation (same strategy as the MEV fixture gates)."""

from __future__ import annotations

from decimal import Decimal as D

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.decimals import to_dbl
from .registry import register

_A, _USD = "0xtoka", "0xusd"
_TS = 1_700_000_000 * 1_000_000  # µs


def _quote_tables(spark: SparkSession):
    from .. import schemas as S

    quotes = spark.createDataFrame(
        [
            # okx (rank 1): fresh for t1, STALE (-2s) for t2
            ("okx", _A, _USD, _TS - 200_000, D("1.10"), D("1.08")),
            ("okx", _A, _USD, _TS + 800_000, D("1.20"), D("1.18")),
            # binance (rank 2): fresh for both targets
            ("binance", _A, _USD, _TS - 100_000, D("1.06"), D("1.04")),
            ("binance", _A, _USD, _TS + 2_300_000, D("1.07"), D("1.05")),
        ],
        S.CEX_QUOTES_SCHEMA,
    )
    rank = spark.createDataFrame(
        [(_A, _USD, "okx", 1), (_A, _USD, "binance", 2)],
        "base_token string, quote_token string, exchange string, rank int",
    )
    targets = spark.createDataFrame(
        [
            ("t1", _A, _USD, _TS),              # okx -0.2s fresh → rank 1 wins
            ("t2", _A, _USD, _TS + 3_000_000),  # okx -2.2s stale → binance -0.7s
        ],
        "target_id string, base_token string, quote_token string, ts long",
    )
    return quotes, rank, targets


@register(
    "x2_most_liquid_quote",
    oracle="""
    SELECT target_id, CAST(rnk AS INTEGER) AS rank,
           CAST(ask AS DOUBLE) AS ask_price, CAST(bid AS DOUBLE) AS bid_price
    FROM (VALUES
      ('t1', 1, 1.10, 1.08),
      ('t2', 2, 1.07, 1.05)
    ) AS t(target_id, rnk, ask, bid)
    """,
    survey_ref="X2 most-liquid-exchange quote (cex_quotes.rs:103-123): "
    "exchanges tried in monthly-volume rank order, first FRESH quote wins — "
    "the rank-1 exchange's stale quote must fall through to rank 2",
)
def x2_most_liquid_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cex_quotes import most_liquid_quote

    quotes, rank, targets = _quote_tables(spark)
    out = most_liquid_quote(targets, quotes, rank, max_time_diff_us=1_000_000)
    return out.select(
        "target_id",
        F.col("rank").cast("int").alias("rank"),
        to_dbl("ask_price").alias("ask_price"),
        to_dbl("bid_price").alias("bid_price"),
    )


@register(
    "x3_fee_adjusted_quote",
    oracle="""
    SELECT target_id,
           CAST(mid AS DOUBLE) AS mid_price,
           CAST(maker AS DOUBLE) AS price_maker,
           CAST(taker AS DOUBLE) AS price_taker
    FROM (VALUES
      ('t1', 1.05, 1.049895, 1.04895),
      ('t2', 1.06, 1.059894, 1.05894)
    ) AS t(target_id, mid, maker, taker)
    """,
    survey_ref="X3 fee-adjusted quote (cex_quotes.rs:684-695 + per-exchange "
    "fee table in db/cex/exchanges.rs): maker 1bp / taker 10bp applied to "
    "the X1 as-of binance mids (1.06+1.04)/2 and (1.07+1.05)/2 — exact "
    "decimal products",
)
def x3_fee_adjusted_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cex_quotes import fee_adjusted, quote_at

    quotes, _rank, targets = _quote_tables(spark)
    quoted = quote_at(
        targets.withColumn("ts", F.col("ts") + F.lit(1_000_000)),
        quotes, "binance", max_time_diff_us=4_000_000,
    ).withColumn("exchange", F.lit("binance"))
    fees = spark.createDataFrame(
        [("binance", D("0.0001"), D("0.001"))],
        "exchange string, maker_fee decimal(18,9), taker_fee decimal(18,9)",
    )
    out = fee_adjusted(quoted.withColumn("mid_price", F.col("mid_price").cast("decimal(38,18)")), fees)
    return out.select(
        "target_id",
        to_dbl("mid_price").alias("mid_price"),
        to_dbl("price_maker").alias("price_maker"),
        to_dbl("price_taker").alias("price_taker"),
    )
