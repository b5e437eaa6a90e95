"""Driver-gated UniswapV3 pool-state queries (G4 concentrated-liquidity
half, SURVEY.md §2.6 — uniswap_v3/mod.rs:160-493).

The fixture stream (sources/fixtures.univ3_events_rows) plants every
sync_from_log branch; the replay outputs are closed-form, so the DuckDB
oracle is the literal golden VALUES relation — a hash match means the
swap-segment windows, in-range strict-bound liquidity cumsum, reserve
accounting, and pre-state lags all computed exactly the planted numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pricing.univ3 import univ3_pool_state, univ3_tick_liquidity
from ..sources.fixtures import load_fixtures
from .registry import register

_SQRT_T0 = "79228162514264337593543950336"
_SQRT_M30 = "79109415290437042302807587396"
_SQRT_M75 = "78931628080856889801321786087"
_SQRT_P15 = "79287602951555555546117890672"


def _state_values() -> str:
    # (pool, bn, tx, kind, r0_post, r1_post, liq_pre, liq_post,
    #  tick_pre, tick_post, sqrt_post)
    rows = [
        ("'0xv3pool1'", 200, 0, "'mint'", "1100000000000000000", "1100000000000000000",
         "1000000", "1500000", 0, 0, _SQRT_T0),
        ("'0xv3pool1'", 200, 1, "'mint'", "1300000000000000000", "1100000000000000000",
         "1500000", "1500000", 0, 0, _SQRT_T0),
        ("'0xv3pool1'", 200, 2, "'swap'", "1400000000000000000", "1010000000000000000",
         "1500000", "1500000", 0, -30, _SQRT_M30),
        ("'0xv3pool1'", 201, 0, "'mint'", "1450000000000000000", "1060000000000000000",
         "1500000", "1700000", -30, -30, _SQRT_M30),
        ("'0xv3pool1'", 201, 1, "'swap'", "1650000000000000000", "910000000000000000",
         "1700000", "800000", -30, -75, _SQRT_M75),
        ("'0xv3pool1'", 202, 0, "'burn'", "1570000000000000000", "830000000000000000",
         "800000", "300000", -75, -75, _SQRT_M75),
        ("'0xv3pool1'", 202, 1, "'burn'", "1370000000000000000", "830000000000000000",
         "300000", "300000", -75, -75, _SQRT_M75),
        ("'0xv3pool2'", 200, 0, "'mint'", "600000000000000000", "500000000000000000",
         "50000", "50000", -30, -30, _SQRT_M30),
        ("'0xv3pool2'", 200, 1, "'mint'", "620000000000000000", "520000000000000000",
         "50000", "50000", -30, -30, _SQRT_M30),
        ("'0xv3pool2'", 201, 0, "'swap'", "570000000000000000", "580000000000000000",
         "50000", "140000", -30, 15, _SQRT_P15),
        ("'0xv3pool2'", 202, 0, "'burn'", "540000000000000000", "570000000000000000",
         "140000", "40000", 15, 15, _SQRT_P15),
    ]
    # U256-scale cells ride as exact STRINGS on both sides: they exceed
    # 2^53, and the driver's canonicalizer renders decimals through pandas
    # where engine representations diverge (float64 vs Decimal objects)
    values = ",\n      ".join(
        f"({p}, {bn}, {tx}, {k}, '{r0}', '{r1}', "
        f"'{lpre}', '{lpost}', {tpre}, {tpost}, '{sq}')"
        for (p, bn, tx, k, r0, r1, lpre, lpost, tpre, tpost, sq) in rows
    )
    return f"""
    SELECT pool, CAST(bn AS BIGINT) AS block_number,
           CAST(tx AS INTEGER) AS tx_index, kind,
           r0_post, r1_post, liquidity_pre, liquidity_post,
           CAST(tick_pre AS INTEGER) AS tick_pre,
           CAST(tick_post AS INTEGER) AS tick_post, sqrt_price_post
    FROM (VALUES
      {values}
    ) AS t(pool, bn, tx, kind, r0_post, r1_post, liquidity_pre,
           liquidity_post, tick_pre, tick_post, sqrt_price_post)
    """


@register(
    "g4_univ3_state",
    oracle=_state_values(),
    survey_ref="G4 UniswapV3 event-sourced pool state "
    "(uniswap_v3/mod.rs:160-493) as one cumulative window per pool; "
    "strict in-range bounds per mod.rs:377",
)
def g4_univ3_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_fixtures(spark)
    s = lambda c: F.col(c).cast("string").alias(c)  # noqa: E731
    return univ3_pool_state(t["univ3_events"], t["univ3_initial"]).select(
        "pool", "block_number", "tx_index", "kind", s("r0_post"), s("r1_post"),
        s("liquidity_pre"), s("liquidity_post"), "tick_pre", "tick_post",
        s("sqrt_price_post"),
    )


def _tick_values() -> str:
    rows = [
        ("'0xv3pool1'", -60, "200000"),
        ("'0xv3pool1'", 0, "-200000"),
        ("'0xv3pool2'", -30, "40000"),
        ("'0xv3pool2'", 30, "-40000"),
    ]
    values = ",\n      ".join(f"({p}, {t}, '{n}')" for (p, t, n) in rows)
    return f"""
    SELECT pool, CAST(tick AS INTEGER) AS tick, liquidity_net
    FROM (VALUES
      {values}
    ) AS t(pool, tick, liquidity_net)
    """


@register(
    "g4_univ3_tick_liquidity",
    oracle=_tick_values(),
    survey_ref="G4 per-tick net-liquidity table "
    "(update_position/update_tick, uniswap_v3/mod.rs:387-461); "
    "fully-cancelled ticks drop out (flip_tick removal)",
)
def g4_univ3_tick_liquidity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_fixtures(spark)
    return univ3_tick_liquidity(t["univ3_events"]).select(
        "pool", "tick", F.col("liquidity_net").cast("string").alias("liquidity_net")
    )


def _g5_values() -> str:
    # token A prices through P3(A→B)·P4(B→USD); token B through P4 alone.
    # path_tick = Σ hop tick as-of (block, tx) — hand-walked from the
    # fixture event timeline (P3: 0,0,-30,-30,-75,-75,-75 / P4: -30 until
    # the (201,0) swap to 15).
    rows = [
        ("'0xtoka'", 200, 0, -30), ("'0xtoka'", 200, 1, -30),
        ("'0xtoka'", 200, 2, -60), ("'0xtoka'", 201, 0, -15),
        ("'0xtoka'", 201, 1, -60), ("'0xtoka'", 202, 0, -60),
        ("'0xtoka'", 202, 1, -60),
        ("'0xtokb'", 200, 0, -30), ("'0xtokb'", 200, 1, -30),
        ("'0xtokb'", 200, 2, -30), ("'0xtokb'", 201, 0, 15),
        ("'0xtokb'", 201, 1, 15), ("'0xtokb'", 202, 0, 15),
        ("'0xtokb'", 202, 1, 15),
    ]
    values = ",\n      ".join(f"({t}, {bn}, {tx}, {pt})" for (t, bn, tx, pt) in rows)
    return f"""
    SELECT token, CAST(bn AS BIGINT) AS block_number,
           CAST(tx AS INTEGER) AS tx_index, CAST(pt AS BIGINT) AS path_tick
    FROM (VALUES
      {values}
    ) AS t(token, bn, tx, pt)
    """


@register(
    "g5_path_ticks",
    oracle=_g5_values(),
    survey_ref="G5 full per-tx price emission (lib.rs:297-358 DexQuotes): "
    "G4 V3 state forward-filled as-of every grid tx, composed along the "
    "verified pricing path as an exact tick sum (price = 1.0001^path_tick)",
)
def g5_path_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pricing.dex import per_tx_path_ticks

    t = load_fixtures(spark)
    state = univ3_pool_state(t["univ3_events"], t["univ3_initial"]).select(
        "pool", "block_number", "tx_index", "tick_post"
    )
    paths = spark.createDataFrame(
        [("0xtoka", 0, "0xv3pool1", 1), ("0xtoka", 1, "0xv3pool2", 1),
         ("0xtokb", 0, "0xv3pool2", 1)],
        "token string, hop_idx int, pool string, sign int",
    )
    grid = t["univ3_events"].select("block_number", "tx_index").distinct()
    return per_tx_path_ticks(state, paths, grid)


def _quote_values() -> str:
    # Golden outputs of the exact-integer tick-crossing walker run over the
    # fixture pools' END-OF-RANGE state (replayed by univ3_pool_state) and
    # tick tables; cross-checked by the AMM-invariant property tests in
    # tests/test_univ3_swap.py (output monotonicity, fee accounting,
    # boundary clamping). Cases cover: in-range partial step (no cross),
    # two upward crossings with net-liquidity application, a deep
    # out-of-table walk, and (pool2) swaps that exhaust the only position:
    # with zero liquidity beyond, the price slides through the empty range
    # to the MIN/MAX tick with no further output — Uniswap's unlimited
    # exact-input behavior (amounts unchanged vs stopping at the boundary).
    rows = [
        ("'0xv3pool1'", "'10000'", "true", "'9578'", "'30'", -727, 0),
        ("'0xv3pool1'", "'10000'", "false", "'9752'", "'31'", 542, 2),
        ("'0xv3pool1'", "'2000000'", "true", "'259663'", "'6000'", -40698, 0),
        ("'0xv3pool2'", "'5000'", "true", "'89'", "'1'", -887272, 1),
        ("'0xv3pool2'", "'300000'", "false", "'29'", "'1'", 887272, 1),
    ]
    values = ",\n      ".join(
        f"({p}, {ain}, {zfo}, {aout}, {fee}, {tick}, {crossed})"
        for (p, ain, zfo, aout, fee, tick, crossed) in rows
    )
    return f"""
    SELECT pool, amount_in, CAST(zfo AS BOOLEAN) AS zero_for_one,
           amount_out, fee_paid, CAST(tick_after AS INTEGER) AS tick_after,
           CAST(crossed AS INTEGER) AS ticks_crossed
    FROM (VALUES
      {values}
    ) AS t(pool, amount_in, zfo, amount_out, fee_paid, tick_after, crossed)
    """


@register(
    "g4_univ3_swap_quotes",
    oracle=_quote_values(),
    survey_ref="G4 tick-crossing swap simulation (uniswap_v3_math walker; "
    "pricing/univ3_swap.py): exact-integer exact-in quotes over the "
    "replayed pool state + tick tables, cogrouped applyInPandas on the "
    "pool key (univ3_quote_batch) — no driver-side state collect",
)
def g4_univ3_swap_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..pricing.univ3_swap import univ3_quote_batch

    t = load_fixtures(spark)
    state = univ3_pool_state(t["univ3_events"], t["univ3_initial"])
    w = W.partitionBy("pool").orderBy(
        F.col("block_number").desc(), F.col("tx_index").desc(),
        F.col("trace_idx").desc(),
    )
    final = (
        state.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "pool",
            F.col("sqrt_price_post").alias("sqrt_price"),
            F.col("liquidity_post").alias("liquidity"),
            F.col("tick_post").alias("tick"),
        )
    )
    ticks = univ3_tick_liquidity(t["univ3_events"])
    requests = spark.createDataFrame(
        [
            ("0xv3pool1", 10_000, True), ("0xv3pool1", 10_000, False),
            ("0xv3pool1", 2_000_000, True),
            ("0xv3pool2", 5_000, True), ("0xv3pool2", 300_000, False),
        ],
        "pool string, amount_in long, zero_for_one boolean",
    ).select("pool", F.col("amount_in").cast("decimal(38,0)").alias("amount_in"), "zero_for_one")
    out = univ3_quote_batch(requests, final, ticks, fee_pips=3000)
    return out.select(
        "pool",
        F.col("amount_in").cast("string").alias("amount_in"),
        "zero_for_one",
        F.col("amount_out").cast("string").alias("amount_out"),
        F.col("fee_paid").cast("string").alias("fee_paid"),
        "tick_after",
        "ticks_crossed",
    )
