"""Static schemas for the blockchain-shaped tables (FIXTURES.md), derived
from the reference types cited inline. No schema inference anywhere —
matching the reference's fixed Rust-struct/ClickHouse-DDL schemas
(SURVEY.md §1.3).

Addresses/hashes are lowercase hex strings; amounts decimal(38,18)
(SURVEY.md §1.2 maps malachite Rational → DecimalType with documented
precision loss); event time is integer micro/nanoseconds.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

AMOUNT = DecimalType(38, 18)


def _f(name, dtype, nullable=True):
    return StructField(name, dtype, nullable)


#: normalized action rows — the central wide table; from the Action enum
#: (crates/brontes-types/src/normalized_actions/mod.rs:107-124) with variant
#: structs (swaps.rs:52-66, transfer.rs:21-29, liquidity.rs:23-32,
#: liquidation.rs:24-36)
ACTIONS_SCHEMA = StructType(
    [
        _f("block_number", LongType(), False),
        _f("tx_hash", StringType(), False),
        _f("tx_index", LongType(), False),
        _f("trace_idx", LongType(), False),
        _f("trace_address", ArrayType(IntegerType()), False),
        _f("action_type", StringType(), False),
        _f("protocol", StringType()),
        _f(
            "swap",
            StructType(
                [
                    _f("from", StringType()),
                    _f("recipient", StringType()),
                    _f("pool", StringType()),
                    _f("token_in", StringType()),
                    _f("token_out", StringType()),
                    _f("amount_in", AMOUNT),
                    _f("amount_out", AMOUNT),
                ]
            ),
        ),
        _f(
            "transfer",
            StructType(
                [
                    _f("from", StringType()),
                    _f("to", StringType()),
                    _f("token", StringType()),
                    _f("amount", AMOUNT),
                    _f("fee", AMOUNT),
                ]
            ),
        ),
        _f(
            "mint_burn_collect",
            StructType(
                [
                    _f("from", StringType()),
                    _f("recipient", StringType()),
                    _f("pool", StringType()),
                    _f("tokens", ArrayType(StringType())),
                    _f("amounts", ArrayType(AMOUNT)),
                ]
            ),
        ),
        _f(
            "liquidation",
            StructType(
                [
                    _f("pool", StringType()),
                    _f("liquidator", StringType()),
                    _f("debtor", StringType()),
                    _f("collateral_asset", StringType()),
                    _f("debt_asset", StringType()),
                    _f("covered_debt", AMOUNT),
                    _f("liquidated_collateral", AMOUNT),
                ]
            ),
        ),
        # flashloan.rs:38-44: the loan itself contributes NO deltas — its
        # absorbed children's deltas are re-emitted, which in this flat
        # model means child action rows stay in place and this row is
        # metadata only (from/pool/receiver + borrowed assets/amounts)
        _f(
            "flash_loan",
            StructType(
                [
                    _f("from", StringType()),
                    _f("pool", StringType()),
                    _f("receiver_contract", StringType()),
                    _f("assets", ArrayType(StringType())),
                    _f("amounts", ArrayType(AMOUNT)),
                ]
            ),
        ),
    ]
)

#: per-tx metadata — tree/tx_info.rs:11-29 + GasDetails tree/root.rs:341-347
TX_INFO_SCHEMA = StructType(
    [
        _f("block_number", LongType(), False),
        _f("tx_index", LongType(), False),
        _f("tx_hash", StringType(), False),
        _f("eoa", StringType(), False),
        _f("mev_contract", StringType()),
        _f("gas_used", LongType()),
        _f("effective_gas_price", LongType()),
        _f("priority_fee", LongType()),
        _f("coinbase_transfer", AMOUNT),
        _f("is_private", BooleanType()),
        _f("is_verified_contract", BooleanType()),
    ]
)

#: per-tx-index DEX prices vs the quote asset — db/dex.rs:47-109
DEX_PRICES_SCHEMA = StructType(
    [
        _f("block_number", LongType(), False),
        _f("tx_idx", LongType(), False),
        _f("token", StringType(), False),
        _f("price_usd", AMOUNT, False),  # quote-asset price of 1 token
        _f("pool_liquidity", AMOUNT),
        _f("first_hop_connections", IntegerType()),
    ]
)

#: CEX trade prints — db/cex/trades/cex_trades.rs:175
CEX_TRADES_SCHEMA = StructType(
    [
        _f("exchange", StringType(), False),
        _f("base_token", StringType(), False),
        _f("quote_token", StringType(), False),
        _f("timestamp", LongType(), False),  # µs
        _f("price", AMOUNT, False),
        _f("amount", AMOUNT, False),
    ]
)

#: CEX 1-second quote grid — db/cex/quotes/cex_quotes.rs:49-52
CEX_QUOTES_SCHEMA = StructType(
    [
        _f("exchange", StringType(), False),
        _f("base_token", StringType(), False),
        _f("quote_token", StringType(), False),
        _f("timestamp", LongType(), False),  # µs
        _f("ask_price", AMOUNT, False),
        _f("bid_price", AMOUNT, False),
    ]
)

#: block header/meta — db/metadata.rs:43-54
BLOCK_INFO_SCHEMA = StructType(
    [
        _f("block_number", LongType(), False),
        _f("block_timestamp", LongType(), False),  # seconds
        _f("beneficiary", StringType()),
        _f("eth_price", AMOUNT),
        _f("proposer_fee_recipient", StringType()),
        _f("proposer_mev_reward", AMOUNT),
    ]
)

#: price-graph edges — graphs/all_pair_graph.rs:69, db/address_to_protocol_info.rs:27
POOLS_SCHEMA = StructType(
    [
        _f("pool", StringType(), False),
        _f("protocol", StringType(), False),
        _f("token0", StringType(), False),
        _f("token1", StringType(), False),
        _f("init_block", LongType(), False),
    ]
)

#: searcher dimension — db/searcher.rs:21
SEARCHER_INFO_SCHEMA = StructType(
    [
        _f("address", StringType(), False),
        _f("kind", StringType(), False),  # eoa | contract
        _f("fund", StringType()),
        _f("mev_types", ArrayType(StringType())),
        _f("sibling_searchers", ArrayType(StringType())),
        # historical bundle counts per mev type — searcher/mod.rs SearcherStats,
        # consumed by is_searcher_of_type_with_count_threshold (I7)
        _f("bundle_counts", MapType(StringType(), LongType())),
    ]
)

#: inspector output bundles — mev/bundle/mod.rs:30, mev/bundle/header.rs
BUNDLES_SCHEMA = StructType(
    [
        _f("block_number", LongType(), False),
        _f("tx_hashes", ArrayType(StringType()), False),
        _f("eoa", StringType()),
        _f("mev_contract", StringType()),
        _f("mev_type", StringType(), False),
        _f("profit_usd", AMOUNT, False),
        _f("revenue_usd", AMOUNT, False),
        _f("gas_usd", AMOUNT, False),
    ]
)


RAW_INT = DecimalType(38, 0)

#: UniswapV3 pool event stream — the three log kinds the reference replays
#: (uniswap_v3/mod.rs:169-183): swap rows carry the absolute post-state
#: payload (sqrtPriceX96/liquidity/tick), mint/burn rows the position
#: bounds + liquidity magnitude. Raw uint fields are decimal(38,0)
#: (pricing/univ3.py module docstring documents the <1e38 envelope).
UNIV3_EVENTS_SCHEMA = StructType(
    [
        _f("pool", StringType(), False),
        _f("block_number", LongType(), False),
        _f("tx_index", IntegerType(), False),
        _f("trace_idx", IntegerType(), False),
        _f("kind", StringType(), False),  # swap | mint | burn
        _f("amount0", RAW_INT, False),  # signed delta for swap; magnitude m/b
        _f("amount1", RAW_INT, False),
        _f("sqrt_price_x96", RAW_INT),  # swap payload
        _f("liquidity", RAW_INT),
        _f("tick", IntegerType()),
        _f("tick_lower", IntegerType()),  # mint/burn payload
        _f("tick_upper", IntegerType()),
        _f("amount", RAW_INT),
    ]
)

#: range-start pool state — batch analog of populate_data (mod.rs:214-220)
UNIV3_INITIAL_SCHEMA = StructType(
    [
        _f("pool", StringType(), False),
        _f("sqrt_price_x96", RAW_INT, False),
        _f("liquidity", RAW_INT, False),
        _f("tick", IntegerType(), False),
        _f("r0", RAW_INT, False),
        _f("r1", RAW_INT, False),
    ]
)
