"""C12 — missing-token discovery + backfill (SURVEY.md §2.2).

Reference: `brontes-core/src/missing_token_info.rs` — during classification,
tokens whose decimals/symbol are absent from the db are fetched on-chain
(`decimals()`/`symbol()` eth_calls) and upserted, so later classification
passes scale amounts correctly.

Batch-native reformulation: with dataset inputs there is no live RPC, so the
loop splits into three relational pieces that compose with classify_traces:

  1. missing_token_report — the QUARANTINE: every token address referenced by
     classified actions that has no token_decimals row, with usage counts —
     exactly the reference's `missing` vector, but as a ranked DataFrame a
     pipeline can export for out-of-band resolution.
  2. fetch_token_metadata — the eth_call boundary. Network access is out of
     scope for the engine (and this container), so it raises
     NotImplementedError with the call spec documented; any resolver
     (an RPC job, a vendor file, a curated dim) can produce the same
     (address, decimals, symbol) shape.
  3. backfill_token_decimals — the UPSERT (on_decimal_query_resolution):
     merge resolved rows into the dim, existing rows winning, so re-running
     classification with the enriched dim re-scales the quarantined tokens.

The C10/C3 default (assume 18 decimals when unknown) remains the in-flight
behavior, matching the reference's to_scaled_rational fallback; backfill
exists so the NEXT pass is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: action-struct fields that carry token addresses, per ACTIONS_SCHEMA
_TOKEN_FIELDS = [
    ("swap", "token_in"),
    ("swap", "token_out"),
    ("transfer", "token"),
    ("liquidation", "debt_asset"),
    ("liquidation", "collateral_asset"),
    ("flash_loan", "assets"),  # array<string>
    ("mint_burn_collect", "tokens"),  # array<string>
]


def referenced_tokens(actions: DataFrame) -> DataFrame:
    """(token, n_refs) over every token-bearing action field.

    One stack of narrow projections + a single hash aggregation — the scan
    prunes to exactly the struct fields listed, so at 100 TB this reads a
    few string columns, never the full action payload."""
    parts = []
    for variant, field in _TOKEN_FIELDS:
        col = F.col(f"{variant}.{field}")
        if field in ("assets", "tokens"):  # the array-typed fields
            parts.append(
                actions.select(F.explode_outer(col).alias("token")).where(
                    F.col("token").isNotNull()
                )
            )
        else:
            parts.append(
                actions.select(col.alias("token")).where(col.isNotNull())
            )
    from functools import reduce

    allrefs = reduce(lambda a, b: a.unionByName(b), parts)
    return allrefs.groupBy("token").agg(F.count(F.lit(1)).alias("n_refs"))


def missing_token_report(actions: DataFrame, token_decimals: DataFrame) -> DataFrame:
    """C12 quarantine list: referenced tokens with no metadata row, most-used
    first (the resolution priority order — a hot token mispriced at the
    18-decimals default distorts more USD accounting than a one-off).

    missing_token_info.rs:25-49 collects the same set per block; here it is
    one anti-join against the dim at whatever grain `actions` covers."""
    dim = F.broadcast(token_decimals.select(F.col("address").alias("token")))
    return (
        referenced_tokens(actions)
        .join(dim, "token", "left_anti")
        .orderBy(F.col("n_refs").desc(), F.col("token").asc())
    )


def fetch_token_metadata(tokens: DataFrame) -> DataFrame:
    """The eth_call boundary (missing_token_info.rs:52-76): resolve each
    address via `decimals()`/`symbol()` (with the bytes32-symbol fallback
    contract shape). Requires chain access, which the batch engine does not
    assume — resolve out-of-band and feed the result to
    backfill_token_decimals; any (address string, decimals int, symbol
    string) DataFrame satisfies the contract."""
    raise NotImplementedError(
        "chain RPC is outside the engine: resolve the quarantine list "
        "out-of-band (eth_call decimals()/symbol() per address) and pass "
        "the resulting (address, decimals, symbol) frame to "
        "backfill_token_decimals"
    )


def backfill_token_decimals(
    token_decimals: DataFrame, resolved: DataFrame
) -> DataFrame:
    """C12 upsert (on_decimal_query_resolution): merge resolved metadata into
    the dim; existing rows win so a backfill can never clobber curated data.

    The dim stays broadcast-sized by construction (tokens are O(10^5-10^6)
    rows at mainnet scale), so downstream classification keeps its
    broadcast-join plan unchanged."""
    existing = token_decimals.select("address").distinct()
    fresh = (
        resolved.dropDuplicates(["address"])
        .join(existing, "address", "left_anti")
        .select(*token_decimals.columns)
    )
    return token_decimals.unionByName(fresh)
