"""S5 config load (SURVEY.md §2.1): the reference hydrates classifier /
searcher / builder / metadata dimensions from TOML at startup
(`config/*.toml`, loaded in brontes-database's config init). Here each file
parses driver-side with stdlib tomllib into the small broadcast-ready
dimension DataFrames the rest of the engine consumes:

  classifier_config.toml  → address_to_protocol + token_decimals + pool_coins
  searcher_config.toml    → searcher_info (eoa/contract kinds, fund, builder)
  builder_config.toml     → builder_info (name, fund, pub_keys, owned searchers)
  metadata_config.toml    → address_metadata (entity, nametag, labels, type)

Addresses normalize to lowercase hex — the engine-wide join-key convention
(schemas.py docstring). Dimensions are driver-side by design: they are
O(contracts) rows (MBs at mainnet scale), the same reason the reference
keeps them in an in-process config (SURVEY §4).
"""

from __future__ import annotations

import tomllib

from pyspark.sql import DataFrame, SparkSession


def _lc(a: str) -> str:
    return a.lower()


def load_classifier_config(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """→ (address_to_protocol, token_decimals, pool_coins). The TOML shape is
    {Protocol: {pool_address: {init_block, token_info: [{address, decimals,
    symbol}]}}}; token_info order defines the coin index used by the
    index-addressed decoders (classify._coin_at)."""
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    a2p, toks, coins = [], {}, []
    for protocol, pools in cfg.items():
        if not isinstance(pools, dict):
            continue
        for pool, info in pools.items():
            a2p.append((_lc(pool), protocol, int(info.get("init_block", 0))))
            for idx, ti in enumerate(info.get("token_info", [])):
                toks[_lc(ti["address"])] = (
                    int(ti["decimals"]), ti.get("symbol", ""),
                )
                coins.append((_lc(pool), idx, _lc(ti["address"])))
            # exchange_underlying index space (classify.UNDERLYING_IDX):
            # metapool base-expanded / lending-pool unwrapped coin list
            for idx, ti in enumerate(info.get("underlying_token_info", [])):
                toks[_lc(ti["address"])] = (
                    int(ti["decimals"]), ti.get("symbol", ""),
                )
                coins.append((_lc(pool), 100 + idx, _lc(ti["address"])))
    return (
        spark.createDataFrame(a2p, "address string, protocol string, init_block long"),
        spark.createDataFrame(
            [(a, d, s) for a, (d, s) in sorted(toks.items())],
            "address string, decimals int, symbol string",
        ),
        spark.createDataFrame(coins, "pool string, idx int, token string"),
    )


def load_searcher_config(spark: SparkSession, path: str) -> DataFrame:
    """→ searcher_info-shaped rows from the [searcher_eoas."0x…"] /
    [searcher_contracts."0x…"] tables (fund + builder attribution)."""
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    rows = []
    for section, kind in (("searcher_eoas", "eoa"), ("searcher_contracts", "contract")):
        for addr, info in cfg.get(section, {}).items():
            rows.append(
                (
                    _lc(addr), kind, info.get("fund"),
                    _lc(info["builder"]) if info.get("builder") else None,
                )
            )
    return spark.createDataFrame(
        rows, "address string, kind string, fund string, builder string"
    )


def load_builder_config(spark: SparkSession, path: str) -> DataFrame:
    """→ builder_info: one row per builder payout address with its name,
    fund, BLS pub keys, and owned searcher addresses."""
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    rows = []
    for addr, info in cfg.get("builders", {}).items():
        rows.append(
            (
                _lc(addr), info.get("name"), info.get("fund"),
                [k.lower() for k in info.get("pub_keys", [])],
                [_lc(a) for a in info.get("searchers_eoas", [])],
                [_lc(a) for a in info.get("searchers_contracts", [])],
            )
        )
    return spark.createDataFrame(
        rows,
        "address string, name string, fund string, pub_keys array<string>, "
        "searchers_eoas array<string>, searchers_contracts array<string>",
    )


def load_metadata_config(spark: SparkSession, path: str) -> DataFrame:
    """→ address_metadata: entity/nametag/labels/type (+ verified flag)."""
    with open(path, "rb") as f:
        cfg = tomllib.load(f)
    rows = []
    for addr, info in cfg.get("metadata", {}).items():
        ci = info.get("contract_info", {}) or {}
        rows.append(
            (
                _lc(addr), info.get("entity_name"), info.get("nametag"),
                list(info.get("labels", [])), info.get("address_type"),
                bool(ci.get("verified_contract", False)),
            )
        )
    return spark.createDataFrame(
        rows,
        "address string, entity_name string, nametag string, "
        "labels array<string>, address_type string, verified_contract boolean",
    )
