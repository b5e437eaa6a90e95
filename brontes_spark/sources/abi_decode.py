"""C2 landing pass — raw calldata → `decoded` struct, via mapInPandas.

The reference decodes calldata JVM-free with alloy's typed ABI codecs inside
each `action_impl!` macro expansion (brontes-macros/src/action_classifier/
calldata.rs; selector routing classifiers/mod.rs:69-200). Here decoding is a
one-time LANDING pass: raw traces flow through an Arrow-batched
`mapInPandas` that fills the `decoded` column; every downstream
classification run is then pure column expressions (classify.py) with no
Python in the hot path.

Decoder backend: `eth_abi` when available, else the pure-python
word-decoder below (static head types + dynamic bytes/string via offsets —
the subset every registered selector needs). Both produce identical output:
the ABI word layout is deterministic.

Scale note: mapInPandas preserves partitioning (no shuffle), batches rows
through Arrow, and the per-row work is a few slices over a bytes object —
this pass is IO-bound at 100 TB, not CPU-bound, and runs once per landed
block range.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

try:  # pragma: no cover - exercised only where eth_abi is installed
    from eth_abi import decode as _eth_abi_decode
except ImportError:
    _eth_abi_decode = None


# ---------------------------------------------------------------------------
# ABI signature registry — selector → (function, [(name, type), ...]).
# The per-protocol set mirrors the reference's classifier registrations.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AbiFunction:
    name: str
    params: tuple[tuple[str, str], ...]  # (param_name, solidity_type)


ABI_REGISTRY: dict[str, AbiFunction] = {
    # ERC20 (classifier fallback path, tree_builder/mod.rs:423-458)
    "0xa9059cbb": AbiFunction("transfer", (("to", "address"), ("amount", "uint256"))),
    "0x23b872dd": AbiFunction(
        "transferFrom",
        (("from", "address"), ("to", "address"), ("amount", "uint256")),
    ),
    # UniswapV2 pair (classifiers/uniswap/uniswap_v2.rs)
    "0x022c0d9f": AbiFunction(
        "swap",
        (
            ("amount0_out", "uint256"),
            ("amount1_out", "uint256"),
            ("recipient", "address"),
            ("data", "bytes"),
        ),
    ),
    # UniswapV3 pool (classifiers/uniswap/uniswap_v3.rs)
    "0x128acb08": AbiFunction(
        "swap",
        (
            ("recipient", "address"),
            ("zero_for_one", "bool"),
            ("amount_specified", "int256"),
            ("sqrt_price_limit_x96", "uint160"),
            ("data", "bytes"),
        ),
    ),
    "0x3c8a7d8d": AbiFunction(
        "mint",
        (
            ("recipient", "address"),
            ("tick_lower", "int24"),
            ("tick_upper", "int24"),
            ("amount", "uint128"),
            ("data", "bytes"),
        ),
    ),
    "0xa34123a7": AbiFunction(
        "burn",
        (("tick_lower", "int24"), ("tick_upper", "int24"), ("amount", "uint128")),
    ),
}


def register_abi(selector: str, name: str, params: list[tuple[str, str]]) -> None:
    """Plug a new selector into the landing decoder (the analog of adding a
    classifier registration)."""
    ABI_REGISTRY[selector.lower()] = AbiFunction(name, tuple(params))


# ---------------------------------------------------------------------------
# Pure-python word decoder (fallback when eth_abi is absent)
# ---------------------------------------------------------------------------


def _head_words(typ: str) -> int:
    """ABI head width in 32-byte words: static fixed-size arrays of static
    elements occupy N inline words; everything else (incl. dynamic types,
    whose head is their offset word) occupies one."""
    if typ.endswith("]") and not typ.endswith("[]"):
        n = int(typ[typ.rindex("[") + 1 : -1])
        return n * _head_words(typ[: typ.rindex("[")])
    return 1


def _decode_word(typ: str, word: bytes, data: bytes, offset_base: int) -> str:
    if typ.endswith("]") and not typ.endswith("[]"):
        # static fixed-size array: N elements inline at the head — `word`
        # passes the FIRST element's word; siblings follow in `data`
        raise ValueError("static arrays are handled by the head loop")
    if typ.endswith("[]"):
        # dynamic array of a static element type: offset → length → items;
        # rendered comma-joined (the decoded params map is string-valued)
        elem = typ[:-2]
        off = int.from_bytes(word, "big")
        ln = int.from_bytes(data[offset_base + off : offset_base + off + 32], "big")
        items = []
        for k in range(ln):
            start = offset_base + off + 32 * (k + 1)
            items.append(_decode_word(elem, data[start : start + 32], data, 0))
        return ",".join(items)
    if typ == "address":
        return "0x" + word[12:].hex()
    if typ == "bool":
        return str(int.from_bytes(word, "big") != 0).lower()
    if typ.startswith("uint"):
        return str(int.from_bytes(word, "big"))
    if typ.startswith("int"):
        # intN is sign-extended to the full 256-bit word in ABI encoding
        full = int.from_bytes(word, "big")
        if full >= 1 << 255:
            full -= 1 << 256
        return str(full)
    if typ in ("bytes", "string"):
        off = int.from_bytes(word, "big")
        ln = int.from_bytes(data[offset_base + off : offset_base + off + 32], "big")
        raw = data[offset_base + off + 32 : offset_base + off + 32 + ln]
        return raw.decode("utf-8", "replace") if typ == "string" else "0x" + raw.hex()
    if typ.startswith("bytes"):  # bytesN static
        n = int(typ[5:])
        return "0x" + word[:n].hex()
    raise ValueError(f"unsupported ABI type {typ}")


def decode_calldata(calldata_hex: str | None) -> tuple[str, dict[str, str]] | None:
    """Decode one calldata blob against the registry. Returns
    (function, params) or None when the selector is unknown / data short."""
    if not calldata_hex or len(calldata_hex) < 10:
        return None
    h = calldata_hex.lower()
    if not h.startswith("0x"):
        h = "0x" + h
    fn = ABI_REGISTRY.get(h[:10])
    if fn is None:
        return None
    try:
        data = bytes.fromhex(h[10:])
    except ValueError:
        return None
    types = [t for _, t in fn.params]
    if _eth_abi_decode is not None:
        try:
            vals = _eth_abi_decode(types, data)
        except Exception:
            vals = None  # e.g. registry lists only the static head params —
            # fall through to the word decoder, which reads heads positionally
        if vals is not None:
            out = {}
            for (name, typ), v in zip(fn.params, vals):
                if isinstance(v, bytes):
                    v = "0x" + v.hex()
                elif isinstance(v, bool):
                    v = str(v).lower()
                out[name] = str(v)
            return fn.name, out
    # fallback: walk the head positionally; static fixed-size arrays occupy
    # N inline words, dynamic types occupy their one offset word
    if len(data) < 32 * sum(_head_words(t) for t in types):
        return None
    out = {}
    try:
        w = 0
        for name, typ in fn.params:
            if typ.endswith("]") and not typ.endswith("[]"):
                elem = typ[: typ.rindex("[")]
                n = int(typ[typ.rindex("[") + 1 : -1])
                vals = []
                for k in range(n):
                    word = data[32 * (w + k) : 32 * (w + k + 1)]
                    vals.append(_decode_word(elem, word, data, 0))
                out[name] = ",".join(vals)
                w += n
            else:
                word = data[32 * w : 32 * (w + 1)]
                out[name] = _decode_word(typ, word, data, 0)
                w += 1
    except (ValueError, IndexError):
        return None
    return fn.name, out


# ---------------------------------------------------------------------------
# The Spark landing pass
# ---------------------------------------------------------------------------

_DECODED_FIELD = StructType(
    [
        StructField("function", StringType()),
        StructField("params", MapType(StringType(), StringType())),
    ]
)


def decode_traces(traces: DataFrame, calldata_col: str = "calldata") -> DataFrame:
    """Fill the `decoded` column from raw hex calldata. Input keeps its
    partitioning; output schema = input schema minus `decoded` plus the
    freshly decoded struct."""
    base_fields = [f for f in traces.schema.fields if f.name != "decoded"]
    out_schema = StructType(base_fields + [StructField("decoded", _DECODED_FIELD)])
    base_names = [f.name for f in base_fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = []
            for cd in pdf[calldata_col]:
                res = decode_calldata(cd)
                decoded.append(
                    None if res is None else {"function": res[0], "params": res[1]}
                )
            out = pdf[base_names].copy()
            out["decoded"] = decoded
            yield out

    return traces.mapInPandas(batches, schema=out_schema)


# ---------------------------------------------------------------------------
# Wider protocol surface (protocol.rs:66-105): selectors DERIVED from the
# human-readable signatures via functions/keccak (not hardcoded), exactly as
# the reference's sol! macro derives them at compile time.
# ---------------------------------------------------------------------------

from ..functions.keccak import selector as _sel  # noqa: E402

# Curve StableSwap family (classifiers/curve/swaps/*): int128-indexed
# exchange on V1/base pools, uint256-indexed on CryptoSwap V2 pools
for _sig, _idx_t in (
    ("exchange(int128,int128,uint256,uint256)", "int128"),
    ("exchange(uint256,uint256,uint256,uint256)", "uint256"),
):
    register_abi(
        _sel(_sig), "exchange",
        [("i", _idx_t), ("j", _idx_t), ("dx", "uint256"), ("min_dy", "uint256")],
    )
register_abi(
    _sel("exchange_underlying(int128,int128,uint256,uint256)"),
    "exchange_underlying",
    [("i", "int128"), ("j", "int128"), ("dx", "uint256"), ("min_dy", "uint256")],
)

# Aave V2/V3 liquidations (classifiers/aave/liquidation.rs)
register_abi(
    _sel("liquidationCall(address,address,address,uint256,bool)"),
    "liquidationCall",
    [
        ("collateral_asset", "address"), ("debt_asset", "address"),
        ("user", "address"), ("debt_to_cover", "uint256"),
        ("receive_a_token", "bool"),
    ],
)

# Compound V2 liquidations (classifiers/compound/*)
register_abi(
    _sel("liquidateBorrow(address,uint256,address)"),
    "liquidateBorrow",
    [
        ("borrower", "address"), ("repay_amount", "uint256"),
        ("c_token_collateral", "address"),
    ],
)

# Maker PSM (classifiers/maker/*): USDC<->DAI at peg
register_abi(_sel("buyGem(address,uint256)"), "buyGem",
             [("usr", "address"), ("gem_amt", "uint256")])
register_abi(_sel("sellGem(address,uint256)"), "sellGem",
             [("usr", "address"), ("gem_amt", "uint256")])

# Balancer V1 (classifiers/balancer/*)
register_abi(
    _sel("swapExactAmountIn(address,uint256,address,uint256,uint256)"),
    "swapExactAmountIn",
    [
        ("token_in", "address"), ("token_amount_in", "uint256"),
        ("token_out", "address"), ("min_amount_out", "uint256"),
        ("max_price", "uint256"),
    ],
)

# Factory discovery (C6, classifiers/*/discovery.rs): every factory entry
# point registers under the normalized name `create_pool` with token0/token1
# (or a comma-joined `tokens` list), so the discovery join (classify.py C6)
# consumes raw-hex factories directly
register_abi(_sel("createPair(address,address)"), "create_pool",
             [("token0", "address"), ("token1", "address")])
register_abi(_sel("createPool(address,address,uint24)"), "create_pool",
             [("token0", "address"), ("token1", "address"), ("fee", "uint24")])
# PancakeSwapV3 pool deployer (classifier-abis/PancakeSwapV3PoolDeployer.json)
register_abi(
    _sel("deploy(address,address,address,uint24,int24)"), "create_pool",
    [("factory", "address"), ("token0", "address"), ("token1", "address"),
     ("fee", "uint24"), ("tick_spacing", "int24")],
)
# Curve factories (classifiers/curve/discovery.rs:33-118; signatures from
# classifier-abis/Curve*Factory*.json). Plain pools carry an inline
# address[4] coin list (zero-padded); metapools carry the new coin + the
# base pool (base-pool coin expansion needs the pool_coins dim — C6 keeps
# the base_pool param for that join)
for _n_extra in (2, 3, 4):
    _tail = ",".join(["uint256"] * _n_extra)
    register_abi(
        _sel(f"deploy_plain_pool(string,string,address[4],{_tail})"),
        "create_pool",
        [("name", "string"), ("symbol", "string"), ("tokens", "address[4]")],
    )
for _n_extra in (2, 3):
    _tail = ",".join(["uint256"] * _n_extra)
    register_abi(
        _sel(f"deploy_metapool(address,string,string,address,{_tail})"),
        "create_pool",
        [("base_pool", "address"), ("name", "string"), ("symbol", "string"),
         ("token0", "address")],
    )
register_abi(
    _sel("deploy_pool(string,string,address[2]," + ",".join(["uint256"] * 11) + ")"),
    "create_pool",
    [("name", "string"), ("symbol", "string"), ("tokens", "address[2]")],
)
register_abi(
    _sel(
        "deploy_pool(string,string,address[3],address,"
        + ",".join(["uint256"] * 10) + ",uint256[2])"
    ),
    "create_pool",
    [("name", "string"), ("symbol", "string"), ("tokens", "address[3]")],
)
# Dodo factories (classifier-abis/dodo/{DVM,DSP}Factory.json)
register_abi(
    _sel("createDODOVendingMachine(address,address,uint256,uint256,uint256,bool)"),
    "create_pool",
    [("token0", "address"), ("token1", "address")],
)
register_abi(
    _sel("createDODOStablePool(address,address,uint256,uint256,uint256,bool)"),
    "create_pool",
    [("token0", "address"), ("token1", "address")],
)

# 1inch AggregationRouterV5 (classifiers/one_inch/*): entry points register
# with EMPTY param lists — the normalized swap comes from the router's
# Swapped/OrderFilled logs, not the (deeply nested) calldata
for _sig in (
    "swap(address,(address,address,address,address,uint256,uint256,uint256),bytes,bytes)",
    "uniswapV3Swap(uint256,uint256,uint256[])",
    "unoswap(address,uint256,uint256,uint256[])",
):
    register_abi(_sel(_sig), "aggregator_swap", [])

# SushiSwapV2/V3 and PancakeSwapV2/V3 share the UniswapV2/V3 pool ABIs
# (classifier-abis/{SushiSwap,PancakeSwap}V{2,3}.json are byte-identical
# interfaces) — the Uniswap selectors above already cover them; routing is by
# the protocol dim (classify.py SWAP_PROTOCOLS).

# Balancer V2 Vault (classifiers/balancer/balancer_v2.rs; signatures from
# classifier-abis/balancer/BalancerV2Vault.json). Log-normalized: the Vault's
# Swap event carries (pool_id, token_in, token_out, amount_in, amount_out).
for _sig in (
    "swap((bytes32,uint8,address,address,uint256,bytes),"
    "(address,bool,address,bool),uint256,uint256)",
    "batchSwap(uint8,(bytes32,uint256,uint256,uint256,bytes)[],address[],"
    "(address,bool,address,bool),int256[],uint256)",
):
    register_abi(_sel(_sig), "vault_swap", [])

# Dodo V2 DPP/DSP/DVM pools (classifiers/dodo/dodo_v2.rs;
# classifier-abis/dodo/DPPPool.json): amounts from the DODOSwap log
register_abi(_sel("sellBase(address)"), "sellBase", [("to", "address")])
register_abi(_sel("sellQuote(address)"), "sellQuote", [("to", "address")])

# Cowswap GPv2Settlement (classifiers/cowswap/mod.rs;
# classifier-abis/cowswap/GPv2Settlement.json): fills normalize from the
# settlement's Trade logs (owner, sell/buy token + amounts)
for _sig in (
    "settle(address[],uint256[],(uint256,uint256,address,uint256,uint256,"
    "uint32,bytes32,uint256,uint256,uint256,bytes)[],(address,uint256,bytes)[][3])",
    "swap((bytes32,uint256,uint256,uint256,bytes)[],address[],(uint256,uint256,"
    "address,uint256,uint256,uint32,bytes32,uint256,uint256,uint256,bytes))",
):
    register_abi(_sel(_sig), "cow_settle", [])

# ClipperExchange (classifiers/clipper/clipper_exchange.rs;
# classifier-abis/ClipperExchange.json): Swapped log carries
# (in_asset, out_asset, recipient, in_amount, out_amount)
for _sig in (
    "swap(address,address,uint256,uint256,uint256,address,"
    "(uint8,bytes32,bytes32),bytes)",
    "sellEthForToken(address,uint256,uint256,uint256,address,"
    "(uint8,bytes32,bytes32),bytes)",
    "sellTokenForEth(address,uint256,uint256,uint256,address,"
    "(uint8,bytes32,bytes32),bytes)",
):
    register_abi(_sel(_sig), "clipper_swap", [])

# Flash loans (classifiers/aave/v2.rs:40-76 + v3.rs, classifiers/maker/
# dss_flash.rs): Aave pool flashLoan/flashLoanSimple + Maker's ERC-3156
# flash mint. Dynamic address[]/uint256[] params decode comma-joined.
register_abi(
    _sel("flashLoan(address,address[],uint256[],uint256[],address,bytes,uint16)"),
    "flashLoan",
    [
        ("receiver", "address"), ("assets", "address[]"),
        ("amounts", "uint256[]"), ("modes", "uint256[]"),
        ("on_behalf_of", "address"), ("params", "bytes"),
        ("referral_code", "uint16"),
    ],
)
register_abi(
    _sel("flashLoanSimple(address,address,uint256,bytes,uint16)"),
    "flashLoanSimple",
    [
        ("receiver", "address"), ("asset", "address"),
        ("amount", "uint256"), ("params", "bytes"),
        ("referral_code", "uint16"),
    ],
)
register_abi(
    _sel("flashLoan(address,address,uint256,bytes)"),
    "flashLoan",
    [
        ("receiver", "address"), ("asset", "address"),
        ("amount", "uint256"), ("data", "bytes"),
    ],
)

# UniswapX ExclusiveDutchOrderReactor (classifiers/uniswap/uniswap_x.rs;
# classifier-abis/UniswapXExclusiveDutchOrderReactor.json): the reference
# reconstructs each fill's swap from the signed order payload + settlement
# transfers (Fill::into_swap); our landing convention surfaces those settled
# fields as data_params on the Fill log, so the entry points register
# log-normalized
for _sig in (
    "execute((bytes,bytes))",
    "executeWithCallback((bytes,bytes),bytes)",
    "executeBatch((bytes,bytes)[])",
    "executeBatchWithCallback((bytes,bytes)[],bytes)",
):
    register_abi(_sel(_sig), "dutch_fill", [])

# 0x TransformERC20 (classifiers/zerox/mod.rs;
# classifier-abis/zero-x/ZeroXTransformERC20Feature.json): the four static
# head params are calldata-decodable; realized output reads the
# TransformedERC20 log (the trailing transformations array is skipped — the
# word decoder reads heads positionally)
register_abi(
    _sel("transformERC20(address,address,uint256,uint256,(uint32,bytes)[])"),
    "transformERC20",
    [
        ("input_token", "address"), ("output_token", "address"),
        ("input_token_amount", "uint256"),
        ("min_output_token_amount", "uint256"),
    ],
)
