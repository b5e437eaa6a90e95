"""Classification: raw call-frame traces → normalized actions (SURVEY.md
§2.2, reference crates/brontes-classifier).

The reference routes each trace through ~150 macro-generated per-protocol
decoders keyed by (protocol-of-target-address, 4-byte selector)
(`brontes-macros/src/action_classifier/*`, registry
`brontes-classifier/src/classifiers/mod.rs:69-200`). Here the dispatch is a
broadcast join against the `address_to_protocol` dimension plus a
selector-keyed registry of COLUMN-EXPRESSION decoders — each decoder is a
pure projection over the pre-decoded param map (FIXTURES.md §2 `decoded`),
so the entire classification pass is one JVM-side select per action family,
no Python in the hot path. (In production the `decoded` column is produced
once at landing time by an eth_abi mapInPandas pass — the C2 slow path —
and every downstream run reuses it.)

Implemented operators:
  C1  protocol dispatch (broadcast join + selector routing)
  C2  swap/mint/burn decoders with token-decimal scaling
  C3  ERC20 transfer fallback with tax-token fee = |log − calldata|
  C4  ETH transfer classification + coinbase-transfer detection
  C6  discovery: CREATE traces → new_pool actions via parent factory frame
  C8  tax-token swap adjustment (swap + fee-bearing transfer → swap_with_fee)
  C10 revert masking (failed roots dropped; errored frames → revert)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AMOUNT = "decimal(38,18)"

TRANSFER_SELECTORS = ["0xa9059cbb", "0x23b872dd"]  # transfer / transferFrom
SWAP_PROTOCOLS = ["UniswapV2", "UniswapV3"]


def _scaled(raw: F.Column, decimals: F.Column) -> F.Column:
    """U256 token units → decimal amount: raw / 10^decimals
    (to_scaled_rational, used at tree_builder/mod.rs:459)."""
    return (
        raw.cast("decimal(38,0)") / F.pow(F.lit(10.0), decimals).cast("decimal(20,0)")
    ).cast(AMOUNT)


def _empty_variant_cols():
    return dict(
        swap=F.lit(None).cast(
            "struct<from:string,recipient:string,pool:string,token_in:string,"
            "token_out:string,amount_in:decimal(38,18),amount_out:decimal(38,18)>"
        ),
        transfer=F.lit(None).cast(
            "struct<from:string,to:string,token:string,amount:decimal(38,18),fee:decimal(38,18)>"
        ),
        mint_burn_collect=F.lit(None).cast(
            "struct<from:string,recipient:string,pool:string,tokens:array<string>,"
            "amounts:array<decimal(38,18)>>"
        ),
        liquidation=F.lit(None).cast(
            "struct<pool:string,liquidator:string,debtor:string,collateral_asset:string,"
            "debt_asset:string,covered_debt:decimal(38,18),liquidated_collateral:decimal(38,18)>"
        ),
    )


def _core(df: DataFrame, action_type, protocol=None):
    cols = _empty_variant_cols()
    return dict(
        block_number=df["block_number"],
        tx_hash=df["tx_hash"],
        tx_index=df["tx_index"],
        trace_idx=df["trace_idx"],
        trace_address=df["trace_address"],
        action_type=action_type,
        protocol=protocol if protocol is not None else F.lit(None).cast("string"),
        **cols,
    )


def _finish(df: DataFrame, cols: dict) -> DataFrame:
    order = [
        "block_number", "tx_hash", "tx_index", "trace_idx", "trace_address",
        "action_type", "protocol", "swap", "transfer", "mint_burn_collect",
        "liquidation",
    ]
    return df.select(*[cols[c].alias(c) for c in order])


def classify_traces(
    traces: DataFrame,
    address_to_protocol: DataFrame,
    token_decimals: DataFrame,
    block_info: DataFrame,
) -> DataFrame:
    """Full classification pass: returns the normalized `actions` frame."""
    # C10: failed root txs are skipped entirely (tree_builder/mod.rs:140-146)
    live = traces.filter(F.col("is_success"))

    # C10: errored frames become Revert actions (tree_builder/mod.rs:330-332)
    reverts = live.filter(F.col("error").isNotNull())
    ok = live.filter(F.col("error").isNull())

    # C1: protocol dispatch via broadcast dim join (get targets' protocol)
    dim = F.broadcast(
        address_to_protocol.select(
            F.col("address").alias("to_address"), F.col("protocol").alias("proto")
        )
    )
    routed = ok.join(dim, "to_address", "left")

    dec = F.broadcast(token_decimals.select("address", "decimals"))

    def tok_decimals(token_col):
        return (
            dec.withColumnRenamed("address", "__t").withColumnRenamed("decimals", "__d"),
            token_col,
        )

    p = F.col("decoded.params")

    # ---- C2: swaps ---------------------------------------------------------
    swaps = routed.filter(
        F.col("proto").isin(SWAP_PROTOCOLS) & (F.col("decoded.function") == "swap")
    )
    din = dec.select(F.col("address").alias("__tin"), F.col("decimals").alias("__din"))
    dout = dec.select(F.col("address").alias("__tout"), F.col("decimals").alias("__dout"))
    swaps = swaps.join(din, p["token_in"] == din["__tin"], "left").join(
        dout, p["token_out"] == dout["__tout"], "left"
    )
    swap_struct = F.struct(
        F.col("msg_sender").alias("from"),
        F.coalesce(p["recipient"], F.col("msg_sender")).alias("recipient"),
        F.col("to_address").alias("pool"),
        p["token_in"].alias("token_in"),
        p["token_out"].alias("token_out"),
        _scaled(p["amount_in"], F.coalesce("__din", F.lit(18))).alias("amount_in"),
        _scaled(p["amount_out"], F.coalesce("__dout", F.lit(18))).alias("amount_out"),
    )
    swap_cols = _core(swaps, F.lit("swap"), F.col("proto"))
    swap_cols["swap"] = swap_struct
    swap_actions = _finish(swaps, swap_cols)

    # ---- C2: mint / burn ---------------------------------------------------
    mb = routed.filter(
        F.col("proto").isin(SWAP_PROTOCOLS) & F.col("decoded.function").isin("mint", "burn")
    )
    d0 = dec.select(F.col("address").alias("__t0a"), F.col("decimals").alias("__d0"))
    d1 = dec.select(F.col("address").alias("__t1a"), F.col("decimals").alias("__d1"))
    mb = mb.join(d0, p["token0"] == d0["__t0a"], "left").join(
        d1, p["token1"] == d1["__t1a"], "left"
    )
    mb_struct = F.struct(
        F.col("msg_sender").alias("from"),
        F.col("msg_sender").alias("recipient"),
        F.col("to_address").alias("pool"),
        F.array(p["token0"], p["token1"]).alias("tokens"),
        F.array(
            _scaled(p["amount0"], F.coalesce("__d0", F.lit(18))),
            _scaled(p["amount1"], F.coalesce("__d1", F.lit(18))),
        ).alias("amounts"),
    )
    mb_cols = _core(mb, F.col("decoded.function"), F.col("proto"))
    mb_cols["mint_burn_collect"] = mb_struct
    mb_actions = _finish(mb, mb_cols)

    # ---- C3: ERC20 transfer fallback (undispatched calls) ------------------
    # tax-token fee = |log amount − calldata amount|, amount = least of both
    # (tree_builder/mod.rs:423-526)
    tr = routed.filter(
        F.col("proto").isNull() & F.col("calldata_selector").isin(TRANSFER_SELECTORS)
    )
    tdec = dec.select(F.col("address").alias("__ta"), F.col("decimals").alias("__td"))
    tr = tr.join(tdec, F.col("to_address") == tdec["__ta"], "left")
    call_amt = _scaled(p["amount"], F.coalesce("__td", F.lit(18)))
    log_amt_raw = F.element_at(F.col("logs"), 1)["data_params"]["value"]
    log_amt = F.when(
        log_amt_raw.isNotNull(), _scaled(log_amt_raw, F.coalesce("__td", F.lit(18)))
    ).otherwise(call_amt)
    tr_struct = F.struct(
        F.coalesce(p["from"], F.col("msg_sender")).alias("from"),
        p["to"].alias("to"),
        F.col("to_address").alias("token"),
        F.least(call_amt, log_amt).alias("amount"),
        F.abs(call_amt - log_amt).cast(AMOUNT).alias("fee"),
    )
    tr_cols = _core(tr, F.lit("transfer"))
    tr_cols["transfer"] = tr_struct
    tr_actions = _finish(tr, tr_cols)

    # ---- C4: ETH transfers + coinbase detection ----------------------------
    eth = routed.filter(
        (F.col("msg_value").cast("decimal(38,0)") > 0)
        & F.col("calldata_selector").isNull()
        & (F.col("action_kind") == "call")
    ).join(
        F.broadcast(block_info.select("block_number", "beneficiary")), "block_number", "left"
    )
    eth_struct = F.struct(
        F.col("from_address").alias("from"),
        F.col("to_address").alias("to"),
        F.lit("0xeth").alias("token"),
        _scaled(F.col("msg_value"), F.lit(18)).alias("amount"),
        F.lit(0).cast(AMOUNT).alias("fee"),
    )
    eth_cols = _core(
        eth,
        F.when(F.col("to_address") == F.col("beneficiary"), "coinbase_transfer").otherwise(
            "eth_transfer"
        ),
    )
    eth_cols["transfer"] = eth_struct
    eth_actions = _finish(eth, eth_cols)

    # ---- C6: discovery (CREATE → new_pool via parent factory frame) --------
    creates = ok.filter(F.col("action_kind") == "create").select(
        "block_number", "tx_hash", "tx_index", "trace_idx", "trace_address",
        F.col("to_address").alias("created_addr"),
    )
    parents = ok.select(
        F.col("tx_hash").alias("p_tx"),
        F.col("trace_address").alias("p_path"),
        F.col("decoded").alias("p_decoded"),
    )
    disc = creates.join(
        parents,
        (creates["tx_hash"] == parents["p_tx"])
        & (
            F.col("p_path")
            == F.slice(
                creates["trace_address"], 1,
                F.greatest(F.size(creates["trace_address"]) - 1, F.lit(0)),
            )
        ),
    ).filter(F.col("p_decoded.function") == "create_pool")
    disc_cols = _core(disc, F.lit("new_pool"), F.col("p_decoded.params")["protocol"])
    disc_cols["mint_burn_collect"] = F.struct(
        F.lit(None).cast("string").alias("from"),
        F.lit(None).cast("string").alias("recipient"),
        F.col("created_addr").alias("pool"),
        F.array(
            F.col("p_decoded.params")["token0"], F.col("p_decoded.params")["token1"]
        ).alias("tokens"),
        F.array().cast("array<decimal(38,18)>").alias("amounts"),
    )
    disc_actions = _finish(disc, disc_cols)

    # ---- C10: revert rows --------------------------------------------------
    rev_cols = _core(reverts, F.lit("revert"))
    rev_actions = _finish(reverts, rev_cols)

    actions = (
        swap_actions.unionByName(mb_actions)
        .unionByName(tr_actions)
        .unionByName(eth_actions)
        .unionByName(disc_actions)
        .unionByName(rev_actions)
    )
    return account_for_tax_tokens(actions)


def account_for_tax_tokens(actions: DataFrame) -> DataFrame:
    """C8 (tree_builder/tree_pruning.rs:13-120): when a tx holds a swap and
    a fee-bearing transfer of the swap's input token, shrink amount_in by
    the fee and retag as swap_with_fee."""
    fees = (
        actions.filter((F.col("action_type") == "transfer") & (F.col("transfer.fee") > 0))
        .groupBy(
            F.col("tx_hash").alias("fee_tx"), F.col("transfer.token").alias("fee_token")
        )
        .agg(F.sum("transfer.fee").alias("total_fee"))
    )
    joined = actions.join(
        fees,
        (F.col("tx_hash") == F.col("fee_tx"))
        & (F.col("action_type") == "swap")
        & (F.col("swap.token_in") == F.col("fee_token")),
        "left",
    ).drop("fee_tx")
    adjusted_swap = F.struct(
        F.col("swap.from").alias("from"),
        F.col("swap.recipient").alias("recipient"),
        F.col("swap.pool").alias("pool"),
        F.col("swap.token_in").alias("token_in"),
        F.col("swap.token_out").alias("token_out"),
        (F.col("swap.amount_in") - F.col("total_fee")).cast(AMOUNT).alias("amount_in"),
        F.col("swap.amount_out").alias("amount_out"),
    )
    return joined.withColumn(
        "swap",
        F.when(F.col("total_fee").isNotNull() & (F.col("action_type") == "swap"), adjusted_swap)
        .otherwise(F.col("swap")),
    ).withColumn(
        "action_type",
        F.when(
            F.col("total_fee").isNotNull() & (F.col("action_type") == "swap"),
            F.lit("swap_with_fee"),
        ).otherwise(F.col("action_type")),
    ).drop("fee_token", "total_fee")
