"""Stateful streaming pool-state tracking — the tip-mode twin of the batch
G4 replay (SURVEY.md §2.9/§3.2; reference `update_known_state`,
brontes-pricing/src/lib.rs:443-577, driven from the tip executor).

Batch mode replays V3 events with one window per pool (pricing/univ3.py —
no state machine needed when the whole range is visible). At the chain tip
the range is unbounded, so state must persist across micro-batches: this is
Structured Streaming's `applyInPandasWithState` — keyed by pool, the state
tuple is exactly the reference's UniswapV3Pool mutable fields
(sqrt_price, liquidity, tick, reserve0, reserve1; uniswap_v3/mod.rs struct),
and each micro-batch folds its events in (block, tx, trace) order with the
same sync_from_log semantics (swap absolute, mint/burn additive with the
STRICT in-range bound of mod.rs:377).

State is O(1) per pool (5 scalars), keys are pools — state store size is
bounded by the pool universe regardless of stream length. Big ints ride as
strings in both state and output (exact; cast to decimal downstream).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "pool string, block_number long, tx_index int, trace_idx int, "
    "kind string, sqrt_price_post string, liquidity_post string, "
    "tick_post int, r0_post string, r1_post string"
)
STATE_SCHEMA = "sqrt_price string, liquidity string, tick int, r0 string, r1 string"


def univ3_state_fold(initial: dict[str, tuple[int, int, int, int, int]]):
    """Build the per-pool fold for `applyInPandasWithState`.

    `initial`: pool → (sqrt_price_x96, liquidity, tick, r0, r1) at stream
    start (the populate_data analog) — a small dict captured in the closure,
    shipped once per task like a broadcast dim.
    """

    def fold(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (pool,) = key
        if state.exists:
            sqrt_s, liq_s, tick, r0_s, r1_s = state.get
            sqrt, liq, r0, r1 = int(sqrt_s), int(liq_s), int(r0_s), int(r1_s)
        else:
            sqrt, liq, tick, r0, r1 = initial.get(pool, (0, 0, 0, 0, 0))

        out: list[dict[str, Any]] = []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["block_number", "tx_index", "trace_idx"]
        )
        for r in rows.itertuples(index=False):
            kind = r.kind
            if kind == "swap":
                # mod.rs:463-479 — absolute payload, additive reserves
                r0 += int(r.amount0)
                r1 += int(r.amount1)
                sqrt = int(r.sqrt_price_x96)
                liq = int(r.liquidity)
                tick = int(r.tick)
            else:
                sign = 1 if kind == "mint" else -1
                r0 += sign * int(r.amount0)
                r1 += sign * int(r.amount1)
                # strict in-range bound (mod.rs:374-384)
                if int(r.tick_lower) < tick < int(r.tick_upper):
                    liq += sign * int(r.amount)
            out.append(
                dict(
                    pool=pool, block_number=int(r.block_number),
                    tx_index=int(r.tx_index), trace_idx=int(r.trace_idx),
                    kind=kind, sqrt_price_post=str(sqrt),
                    liquidity_post=str(liq), tick_post=tick,
                    r0_post=str(r0), r1_post=str(r1),
                )
            )
        state.update((str(sqrt), str(liq), tick, str(r0), str(r1)))
        yield pd.DataFrame(out)

    return fold


def univ3_state_stream(events_stream, initial, checkpoint_dir: str):
    """Wire the fold into a streaming query plan (caller picks the sink).
    `events_stream` must be UNIV3_EVENTS_SCHEMA-shaped with raw-int columns
    castable to string."""
    cast = events_stream.selectExpr(
        "pool", "block_number", "tx_index", "trace_idx", "kind",
        "CAST(amount0 AS STRING) amount0", "CAST(amount1 AS STRING) amount1",
        "CAST(sqrt_price_x96 AS STRING) sqrt_price_x96",
        "CAST(liquidity AS STRING) liquidity", "tick",
        "tick_lower", "tick_upper", "CAST(amount AS STRING) amount",
    )
    return cast.groupBy("pool").applyInPandasWithState(
        univ3_state_fold(initial),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
