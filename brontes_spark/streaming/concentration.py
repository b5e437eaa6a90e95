"""Streaming HHI — the online twin of operators/concentration's
Herfindahl-Hirschman index (Gini deliberately has NO streaming twin:
it needs the full ascending rank, i.e. a sort over history, which is
exactly what the streaming-state posture forbids).

HHI is a pure fold: hhi_9 = floor(1e9 * S2 / T^2) with T = sum(x) and
S2 = sum(x^2) — THREE bigints of per-key state (n, T, S2; fixed-bytes
state, the streaming/dedup posture), one row emitted per event with the
running concentration at arrival. The quantized definition matches the
batch operator exactly, so the last emitted row per key equals the
batch result over the same prefix (the pinned parity case).

Precision envelope: S2 rides int64 state — x up to 1e6 (cents) admits
~9e6 events per key before overflow; a corpus-scale batch audit uses
the decimal(38) batch operator, this twin is the live monitor.

Ordering contract (cusum/markov posture): in-batch events sort by
(ts, tie); across batches the fold is arrival-order. NoTimeout: a
concentration monitor never expires an idle key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key long, ts_ns long, n long, total long, hhi_9 long"
STATE_SCHEMA = "n long, total long, s2 long"


def hhi_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    x_col: str = "cents",
    tie_col: str = "event_id",
) -> DataFrame:
    """One appended row per event with the key's running (n, total,
    hhi_9) at arrival; hhi_9 is NULL while total == 0 (the batch
    operator's zero-mass convention)."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, s2 = state.get if state.exists else (0, 0, 0)
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, tie_col])
            for ts, x in zip(
                pdf[ts_col].astype("int64"), pdf[x_col].astype("int64")
            ):
                x = int(x)
                n += 1
                total += x
                s2 += x * x
                out.append(
                    {
                        "key": key[0],
                        "ts_ns": int(ts),
                        "n": n,
                        "total": total,
                        "hhi_9": (10**9 * s2) // (total * total)
                        if total > 0
                        else None,
                    }
                )
        state.update((n, total, s2))
        yield pd.DataFrame(
            out, columns=["key", "ts_ns", "n", "total", "hhi_9"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
