"""Streaming lag-1 autocorrelation — the online twin of ols.autocorr.

The batch operator's five sums are an order-insensitive algebra over the
lag PAIRS; the pairs themselves are order-sensitive (each event pairs
with its predecessor). So the per-key state is exactly seven scalars:
the six correlation sums (n, sx, sy, sxy, sxx, syy) plus the previous
value — fixed bytes per key, no history (the CUSUM-twin posture: the
batch closed form dictates the online state).

Each arriving event (after a key's first) folds one pair into the sums
and emits the running corr9 through the same correctly-rounded double
chain the batch operator ends with — so on per-key nondecreasing arrival
the LAST emitted row per key equals the batch autocorr exactly (the
pinned parity case). In-batch rows sort by (ts, tie); a cross-batch
straggler folds in arrival order (the one-sided online contract shared
by the markov/funnel/cusum twins). NoTimeout: correlation state never
expires.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, ts_ns long, n_pairs long, corr9 long"
STATE_SCHEMA = (
    "n long, sx long, sy long, sxy long, sxx long, syy long, "
    "prev long, has_prev boolean"
)


def _corr9(n, sx, sy, sxy, sxx, syy):
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 <= 0 or d2 <= 0:
        return None
    # int -> float conversions, *, sqrt, / — all correctly rounded; the
    # identical chain the batch operator (and its DuckDB twin) runs
    return math.floor(
        1e9 * float(n * sxy - sx * sy) / math.sqrt(float(d1) * float(d2))
    )


def autocorr_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    x_col: str = "cents",
    tie_col: str = "event_id",
) -> DataFrame:
    """One appended row per event after the key's first: the running
    lag-1 correlation over all pairs observed so far."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, sx, sy, sxy, sxx, syy, prev, has_prev = (
            state.get if state.exists else (0, 0, 0, 0, 0, 0, 0, False)
        )
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, tie_col])
            for ts, x in zip(
                pdf[ts_col].astype("int64"), pdf[x_col].astype("int64")
            ):
                x = int(x)
                if has_prev:
                    n += 1
                    sx += prev
                    sy += x
                    sxy += prev * x
                    sxx += prev * prev
                    syy += x * x
                    out.append(
                        {
                            "user_id": key[0],
                            "ts_ns": int(ts),
                            "n_pairs": n,
                            "corr9": _corr9(n, sx, sy, sxy, sxx, syy),
                        }
                    )
                prev, has_prev = x, True
        state.update((n, sx, sy, sxy, sxx, syy, prev, has_prev))
        yield pd.DataFrame(
            out, columns=["user_id", "ts_ns", "n_pairs", "corr9"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
