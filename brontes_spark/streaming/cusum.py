"""Streaming CUSUM — the online twin of operators/changepoint.cusum.

The batch operator computes S+ / S- via the prefix-sum/running-min closed
form over the complete history; the streaming twin carries exactly the
quantities that closed form needs as per-key state — the two prefix sums
and their running minima, FOUR bigints per key ever seen (fixed-bytes
state, the streaming/dedup posture) — and emits each event's statistics
append-mode as it arrives. No window buffer, no event history: the
closed form IS the online algorithm.

    pp += x - target - allowance ; mpp = min(mpp, pp) ; S+ = pp - mpp
    (mpp seeded at 0 so the empty prefix participates, matching the
    batch operator's least(0, running-min))

Ordering contract (markov/funnel/sessionize posture): in-batch events
sort by (ts, tie) so same-micro-batch reordering is invisible; across
batches the fold is arrival-order — with per-key nondecreasing arrival it
equals the batch operator exactly (the pinned parity case), while a
straggler folds in when it arrives (a live drift monitor cannot
retroactively rewrite an already-emitted alarm). NoTimeout: a drift
statistic never expires; an idle key holds its sums until the next event.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, ts_ns long, cusum_pos long, cusum_neg long, alarm boolean"
)
STATE_SCHEMA = "pp long, pn long, mpp long, mpn long"


def cusum_stream(
    events: DataFrame,
    target: int,
    allowance: int,
    threshold: int,
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    x_col: str = "cents",
    tie_col: str = "event_id",
) -> DataFrame:
    """One appended row per event with its S+/S-/alarm at arrival."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pp, pn, mpp, mpn = state.get if state.exists else (0, 0, 0, 0)
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, tie_col])
            for ts, x in zip(
                pdf[ts_col].astype("int64"), pdf[x_col].astype("int64")
            ):
                pp += int(x) - target - allowance
                pn += target - int(x) - allowance
                mpp = min(mpp, pp)
                mpn = min(mpn, pn)
                sp, sn = pp - mpp, pn - mpn
                out.append(
                    {
                        "user_id": key[0],
                        "ts_ns": int(ts),
                        "cusum_pos": sp,
                        "cusum_neg": sn,
                        "alarm": sp > threshold or sn > threshold,
                    }
                )
        state.update((pp, pn, mpp, mpn))
        yield pd.DataFrame(
            out,
            columns=["user_id", "ts_ns", "cusum_pos", "cusum_neg", "alarm"],
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
