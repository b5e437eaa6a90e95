"""Streaming McNemar — the online twin of operators/ml_eval.mcnemar_test
(the paired-classifier comparison): a live A/B model monitor that emits,
per scored event, the running discordant cells and chi2 for its key
(model pair / experiment / segment).

The statistic is a pure fold over FOUR bigints of per-key state
(n, both_correct, only_a, only_b; neither derives as n - the rest —
fixed-bytes state, the streaming/dedup posture). The quantized
chi2_9 = floor(1e9 * (b-c)^2 / (b+c)) matches the batch operator
exactly, so the last emitted row per key equals the batch result over
the same prefix (the pinned parity case). NULL predictions count
incorrect, the batch convention.

The per-class confusion/F1 report deliberately has NO streaming twin in
this module's per-key shape: its state is |classes| cells, not a fixed
byte budget per key — the batch operator's single-pass cell aggregate
is the corpus-scale path, and a keyed stream would re-implement it per
trigger. McNemar's 4-integer state is the honest streaming fit.

Ordering contract (cusum/markov posture): in-batch events sort by
(ts, tie); across batches the fold is arrival-order. NoTimeout: an
eval monitor never expires an idle key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key long, ts_ns long, n long, both_correct long, only_a long, "
    "only_b long, neither long, chi2_9 long"
)
STATE_SCHEMA = "n long, both_correct long, only_a long, only_b long"


def mcnemar_stream(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts_ns",
    label_col: str = "y",
    pred_a_col: str = "pa",
    pred_b_col: str = "pb",
    tie_col: str = "event_id",
) -> DataFrame:
    """One appended row per event with the key's running McNemar cells
    and chi2_9 at arrival; chi2_9 is NULL while only_a + only_b == 0
    (no paired disagreement yet — the batch NULL convention)."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, both, oa, ob = state.get if state.exists else (0, 0, 0, 0)
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, tie_col])
            for ts, y, pa, pb in zip(
                pdf[ts_col].astype("int64"),
                pdf[label_col],
                pdf[pred_a_col],
                pdf[pred_b_col],
            ):
                a_ok = pa is not None and not pd.isna(pa) and pa == y
                b_ok = pb is not None and not pd.isna(pb) and pb == y
                n += 1
                if a_ok and b_ok:
                    both += 1
                elif a_ok:
                    oa += 1
                elif b_ok:
                    ob += 1
                disc = oa + ob
                out.append(
                    {
                        "key": key[0],
                        "ts_ns": int(ts),
                        "n": n,
                        "both_correct": both,
                        "only_a": oa,
                        "only_b": ob,
                        "neither": n - both - oa - ob,
                        "chi2_9": (10**9 * (oa - ob) * (oa - ob)) // disc
                        if disc > 0
                        else None,
                    }
                )
        state.update((n, both, oa, ob))
        yield pd.DataFrame(
            out,
            columns=[
                "key", "ts_ns", "n", "both_correct", "only_a", "only_b",
                "neither", "chi2_9",
            ],
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
