"""Double-entry delta accounting — reference operator A1/A2 (SURVEY.md §2.4):
every action emits ±(address, token, amount) rows which are summed per holder
(`crates/brontes-types/src/normalized_actions/accounting.rs:19-57`; swap
deltas `swaps.rs:106-117`, transfer deltas `transfer.rs:31-40`).

Spark-first shape: instead of per-row imperative emission, each input row is
projected to a literal array of delta structs, exploded, and hash-aggregated —
one narrow shuffle on (party, token), map-side partial aggregation for free.
Amounts are exact decimals (functions/decimals.py policy).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delta_accounting(
    df: DataFrame,
    deltas: Sequence[tuple[Column, Column, Column]],
    party_col: str = "party",
    token_col: str = "token",
    amount_col: str = "amount",
) -> DataFrame:
    """``deltas``: (party, token, signed decimal amount) triples per input row.

    Returns net positions: one row per (party, token) with the exact decimal
    net amount and the number of contributing deltas.
    """
    entries = F.array(
        *[
            F.struct(p.alias("party"), t.alias("token"), a.alias("amount"))
            for (p, t, a) in deltas
        ]
    )
    exploded = df.select(F.explode(entries).alias("d")).select(
        F.col("d.party").alias(party_col),
        F.col("d.token").alias(token_col),
        F.col("d.amount").alias(amount_col),
    )
    return exploded.groupBy(party_col, token_col).agg(
        F.sum(amount_col).alias("net_amount"),
        F.count(F.lit(1)).alias("n_deltas"),
    )
