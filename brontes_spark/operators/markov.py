"""First-order Markov transition statistics over per-key ordered sequences.

The sequence-modeling primitive for event streams (user journeys, order
flows, crawl paths): count every observed (from_state -> to_state) step and
derive the empirical transition probability. The reference's inspectors
reason about orderings inside a block (e.g. the sandwich front->victim->back
pattern, crates/brontes-inspect/src/mev_inspectors/sandwich.rs); this is the
corpus-level generalization of that "what follows what" question.

Scale shape (100 TB):
  * ONE shuffle on the sequence key for the lag window; the pair relation
    maps 1:1 onto input rows (no explode, no self-join — the naive
    formulation joins the table to itself on consecutive ranks and shuffles
    twice).
  * transition counting is a hash aggregate with map-side partial combine;
    its output is bounded by |states|^2, independent of corpus size.
  * the probability normalization window runs over that bounded aggregate,
    never over event rows.
  * probabilities are scaled-integer exact: prob9 = floor(1e9 * n / n_from)
    in pure bigint arithmetic, so any engine agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def transition_stats(
    df: DataFrame,
    key_col: str,
    order_cols: list[str | Column],
    state_col: str,
) -> DataFrame:
    """(from_state, to_state, n, n_from, prob9) over per-key ordered steps.

    ``order_cols`` must be a total order within each key (pass a unique
    tiebreaker last — with equal timestamps the lag would otherwise be
    free to pick either neighbor and the counts become run-dependent).
    """
    w = W.partitionBy(key_col).orderBy(*order_cols)
    steps = (
        df.select(
            F.lag(state_col).over(w).alias("from_state"),
            F.col(state_col).alias("to_state"),
        )
        # the first event of each key has no predecessor — not a transition
        .filter(F.col("from_state").isNotNull())
    )
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    counts = counts.withColumn(
        "n_from", F.sum("n").over(W.partitionBy("from_state"))
    )
    return counts.select(
        "from_state",
        "to_state",
        "n",
        "n_from",
        F.expr("(1000000000 * n) div n_from").cast("long").alias("prob9"),
    )
