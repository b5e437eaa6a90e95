"""Sequence packing for pretraining batches: concatenate the (sharded)
document token stream and cut it into fixed-length context windows — the
GPT-style pack-and-chunk step between corpus curation and the data loader.

Relational formulation: one cumulative-sum window per shard gives every
document its global token offset; bin/offset/span are then pure integer
column math. No Python, no iteration, exact integers end-to-end (DuckDB twin
is hash-identical).

Scale: the cumsum window partitions by ``shard_col`` — packing is
embarrassingly parallel across shards (real pipelines pack per input shard
anyway so data-loader workers can seek independently). An UNSHARDED call
would funnel the whole corpus through one window task at 100 TB; the
operator therefore requires a shard column rather than defaulting to a
global ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    shard_col: str,
    context_len: int,
) -> DataFrame:
    """Assign each document its place in the packed token stream of its
    shard: (shard, id, n_tokens, start_offset, bin_id, offset_in_bin,
    bins_spanned), ordered deterministically by id within shard. Zero-token
    documents are dropped (they occupy no stream positions).

    ``bins_spanned`` counts the context windows a document's token interval
    [start_offset, start_offset + n_tokens) touches — the loader-side
    boundary-crossing bookkeeping.
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    w = W.partitionBy(shard_col).orderBy(id_col)
    n = F.col(n_tokens_col).cast("long")
    out = (
        df.filter(n > 0)
        .withColumn("_cum", F.sum(n).over(w))
        .withColumn("start_offset", (F.col("_cum") - n))
    )
    # integer `div`, not double division: exact at any stream length (a
    # double round-trip is only exact below 2^53 tokens — true today, but
    # the integer form costs nothing and can't regress)
    start = F.col("start_offset")
    first_bin = F.expr(f"start_offset div {context_len}L")
    last_bin = F.expr(f"(start_offset + _n - 1) div {context_len}L")
    return out.withColumn("_n", n).select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        "start_offset",
        first_bin.alias("bin_id"),
        (start % context_len).alias("offset_in_bin"),
        (last_bin - first_bin + 1).alias("bins_spanned"),
    )
