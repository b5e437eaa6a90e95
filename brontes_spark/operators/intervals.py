"""Subtree / prefix-interval operators — the Spark re-expression of the
reference's per-tx call-tree queries (SURVEY.md §4 item 3):

  * subtree_bounds   — each trace node's preorder interval [trace_idx,
                       subtree_end]; after this, every tree query is an
                       interval predicate (no recursive structures)
  * collect_spans    — T2 (tree/mod.rs:172-200): subtree roots whose
                       descendants contain all/any required action types
  * absorb_children  — C7 multi-call-frame classification
                       (normalized_actions/multi_callframe.rs:6-42,
                       tree/mod.rs:269-279): composite parents absorb their
                       subtree's matching child actions; absorbed children
                       are pruned from the top level

Scale notes: everything is per-tx local — one shuffle on tx_hash, then
joins/windows whose cardinality is bounded by per-tx trace counts (~10²-10³),
independent of chain length. The prefix self-join is quadratic only within a
tx, never across txs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_prefix(prefix: Column, path: Column) -> Column:
    return (F.size(prefix) <= F.size(path)) & (
        F.slice(path, 1, F.greatest(F.size(prefix), F.lit(1))) == prefix
    ) | (F.size(prefix) == 0)


def subtree_bounds(
    df: DataFrame,
    tx_col: str = "tx_hash",
    idx_col: str = "trace_idx",
    path_col: str = "trace_address",
    method: str = "window",
    max_depth: int = 32,
    validate: bool = True,
) -> DataFrame:
    """Adds `subtree_end` = max trace_idx within the node's subtree —
    the interval the reference maintains implicitly via its Node tree
    (tree/node.rs:12-20).

    method="window" (default): trace_idx is the PREORDER position of the
    frame within its tx (EVM traces are emitted depth-first), so a node's
    descendants are CONTIGUOUS and subtree_end = (first following index
    whose depth <= own depth) - 1, else the tx's max index. "Next at-or-
    shallower index" is computed as one conditional running-min window
    expression per depth level 0..max_depth — O(n * max_depth) work on a
    single tx-shuffle, replacing the per-tx QUADRATIC prefix self-join
    (SCALE.md §limits closed in round 6). max_depth bounds the supported
    call depth (practical EVM traces stay far below 32; deeper frames
    raise rather than mis-bound).

    method="join": the original prefix self-join — kept for inputs whose
    idx is NOT preorder-consistent with the path column (no contiguity
    assumption; quadratic within a tx). The two methods also differ on
    MALFORMED input with several depth-0 rows per tx (duplicate empty
    paths): the join's empty-prefix rule spans them all, the window method
    bounds each at its next depth-0 sibling — well-formed traces have one
    root, so the divergence only exists off-contract.

    validate (window method only, default True): enforces the preorder
    contract instead of silently mis-bounding non-preorder input (ADVICE
    r6): a DFS preorder emission satisfies, for every consecutive idx pair
    within a tx, depth(cur) <= depth(prev)+1 AND cur's parent path is a
    prefix of prev's path (the classic DFS stack invariant; a depth-0 row
    starts a new tree). Checked with one lag() on the same (tx, idx)
    window ordering the bounds already use — O(n), same stage, no extra
    shuffle — and raises on the first violating row. Pass validate=False
    for trusted inputs or method="join" for non-preorder ones.
    """
    if method == "join":
        nodes = df.select(
            F.col(tx_col).alias("__tx"), F.col(idx_col).alias("__idx"), F.col(path_col).alias("__path")
        )
        desc = df.select(
            F.col(tx_col).alias("__tx"), F.col(idx_col).alias("__didx"), F.col(path_col).alias("__dpath")
        )
        ends = (
            nodes.join(desc, "__tx")
            .filter(_is_prefix(F.col("__path"), F.col("__dpath")))
            .groupBy("__tx", "__idx")
            .agg(F.max("__didx").alias("subtree_end"))
        )
        return df.join(
            ends,
            (df[tx_col] == ends["__tx"]) & (df[idx_col] == ends["__idx"]),
        ).drop("__tx", "__idx")
    if method != "window":
        raise ValueError(method)

    from pyspark.sql import Window as W

    depth = F.size(F.col(path_col))
    w_after = (
        W.partitionBy(tx_col).orderBy(idx_col).rowsBetween(1, W.unboundedFollowing)
    )
    w_tx = W.partitionBy(tx_col)
    # nxt[d] = smallest following idx whose depth <= d; own subtree ends
    # right before nxt[own depth]
    nxt = F.array(*[
        F.min(F.when(depth <= d, F.col(idx_col))).over(w_after)
        for d in range(0, max_depth + 1)
    ])
    guarded = F.when(depth <= max_depth, depth).otherwise(
        F.raise_error(F.lit(
            f"subtree_bounds: frame deeper than max_depth={max_depth}; "
            "raise max_depth or use method='join'"
        )).cast("int")
    )
    end = F.coalesce(
        F.element_at(nxt, guarded + 1) - 1,
        F.max(F.col(idx_col)).over(w_tx),
    )
    if validate:
        w_prev = W.partitionBy(tx_col).orderBy(idx_col)
        prev_path = F.lag(F.col(path_col)).over(w_prev)
        violated = (depth > 0) & (
            prev_path.isNull()
            | (depth > F.size(prev_path) + 1)
            | (
                F.slice(F.col(path_col), 1, depth - 1)
                != F.slice(prev_path, 1, depth - 1)
            )
        )
        end = F.when(
            violated,
            F.raise_error(
                F.lit(
                    "subtree_bounds: idx order is not a DFS preorder of the "
                    "path column; use method='join' (no contiguity "
                    "assumption) or validate=False if this is intended"
                )
            ),
        ).otherwise(end)
    return df.withColumn("subtree_end", end)


def collect_spans(
    df: DataFrame,
    required_types: Sequence[str],
    mode: str = "all",
    type_col: str = "action_type",
    tx_col: str = "tx_hash",
    idx_col: str = "trace_idx",
    **subtree_kwargs,
) -> DataFrame:
    """T2: subtree roots whose descendant set contains all/any of
    `required_types`. Returns the root rows + `span_types` (distinct types
    in the span). Extra kwargs (method=, max_depth=) forward to
    subtree_bounds so deep or non-preorder traces stay reachable."""
    b = subtree_bounds(df, tx_col=tx_col, idx_col=idx_col, **subtree_kwargs)
    members = df.select(
        F.col(tx_col).alias("__tx"),
        F.col(idx_col).alias("__midx"),
        F.col(type_col).alias("__mtype"),
    )
    joined = b.join(members, b[tx_col] == members["__tx"]).filter(
        (F.col("__midx") >= b[idx_col]) & (F.col("__midx") <= F.col("subtree_end"))
    )
    grouped = joined.groupBy(*[b[c] for c in df.columns], F.col("subtree_end")).agg(
        F.array_distinct(F.collect_list("__mtype")).alias("span_types")
    )
    req = F.array(*[F.lit(t) for t in required_types])
    if mode == "all":
        cond = F.size(F.array_intersect(F.col("span_types"), req)) == len(required_types)
    elif mode == "any":
        cond = F.size(F.array_intersect(F.col("span_types"), req)) > 0
    else:
        raise ValueError(mode)
    return grouped.filter(cond)


def absorb_children(
    df: DataFrame,
    parent_types: Sequence[str],
    child_types: Sequence[str],
    tx_col: str = "tx_hash",
    idx_col: str = "trace_idx",
    type_col: str = "action_type",
    **subtree_kwargs,
) -> DataFrame:
    """C7: parents of `parent_types` absorb descendant rows of `child_types`
    (deepest parent wins, matching the reference's deepest-first processing);
    returns the input with absorbed children removed and parents gaining
    `child_idxs` (sorted trace_idx array of what they absorbed). Extra
    kwargs (method=, max_depth=) forward to subtree_bounds."""
    b = subtree_bounds(df, tx_col=tx_col, idx_col=idx_col, **subtree_kwargs)
    parents = b.filter(F.col(type_col).isin(list(parent_types))).select(
        F.col(tx_col).alias("__tx"),
        F.col(idx_col).alias("__pidx"),
        F.col("subtree_end").alias("__pend"),
        F.size(F.col("trace_address")).alias("__pdepth"),
    )
    children = df.filter(F.col(type_col).isin(list(child_types))).select(
        F.col(tx_col).alias("__tx"), F.col(idx_col).alias("__cidx")
    )
    # deepest enclosing parent per child
    pairs = parents.join(children, "__tx").filter(
        (F.col("__cidx") > F.col("__pidx")) & (F.col("__cidx") <= F.col("__pend"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("__tx", "__cidx").orderBy(F.col("__pdepth").desc(), F.col("__pidx").desc())
    owned = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__tx", "__pidx", "__cidx")
    )
    absorbed_by_parent = owned.groupBy("__tx", "__pidx").agg(
        F.sort_array(F.collect_list("__cidx")).alias("child_idxs")
    )
    out = (
        df.join(
            owned.select(F.col("__tx").alias(tx_col), F.col("__cidx").alias(idx_col)),
            [tx_col, idx_col],
            "left_anti",
        )
        .join(
            absorbed_by_parent.select(
                F.col("__tx").alias(tx_col), F.col("__pidx").alias(idx_col), "child_idxs"
            ),
            [tx_col, idx_col],
            "left",
        )
    )
    return out.withColumn(
        "child_idxs", F.coalesce("child_idxs", F.array().cast("array<bigint>"))
    )
