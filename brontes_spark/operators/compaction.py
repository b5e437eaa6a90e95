"""Small-file compaction planning — the OPTIMIZE scheduler as one window.

The operational reality of a 100 TB table is millions of files written by
thousands of streaming/batch commits; scan cost is dominated by file
COUNT (task scheduling, footer reads, open/close) once sizes drop below
~100 MB. A compaction pass needs a plan: which files merge into which
output file, targeting `target_bytes` per output.

True first-fit-decreasing bin packing is inherently sequential (every
placement depends on all previous bins' residuals). The distributed form
used by real table services is boundary binning: lay the files out in a
deterministic total order, take the running byte total, and cut a bin
boundary every `target_bytes`:

    bin = (cumsum_before_this_file) div target_bytes

ONE ordered window over the FILE-LISTING relation (metadata-sized: a few
rows per data file, never data-sized) — no driver loop, no sequential
fold. Ordering is (size DESC, file_id): oversized files sort first and
land alone in their own bins (a file >= target never merges — it is
already compact), and the long tail of small files packs densely behind
them. Guarantee: every bin's total assigned bytes < target_bytes +
max_file_bytes (a file is assigned to the bin where its first byte
falls); bins are contiguous ranges of the layout order, so each merge
job reads a deterministic, locality-friendly file set.

Exact integers throughout; the DuckDB twin runs the identical window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """(file, size_bytes, bin) — bin is the output-file group index.

    NULL or non-positive sizes are rejected upstream concerns; rows with
    NULL size are excluded here (a file of unknown size cannot be
    scheduled — surface those through a dq check).
    """
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    # a GLOBAL ordered window — deliberately: the input is the file
    # LISTING (metadata, ~one row per data file), so even a 10^6-file
    # table is one comfortable task; never point this at a data relation
    w = (
        W.orderBy(F.desc(size_col), F.asc(file_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sized = files.filter(F.col(size_col).isNotNull())
    return (
        sized.withColumn("_before", F.sum(size_col).over(w) - F.col(size_col))
        .select(
            F.col(file_col).alias("file"),
            F.col(size_col).alias("size_bytes"),
            F.expr(f"_before div {target_bytes}").alias("bin"),
        )
    )


def compaction_summary(plan: DataFrame) -> DataFrame:
    """Per-bin merge jobs: (bin, n_files, total_bytes) — bins with one
    file are no-ops the executor skips."""
    return plan.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").alias("total_bytes"),
    )
