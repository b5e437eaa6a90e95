"""Streaming near-duplicate detection — the tip-mode twin of the batch
incremental MinHash/LSH (operators/dedup.minhash_lsh_incremental), for the
continuous-crawl shape of a training-data pipeline: documents arrive in
micro-batches and each must be kept or flagged against everything already
kept, without ever re-pairing the corpus with itself.

Two stages in ONE streaming query:

1. `band_signatures_stream` — per-document MinHash band signatures via
   mapInPandas. This is a bit-exact Python mirror of the batch column-math
   plan (operators/dedup._lsh_band_signatures: 60-bit md5 shingles, affine
   hashes mod the Mersenne prime 2^31-1, md5 band digest) — mirrored rather
   than reused because Structured Streaming allows only one stateful
   operator per query, and the batch plan's groupBy(id) would be a second
   one ahead of the dedup state. Parity is pinned by test
   (tests/test_streaming_dedup.py runs both on the same batch input).
2. `lsh_dedup_stream` — `applyInPandasWithState` keyed by (band, band_sig):
   state is ONE long per occupied bucket (the surviving document's id), the
   minimum state any streaming dedup can carry. Semantics are first-kept-
   wins: the first document to claim a bucket survives; every later
   bucket-mate emits (doc_id, dup_of=survivor). Within a micro-batch, ids
   process in ascending order (deterministic tie-break), so when ids arrive
   in nondecreasing order across batches — the natural crawl shape — the
   flagged set equals EXACTLY the batch `minhash_lsh_pairs` id_b side
   (every doc with a smaller-id bucket-mate), which is the invariant the
   parity test checks across a checkpoint restart.

Scale: state size = 8 bytes per occupied LSH bucket, independent of stream
length past the bucket universe; at 100 TB corpus scale back the state
store with RocksDB (spark.sql.streaming.stateStore.providerClass) — the
fold logic is unchanged. A document appearing in several buckets may emit
several flags; downstream survivorship is `dropDuplicates(["doc_id"])` on
the flag stream, also streamable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_P31 = 2147483647  # Mersenne prime 2^31-1, same family as the batch plan

SIG_SCHEMA = "doc_id long, band int, band_sig string"
FLAG_SCHEMA = "doc_id long, dup_of long"
STATE_SCHEMA = "survivor long"


def band_signatures_py(
    text: str, n: int = 3, num_hashes: int = 16, band_size: int = 4
) -> list[tuple[int, str]]:
    """(band, band_sig) list for one document — the Python mirror of
    _lsh_band_signatures' column math, value-identical by construction:
    same single-space tokenizer, same 60-bit md5 shingle hash, same affine
    MinHash family, same comma-joined md5 band digest. Documents with
    fewer than n tokens have no shingles and therefore no signatures
    (they can never collide), matching the batch groupBy semantics."""
    if num_hashes % band_size != 0:
        raise ValueError("num_hashes must divide into bands of band_size")
    toks = [t for t in (text or "").lower().split(" ") if t]
    if len(toks) < n:
        return []
    shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    b31s = [
        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % _P31
        for s in shingles
    ]
    mh = [
        min(((2 * s + 1) * b + (s * 1000003 + 12345)) % _P31 for b in b31s)
        for s in range(num_hashes)
    ]
    out = []
    for band in range(num_hashes // band_size):
        joined = ",".join(
            str(mh[s]) for s in range(band * band_size, (band + 1) * band_size)
        )
        out.append((band, hashlib.md5(joined.encode("utf-8")).hexdigest()))
    return out


def band_signatures_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """(doc_id, band, band_sig) via mapInPandas — stateless, so it composes
    with the stateful dedup fold in one streaming query. Works identically
    on batch DataFrames (how the parity test compares it against the
    column-math plan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for band, sig in band_signatures_py(
                    text, n=n, num_hashes=num_hashes, band_size=band_size
                ):
                    out.append(
                        {"doc_id": int(doc_id), "band": band, "band_sig": sig}
                    )
            yield pd.DataFrame(out, columns=["doc_id", "band", "band_sig"])

    selected = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return selected.mapInPandas(run, schema=SIG_SCHEMA)


def _dedup_fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    ids = sorted(
        {int(v) for pdf in pdfs for v in pdf["doc_id"]}
    )
    survivor = int(state.get[0]) if state.exists else None
    out = []
    for doc_id in ids:
        if survivor is None:
            survivor = doc_id
        elif doc_id != survivor:
            out.append({"doc_id": doc_id, "dup_of": survivor})
    state.update((survivor,))
    yield pd.DataFrame(out, columns=["doc_id", "dup_of"])


def lsh_dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """Streaming flag stream (doc_id, dup_of): one row per (document,
    bucket) where the bucket already has a surviving document. Kept set =
    documents never flagged. First-kept-wins across micro-batches (state
    survives restarts via the query's checkpoint); ascending-id arrival
    reproduces the batch minhash_lsh_pairs id_b side exactly."""
    sigs = band_signatures_stream(
        docs, id_col=id_col, text_col=text_col,
        n=n, num_hashes=num_hashes, band_size=band_size,
    )
    return sigs.groupBy("band", "band_sig").applyInPandasWithState(
        _dedup_fold,
        outputStructType=FLAG_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
