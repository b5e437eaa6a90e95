"""Staging area for gate specs built mid-round when the 50-slot driver
window has no headroom.

The driver verifies the FIRST 50 ordered registry entries per round, and a
brand-new gate (no driver history) sorts risk-first — so registering a new
gate can eject a stale re-attestation from the window and break the
rotation contract. When that would happen, stage the spec here with the
SAME (builder, oracle, survey_ref) shape as registry entries: it is
verified by the SAME sf0.01 DuckDB-parity harness
(tests/test_pending_parity.py) and runnable through the CLI, and the next
round promotes it with a one-line move to ``@register``.

Round-8 status: all 21 round-7 staged gates were promoted at r8 start per
the r7 playbook — corpus/sketch/text gates to plans/corpus.py,
x11/x12/x15/s11 to plans/timeseries.py, o7 to plans/relational.py — and
seat in the r8 driver window together with the 29 stalest r6
re-attestations (the 21 remaining r6 gates ride to r9 under local parity
cover; COVERAGE.md names them). The 60 gates below were built DURING
round 8 and stage here, all sf0.01-parity green AND sf0.1
hash-match-swept, all benched — in TWO promotion tiers, because the r9
window has exactly 29 seats to give (see the math below): the first 29
promote at r9; the thirty-one marked "r10 tier" in their survey_refs
(`g10_label_prop`, `o12_rrf_fusion`, `x20_pearson_corr`,
`x21_rolling_distinct`, `g11_hits`, `o13_table_diff`, `x22_winsorize`,
`o14_dq_checks`, and the fifth wave `x23_cusum`, `g12_bfs_hops`,
`txt_chi2_features`, `o15_k_anonymity`, `o16_benford`, `txt_nb_train`,
`x24_rfm_segments`, `x25_autocorr`, `o17_compaction_plan`,
`o18_assoc_rules`, `o19_pareto`, `g13_sssp_weighted`,
`o20_skew_profile`, `txt_readability`, `g14_ppr`, `o21_corr_matrix`,
`o22_mann_whitney`, `o23_ks_test`, `o24_spearman`, `ev_json_extract`,
`x26_seasonality`, `x27_quantile_normalize`, `ml_fold_assign`) stay staged
through r9 under parity cover and promote across r10/r11 as that
window's headroom allows (31 candidates + the changed-lg cohort compete
for r10's post-promotion seats; the r9 builder re-simulates the exact
seating the way this header's math was produced).

R9 PROMOTION PLAYBOOK (window math simulated end-of-r8 against a
synthesized all-green CORRECTNESS_r08): promoting the 29-gate r9 tier
seats them at staleness -1, and the remaining 21 slots take EXACTLY the
21 r6-deferred gates (staleness 5.25 — every one returns as the r8 plan
promised); the window is exactly full. Promoting all 31 would instead
eject two r6-deferred gates and break that promise — hence the tiers. The changed-in-r8 lg=7 cohort (10 gates by the
symbol-level fingerprint refresh — mm_mp2_features, mm_audio_*, the
sketch NULL-boundary fixes, gapfill, txt_url_normalize) therefore rides
to r10 as the FIRST seats after the r9 promotion wave, carrying interim
cover from the local sf0.01 parity suite + the r8 robustness sweeps; the
unchanged lg=7 remainder rides behind them — "unchanged" being a checked
fact (byte-identical reached-symbol closure since the green row), not an
assumption. Symbol-level fingerprints likewise keep the r10 backlog to
gates whose reached code actually changes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import EV_CTE, QuerySpec

PENDING: dict[str, QuerySpec] = {}


def pending(name: str, oracle: str | None, survey_ref: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        PENDING[name] = QuerySpec(name=name, build=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco


@pending(
    "dedup_fuzzy_lsh_verified",
    # the oracle recomputes the SAME deterministic MinHash/LSH candidate
    # stream as the dedup_minhash_lsh gate (shared CTE), then brute-forces
    # the edit-distance verify on exactly those pairs — so the gate pins
    # the COMPOSITION (candidates ∘ verify), not just each stage alone
    oracle=None,  # interpolated below: needs llm_data's shingle CTE
    survey_ref="the 100 TB fuzzy-dedup shape (VERDICT r7 directive 3): "
    "MinHash/LSH candidate generation (one shingle shuffle, corpus-linear) "
    "feeding verify_pairs_levenshtein (operators/fuzzy.py) — the exact "
    "O(len*d) thresholded edit-distance kernel runs once per CANDIDATE, "
    "never corpus x corpus; at sf0.01 the LSH stream has 25 candidates of "
    "which max_dist=5 verifies 24 and rejects 1 (dist 8), exercising both "
    "outcomes; scripts/fuzzy_slope.py measures kernel count == candidate "
    "count at 10x data",
)
def dedup_fuzzy_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs
    from ..operators.fuzzy import verify_pairs_levenshtein
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    cands = minhash_lsh_pairs(docs, "doc_id", "text", n=5, num_hashes=16, band_size=4)
    return verify_pairs_levenshtein(cands, docs, "doc_id", "text", max_dist=5)


def _fuzzy_lsh_oracle() -> str:
    from .llm_data import _SQL_SHINGLES

    return f"""
    WITH {_SQL_SHINGLES},
    based AS (
      SELECT doc_id, shingle_h % 2147483647 AS b31
      FROM sh),
    hashed AS (
      SELECT doc_id, seed.i AS seed,
             MIN(((2 * seed.i + 1) * b31 + (seed.i * 1000003 + 12345)) % 2147483647) AS mh
      FROM based, range(0, 16) seed(i)
      GROUP BY doc_id, seed.i),
    banded AS (
      SELECT doc_id, seed // 4 AS band,
             md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS band_sig
      FROM hashed GROUP BY doc_id, seed // 4),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_sig = b.band_sig
      WHERE a.doc_id < b.doc_id)
    SELECT p.id_a, p.id_b, CAST(levenshtein(a.text, b.text) AS INT) AS dist
    FROM pairs p
    JOIN documents a ON p.id_a = a.doc_id
    JOIN documents b ON p.id_b = b.doc_id
    WHERE levenshtein(a.text, b.text) <= 5
    """


PENDING["dedup_fuzzy_lsh_verified"] = QuerySpec(
    name="dedup_fuzzy_lsh_verified",
    build=PENDING["dedup_fuzzy_lsh_verified"].build,
    oracle=_fuzzy_lsh_oracle(),
    survey_ref=PENDING["dedup_fuzzy_lsh_verified"].survey_ref,
)


#: adversarial PSL host per doc: nine rotating shapes covering a plain
#: normal rule, UK second-level, the 5-label US hierarchy, the *.ck
#: wildcard + !www.ck exception pair (bare-suffix, exception, and
#: registrable-subdomain cases), the JP designated-city exception, an
#: unlisted TLD (implicit '*' default rule), and an IPv4 literal. Spark
#: and the oracle synthesize the SAME strings from the same columns.
_PSL_HOST_SQL = """
    CASE CAST(doc_id % 9 AS INT)
      WHEN 0 THEN source || '.example.com'
      WHEN 1 THEN 'a.' || source || '.co.uk'
      WHEN 2 THEN source || '.pvt.k12.ma.us'
      WHEN 3 THEN 'www.ck'
      WHEN 4 THEN source || '.ck'
      WHEN 5 THEN 'b.' || source || '.ck'
      WHEN 6 THEN 'www.city.kawasaki.jp'
      WHEN 7 THEN source || '.unlisted' || CAST(doc_id % 7 AS INT)
      ELSE '10.0.0.' || CAST(doc_id % 200 AS INT)
    END
"""


def _psl_host_col() -> F.Column:
    d9 = (F.col("doc_id") % 9).cast("int")
    return (
        F.when(d9 == 0, F.concat(F.col("source"), F.lit(".example.com")))
        .when(d9 == 1, F.concat(F.lit("a."), F.col("source"), F.lit(".co.uk")))
        .when(d9 == 2, F.concat(F.col("source"), F.lit(".pvt.k12.ma.us")))
        .when(d9 == 3, F.lit("www.ck"))
        .when(d9 == 4, F.concat(F.col("source"), F.lit(".ck")))
        .when(d9 == 5, F.concat(F.lit("b."), F.col("source"), F.lit(".ck")))
        .when(d9 == 6, F.lit("www.city.kawasaki.jp"))
        .when(
            d9 == 7,
            F.concat(F.col("source"), F.lit(".unlisted"),
                     (F.col("doc_id") % 7).cast("int").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("10.0.0."), (F.col("doc_id") % 200).cast("int").cast("string"))
        )
    )


def _psl_oracle() -> str:
    from ..functions.psl import psl_rules_sql_values

    return f"""
    WITH rules(name, kind) AS (VALUES {psl_rules_sql_values()}),
    u AS (SELECT doc_id, 'https://' || {_PSL_HOST_SQL} || '/p' || doc_id AS url
          FROM documents),
    h AS (SELECT doc_id,
                 lower(regexp_extract(url, '^[^/]*//(?:[^/@?]*@)?([^/:?#]+)', 1)) AS h
          FROM u),
    hl AS (SELECT doc_id, h, string_split(h, '.') AS labels,
                  len(string_split(h, '.')) AS n
           FROM h),
    cand AS (
      SELECT hl.doc_id, hl.h, hl.n, idx.off,
             array_to_string(list_slice(labels, idx.off + 1, n), '.') AS suffix,
             CASE WHEN idx.off < n - 1
                  THEN array_to_string(list_slice(labels, idx.off + 2, n), '.')
             END AS wbase
      FROM hl, LATERAL (SELECT unnest(range(0, n)) AS off) idx),
    m AS (
      SELECT c.doc_id, c.h, c.n,
             MAX(CASE WHEN re.kind = 'exception' THEN 1000000 + (c.n - c.off - 1)
                      WHEN re.kind = 'normal' THEN c.n - c.off END) AS s_e,
             MAX(CASE WHEN rw.kind = 'wildcard' THEN c.n - c.off END) AS s_w
      FROM cand c
      LEFT JOIN rules re ON re.kind != 'wildcard' AND re.name = c.suffix
      LEFT JOIN rules rw ON rw.kind = 'wildcard' AND rw.name = c.wbase
      GROUP BY c.doc_id, c.h, c.n),
    ps AS (
      SELECT doc_id, h, n,
             COALESCE(GREATEST(s_e, s_w), 1) % 1000000 AS ps_labels
      FROM m)
    SELECT doc_id, h AS host,
           CASE WHEN regexp_matches(h, '^[0-9.]+$') THEN h
                WHEN n > ps_labels THEN array_to_string(
                  list_slice(string_split(h, '.'), n - ps_labels, n), '.')
           END AS registered_domain
    FROM ps
    """


@pending(
    "txt_url_psl_domain",
    oracle=None,  # set below (needs the interpolated rules dim)
    survey_ref="Public-Suffix-List eTLD+1 as a packaged broadcast dim "
    "(functions/psl.py, VERDICT r7 directive 4): the publicsuffix.org "
    "algorithm — exception beats wildcard beats longest normal rule, "
    "implicit '*' default, NULL when the host IS a public suffix — as "
    "candidate-suffix explode + ONE broadcast join + max-struct fold, no "
    "UDFs; the oracle twin joins the SAME rules dim (VALUES-interpolated) "
    "over an adversarial nine-shape host fixture (co.uk, pvt.k12.ma.us, "
    "*.ck/!www.ck, !city.kawasaki.jp, unlisted TLD, IPv4); full "
    "public_suffix_list.dat swaps in via load_psl_rules(path=...)",
)
def txt_url_psl_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.psl import load_psl_rules, url_registered_domain_psl
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("https://"), _psl_host_col(), F.lit("/p"),
                 F.col("doc_id").cast("string")).alias("url"),
    )
    out = url_registered_domain_psl(docs, "url", load_psl_rules(spark))
    return out.select("doc_id", "host", "registered_domain")


PENDING["txt_url_psl_domain"] = QuerySpec(
    name="txt_url_psl_domain",
    build=PENDING["txt_url_psl_domain"].build,
    oracle=_psl_oracle(),
    survey_ref=PENDING["txt_url_psl_domain"].survey_ref,
)


@pending(
    "txt_bm25_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
      FROM documents),
    q AS (
      SELECT DISTINCT doc_id AS query_id, unnest(list_slice(toks, 1, 3)) AS term
      FROM tok WHERE doc_id % 97 = 0),
    tfrel AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS term FROM tok) GROUP BY 1, 2),
    enr AS (
      SELECT doc_id, term, tf,
             COUNT(*) OVER (PARTITION BY term) AS df,
             SUM(tf) OVER (PARTITION BY doc_id) AS dl
      FROM tfrel),
    dim AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT SUM(len(toks)) FROM tok) AS l_tokens),
    c AS (
      SELECT q.query_id, e.doc_id,
             (44::HUGEINT * e.tf * d.l_tokens
              * (2 * d.n_docs::HUGEINT - 2 * e.df + 1) * 1000000000)
             // ((20::HUGEINT * e.tf * d.l_tokens
                  + 6 * d.l_tokens::HUGEINT
                  + 18 * e.dl::HUGEINT * d.n_docs)
                 * (2 * e.df::HUGEINT + 1)) AS c9
      FROM enr e JOIN q USING (term) CROSS JOIN dim d),
    agg AS (
      SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit,
             CAST(SUM(c9) AS BIGINT) AS score9
      FROM c GROUP BY 1, 2),
    r AS (
      SELECT query_id, doc_id, n_hit, score9,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score9 DESC, doc_id) AS rnk
      FROM agg)
    SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id, n_hit, score9
    FROM r WHERE rnk <= 5
    """,
    survey_ref="Okapi BM25 top-k retrieval (operators/bm25.py): per-query "
    "document ranking with the k1=1.2/b=0.75 defaults as exact rationals, "
    "score9 = sum of floor(1e9 * per-term contribution) so both engines "
    "truncate identically (the tfidf score9 pattern; float-ln is the "
    "documented pytest-only variant); queries are the first 3 tokens of "
    "every doc_id % 97 == 0 document; ONE corpus token scan, df/dl as "
    "windows over the tf relation, broadcast query join, WindowGroupLimit "
    "top-k",
)
def txt_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import ws_tokens
    from ..operators.bm25 import bm25_topk
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    queries = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(ws_tokens(F.col("text")), 1, 3)).alias("term"),
        )
        .distinct()
    )
    out = bm25_topk(docs, queries, "doc_id", "text", k=5, rational=True)
    return out.select(
        "query_id", "rnk", "doc_id", "n_hit",
        F.col("score9").cast("long").alias("score9"),
    )


@pending(
    "sketch_hll_distinct",
    # p=6: m=64 registers, w_bits=54 (2^54=18014398509481984), B=55
    # (2^55=36028797018963968), alpha = 709/1000; the estimate is ONE
    # integer division so both engines agree bit-exactly (the float-ln
    # linear-counting correction column is pytest-only, not gated)
    oracle="""
    WITH tok AS (
      SELECT lang AS key,
             unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS v
      FROM documents),
    h AS (SELECT key, ('0x' || substr(md5(v), 1, 15))::BIGINT AS hv FROM tok),
    b AS (SELECT key, hv // 18014398509481984 AS bucket,
                 hv % 18014398509481984 AS w
          FROM h),
    r AS (SELECT key, bucket,
                 CASE WHEN w = 0 THEN 55 ELSE 54 - length(bin(w)) + 1 END AS rho
          FROM b),
    reg AS (SELECT key, bucket, MAX(rho) AS rho_max FROM r GROUP BY 1, 2),
    agg AS (
      SELECT key, CAST(COUNT(*) AS BIGINT) AS n_buckets,
             SUM((1::BIGINT << CAST(55 - rho_max AS INT))) AS s_obs
      FROM reg GROUP BY key),
    est AS (
      SELECT key, n_buckets,
             CAST(64 - n_buckets AS BIGINT) AS zeros,
             CAST(s_obs + (64 - n_buckets) * 36028797018963968 AS BIGINT) AS s_num
      FROM agg),
    ex AS (SELECT key, CAST(COUNT(DISTINCT v) AS BIGINT) AS exact_distinct
           FROM tok GROUP BY key)
    SELECT e.key, e.n_buckets, e.zeros, e.s_num,
           CAST((709::HUGEINT * 64 * 64 * 36028797018963968)
                // (1000::HUGEINT * e.s_num) AS BIGINT) AS raw_est,
           x.exact_distinct
    FROM est e JOIN ex x USING (key)
    """,
    survey_ref="HyperLogLog distinct-cardinality sketch (operators/"
    "sketches.hll_*, Flajolet et al. 2007) beside the KMV estimator: "
    "per-language distinct-token registers from the same deterministic "
    "md5 hash, rho via the integer-exact length-of-binary-string trick "
    "(no float log2), raw estimate as ONE integer division "
    "(alpha_num*m^2*2^B div (alpha_den*s_num)) checked cell-exactly "
    "against the exact distinct; sketch is <= m rows per key, merges by "
    "max (map-side-combined groupBy) — the kilobyte summary for "
    "count-distinct over 100 TB",
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import ws_tokens
    from ..operators.sketches import hll_distinct
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("lang").alias("key"), F.explode(ws_tokens(F.col("text"))).alias("v")
    )
    est = hll_distinct(toks, "key", "v", p=6).drop("est_distinct")
    exact = toks.groupBy("key").agg(F.count_distinct("v").alias("exact_distinct"))
    return est.join(exact, "key").select(
        "key",
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("zeros").cast("long").alias("zeros"),
        F.col("s_num").cast("long").alias("s_num"),
        "raw_est",
        "exact_distinct",
    )


@pending(
    "x16_interval_join",
    # functional-spec oracle: a brute-force inequality join is fine at
    # sf0.01 (the Spark side's bucket banding is the scale path; the
    # bucket-independence property is pinned in tests/test_range_join.py)
    oracle="""
    WITH ev AS (
      SELECT event_id, epoch_ns(ts) AS ts_ns, user_id, event_type FROM events),
    v AS (SELECT user_id, event_id AS view_id, ts_ns AS v_start,
                 ts_ns + 7200000000000 AS v_end
          FROM ev WHERE event_type = 'view'),
    c AS (SELECT user_id, event_id AS click_id, ts_ns AS c_start,
                 ts_ns + 3600000000000 AS c_end
          FROM ev WHERE event_type = 'click')
    SELECT v.user_id, v.view_id, v.v_start, v.v_end,
           c.click_id, c.c_start, c.c_end,
           GREATEST(v.v_start, c.c_start) AS overlap_start,
           LEAST(v.v_end, c.c_end) AS overlap_end
    FROM v JOIN c ON v.user_id = c.user_id
     AND v.v_start < c.c_end AND c.c_start < v.v_end
    """,
    survey_ref="interval-overlap (range) join (operators/range_join.py): "
    "per-user view[ts, ts+2h) x click[ts, ts+1h) attribution windows — "
    "the inequality join Spark would otherwise nested-loop, re-expressed "
    "as bucket banding (explode to covered 1h buckets, plain hash "
    "equi-join, exact half-open predicate, exactly-once via the "
    "overlap-start-bucket rule, zero dedup shuffle); bucket width is the "
    "one dial and correctness is bucket-independent (property-pinned)",
)
def x16_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import interval_overlap_join
    from ..sources.testdata import load_events

    HOUR = 3_600_000_000_000
    ev = load_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts_ns").alias("v_start"),
        (F.col("ts_ns") + 2 * HOUR).alias("v_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts_ns").alias("c_start"),
        (F.col("ts_ns") + HOUR).alias("c_end"),
    )
    return interval_overlap_join(
        views, clicks, "v_start", "v_end", "c_start", "c_end",
        on=["user_id"], bucket=HOUR,
    )


@pending(
    "emb_gram_matrix",
    # floor-quantized (x * 1e6) integer Gram entries: exact sums, so the
    # d x d summary that drives distributed PCA is hash-checkable; the
    # float eigen/projection phase is pytest-pinned (tests/test_pca.py)
    oracle="""
    WITH qv AS (
      SELECT list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
      FROM embeddings),
    p AS (
      SELECT i.i, j.j, q[i.i + 1] AS qi, q[j.j + 1] AS qj
      FROM qv,
           LATERAL (SELECT unnest(range(0, len(q))) AS i) i,
           LATERAL (SELECT unnest(range(0, len(q))) AS j) j
      WHERE j.j >= i.i)
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(SUM(qi * qj) AS BIGINT) AS g,
           CAST(SUM(qi) AS BIGINT) AS s_i,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM p GROUP BY 1, 2
    """,
    survey_ref="the distributed phase of PCA/whitening (operators/pca.py): "
    "ONE map-side-combined aggregate produces the d x d Gram matrix over "
    "floor-quantized integer embeddings — exact, partition-order "
    "independent, shuffle bounded by d^2 rows per task regardless of "
    "corpus size; the d x d eigenproblem then solves on the driver "
    "(collect bounded by d^2, the pricing/graph.py pattern) and the k "
    "axes broadcast back as literal arrays for a codegen projection "
    "(F.aggregate dot products, no UDF) — projection/whitening "
    "pytest-pinned against numpy",
)
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pca import gram_matrix
    from ..sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return gram_matrix(emb, "embedding").select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        "g", "s_i", "n",
    )


#: planted multi-script suffixes (literal characters interpolated into BOTH
#: engines' expressions, the NFC-gate pattern)
_SCRIPT_SUFFIX = {
    0: " Привет мир",
    1: " 汉字处理中",
    2: " مرحبا بالعالم",
    3: " 数字123 テスト 한글",
}


def _script_mutation_sql() -> str:
    cases = " ".join(
        f"WHEN {k} THEN text || '{v}'" for k, v in _SCRIPT_SUFFIX.items()
    )
    return f"CASE CAST(doc_id % 5 AS INT) {cases} ELSE text END"


def _script_profile_oracle() -> str:
    from ..functions.text import SCRIPT_CLASSES

    cols = ",\n           ".join(
        f"CAST(length(m) - length(regexp_replace(m, '{re2}', '', 'g')) AS INT) AS n_{name}"
        for name, _, re2 in SCRIPT_CLASSES
    )
    sum_all = " + ".join(f"n_{name}" for name, _, _ in SCRIPT_CLASSES)
    return f"""
    WITH m AS (SELECT doc_id, {_script_mutation_sql()} AS m FROM documents),
    c AS (
      SELECT doc_id, CAST(length(m) AS INT) AS n_chars_total,
           {cols}
      FROM m)
    SELECT *, CAST(n_chars_total - ({sum_all}) AS INT) AS n_other FROM c
    """


@pending(
    "txt_script_profile",
    oracle=None,  # set below: column list derives from SCRIPT_CLASSES
    survey_ref="Unicode script-class histogram (functions/text."
    "script_profile): per-document codepoint counts for latin/cyrillic/"
    "greek/han/arabic/hebrew/hangul/kana/digit/space + other — the "
    "wrong-script-contamination filter of multilingual corpus curation; "
    "pure codegen length-minus-stripped counting (Java \\p{IsX} == RE2 "
    "\\p{X}, parity pinned per class), zero shuffle; gate plants "
    "multi-script suffixes on four of five docs",
)
def txt_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import script_profile
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    d5 = (F.col("doc_id") % 5).cast("int")
    mut = F.col("text")
    for k, v in _SCRIPT_SUFFIX.items():
        mut = F.when(d5 == k, F.concat(F.col("text"), F.lit(v))).otherwise(mut)
    prof = script_profile(F.col("m"))
    return docs.select("doc_id", mut.alias("m")).select(
        "doc_id",
        *[c.cast("int").alias(name) for name, c in prof.items()],
    )


PENDING["txt_script_profile"] = QuerySpec(
    name="txt_script_profile",
    build=PENDING["txt_script_profile"].build,
    oracle=_script_profile_oracle(),
    survey_ref=PENDING["txt_script_profile"].survey_ref,
)


@pending(
    "dedup_jaccard_join_exact",
    oracle=None,  # set below: shares llm_data's shingle CTE
    survey_ref="EXACT set-similarity join via AllPairs prefix filtering "
    "(operators/allpairs.py, Bayardo/Ma/Srikant WWW'07): every doc pair "
    "with 5-gram-shingle Jaccard >= 1/10, NO false negatives — the exact "
    "complement of dedup_minhash_lsh's probabilistic candidates; "
    "df-rarest-first prefix tokens are the ONLY postings indexed and the "
    "length band prunes before any intersection; threshold compares in "
    "exact integer arithmetic (inter*den >= num*union) so the boundary "
    "is engine-identical; brute-force parity property-pinned in "
    "tests/test_allpairs.py, pruning factor measured in SCALE.md",
)
def dedup_jaccard_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.allpairs import jaccard_join_elements
    from ..operators.dedup import _doc_shingles
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    # codegen shingle hasher (posexplode + window leads) — the F.transform
    # array-lambda form runs interpreted and measured ~10x slower
    shingles = _doc_shingles(docs, "doc_id", "text", n=5)
    return jaccard_join_elements(shingles, "id", "shingle_h", None, num=1, den=10)


def _jaccard_join_oracle() -> str:
    from .llm_data import _SQL_SHINGLES

    return f"""
    WITH {_SQL_SHINGLES},
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
    i AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.shingle_h = b.shingle_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    j AS (
      SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b
      FROM i JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b)
    SELECT id_a, id_b, inter, sz_a, sz_b,
           CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) AS jaccard
    FROM j WHERE inter * 10 >= 1 * (sz_a + sz_b - inter)
    """


PENDING["dedup_jaccard_join_exact"] = QuerySpec(
    name="dedup_jaccard_join_exact",
    build=PENDING["dedup_jaccard_join_exact"].build,
    oracle=_jaccard_join_oracle(),
    survey_ref=PENDING["dedup_jaccard_join_exact"].survey_ref,
)


@pending(
    "sketch_kmv_containment",
    # A = the doc_id % 10 == 0 tenth of the corpus, B = the rest, per
    # lang: a genuinely ASYMMETRIC pair, so containment(A in B) runs high
    # while Jaccard (and containment(B in A)) stays low — the signal this
    # estimator exists for
    oracle="""
    WITH tokd AS (
      SELECT doc_id, lang, list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
      FROM documents),
    av AS (
      SELECT DISTINCT lang AS key, ('0x' || substr(md5(v), 1, 15))::BIGINT AS hv
      FROM (SELECT lang, unnest(toks) AS v FROM tokd WHERE doc_id % 10 = 0)),
    bv AS (
      SELECT DISTINCT lang AS key, ('0x' || substr(md5(v), 1, 15))::BIGINT AS hv
      FROM (SELECT lang, unnest(toks) AS v FROM tokd WHERE doc_id % 10 != 0)),
    ska AS (SELECT key, hv FROM (
      SELECT key, hv, row_number() OVER (PARTITION BY key ORDER BY hv) AS pos FROM av)
      WHERE pos <= 128),
    skb AS (SELECT key, hv FROM (
      SELECT key, hv, row_number() OVER (PARTITION BY key ORDER BY hv) AS pos FROM bv)
      WHERE pos <= 128),
    u AS (
      SELECT key, hv, MAX(a) AS in_a, MAX(b) AS in_b
      FROM (SELECT key, hv, 1 AS a, 0 AS b FROM ska
            UNION ALL SELECT key, hv, 0 AS a, 1 AS b FROM skb)
      GROUP BY key, hv),
    topk AS (
      SELECT key, hv, in_a, in_b,
             row_number() OVER (PARTITION BY key ORDER BY hv) AS pos
      FROM u QUALIFY pos <= 128),
    agg AS (
      SELECT key, CAST(COUNT(*) AS BIGINT) AS n_union_seen,
             CAST(SUM(in_a) AS BIGINT) AS n_a,
             CAST(SUM(in_b) AS BIGINT) AS n_b,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
      FROM topk GROUP BY key)
    SELECT key, n_union_seen, n_a, n_b, n_both,
           n_both / n_a AS containment_a_in_b,
           n_both / n_b AS containment_b_in_a
    FROM agg
    """,
    survey_ref="asymmetric set containment from KMV sketches (operators/"
    "sketches.kmv_containment, the Beyer et al. 2007 estimator family): "
    "containment(A in B) = |A∩B|/|A| via the union sketch's k-minima — "
    "the subset/quote-detection signal Jaccard hides (a doc wholly pasted "
    "inside a much larger one has Jaccard ~0 but containment ~1); "
    "per-lang vocabulary of a 10% corpus slice vs the rest, k=128 rows "
    "per side regardless of corpus size",
)
def sketch_kmv_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import ws_tokens
    from ..operators.sketches import kmv_containment, kmv_sketch
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.col("lang").alias("key"),
        F.explode(ws_tokens(F.col("text"))).alias("v"),
    )
    a = toks.filter(F.col("doc_id") % 10 == 0)
    b = toks.filter(F.col("doc_id") % 10 != 0)
    return kmv_containment(
        kmv_sketch(a, "key", "v", k=128), kmv_sketch(b, "key", "v", k=128), k=128
    )


#: customer <-> supplier trade graph: an edge per distinct trading pair in
#: both directions (key spaces prefixed to disjoint node ids)
_PR_EDGES_SQL = """edges(src, dst) AS (
      SELECT 'c' || o_custkey, 's' || l_suppkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      UNION ALL
      SELECT 's' || l_suppkey, 'c' || o_custkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey)"""


def _pagerank_oracle() -> str:
    from ..operators.pagerank import pagerank_oracle_sql

    return pagerank_oracle_sql(_PR_EDGES_SQL, iters=3)


@pending(
    "g7_pagerank",
    oracle=None,  # set below: generated unrolled-iteration twin
    survey_ref="fixed-iteration PageRank in exact integer arithmetic "
    "(operators/pagerank.py) over the bidirectional customer<->supplier "
    "trade graph — the iterative relational algorithm class done "
    "Spark-first: one join + one aggregate per iteration, lineage cut "
    "per iteration with localCheckpoint (without it, iteration t replans "
    "0..t-1 in every branch), scaled-integer scores so the DuckDB twin "
    "(the SAME iterations unrolled as generated CTEs) hash-matches "
    "exactly; G2/G3's graph machinery extended from paths to global "
    "centrality",
)
def g7_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank_integer
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return pagerank_integer(edges, iters=3)


PENDING["g7_pagerank"] = QuerySpec(
    name="g7_pagerank",
    build=PENDING["g7_pagerank"].build,
    oracle=_pagerank_oracle(),
    survey_ref=PENDING["g7_pagerank"].survey_ref,
)


def _zorder_oracle() -> str:
    from ..operators.zorder import zorder_sql

    return f"""
    SELECT l_orderkey, l_partkey,
           CAST({zorder_sql(['(l_orderkey % 65536)', '(l_partkey % 65536)'], 16)} AS BIGINT) AS z
    FROM lineitem
    """


@pending(
    "o8_zorder_index",
    oracle=None,  # set below: generated interleave twin
    survey_ref="Z-order (Morton) clustering key (operators/zorder.py): "
    "bit-interleave of the two hottest filter columns as ONE codegen "
    "projection — the write-side layout primitive that lets parquet "
    "row-group min/max stats prune multi-dimensional predicates (the "
    "OPTIMIZE ZORDER story); exact integer bit ops, generated DuckDB "
    "twin, locality-beats-single-sort property pinned in "
    "tests/test_zorder.py, measured file-skip ratio in SCALE.md",
)
def o8_zorder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zorder import zorder_index
    from ..sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey",
        (F.col("l_orderkey") % 65536).alias("_a"),
        (F.col("l_partkey") % 65536).alias("_b"),
    )
    return li.select(
        "l_orderkey", "l_partkey", zorder_index(["_a", "_b"], 16).alias("z")
    )


PENDING["o8_zorder_index"] = QuerySpec(
    name="o8_zorder_index",
    build=PENDING["o8_zorder_index"].build,
    oracle=_zorder_oracle(),
    survey_ref=PENDING["o8_zorder_index"].survey_ref,
)


@pending(
    "o9_table_profile",
    # integer/decimal/date/string columns only: float min/max RENDERING
    # differs across engines (the operator's documented exclusion)
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n FROM lineitem),
    p AS (
      SELECT 'l_orderkey' AS "column",
             CAST(COUNT(*) FILTER (l_orderkey IS NULL) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
             CAST(MIN(l_orderkey) AS VARCHAR) AS min_str,
             CAST(MAX(l_orderkey) AS VARCHAR) AS max_str
      FROM lineitem
      UNION ALL
      SELECT 'l_suppkey', CAST(COUNT(*) FILTER (l_suppkey IS NULL) AS BIGINT),
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
             CAST(MIN(l_suppkey) AS VARCHAR), CAST(MAX(l_suppkey) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', CAST(COUNT(*) FILTER (l_returnflag IS NULL) AS BIGINT),
             CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
             CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'l_shipdate', CAST(COUNT(*) FILTER (l_shipdate IS NULL) AS BIGINT),
             CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
             CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR)
      FROM lineitem)
    SELECT p."column", n.n AS n, p.n_null, p.n_distinct, p.min_str, p.max_str
    FROM p CROSS JOIN n
    """,
    survey_ref="table profiling / column statistics (operators/profile.py "
    "— the ANALYZE / SUMMARIZE surface): per-column nulls, EXACT distinct "
    "count, min/max as a UNION of per-column pruned-scan aggregates — "
    "MEASURED 13x over the folk one-scan Expand form at sf0.1 (9.06 s -> "
    "0.66 s): on columnar storage k single-column scans total ~one "
    "full-table byte read, while the Expand path reads every column AND "
    "pushes a (k+1)x row blow-up through the aggregate; the expand "
    "formulation stays as the documented row-oriented-source dial; float "
    "columns excluded by policy (engine-dependent string rendering)",
)
def o9_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_table
    from ..sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return profile_table(
        li, ["l_orderkey", "l_suppkey", "l_returnflag", "l_shipdate"]
    )


#: per-doc rule-violating mutations for the Gopher gate (same string
#: synthesis in both engines): 0 unchanged, 1 too short, 2 bullet wall,
#: 3 symbol wall, 4 ellipsis lines, 5 numeric non-alpha gibberish
_GOPHER_MUT_SQL = """
    CASE CAST(doc_id % 6 AS INT)
      WHEN 1 THEN 'short doc'
      WHEN 2 THEN '- item' || repeat(chr(10) || '- item', 9)
      WHEN 3 THEN repeat('# ', 30) || '#'
      WHEN 4 THEN text || repeat(chr(10) || 'and so on...', 5)
      WHEN 5 THEN repeat('111 222 333 ', 20)
      ELSE text
    END
"""


@pending(
    "txt_gopher_rules",
    oracle=f"""
    WITH m AS (SELECT doc_id, {_GOPHER_MUT_SQL} AS m FROM documents),
    feat AS (
      SELECT doc_id,
        list_filter(string_split(lower(m), ' '), x -> x != '') AS words,
        string_split(m, chr(10)) AS lines,
        CAST(length(m) - length(replace(m, '#', '')) AS BIGINT)
          + (length(m) - length(replace(m, '...', ''))) // 3 AS n_symbols
      FROM m),
    c AS (
      SELECT doc_id,
        CAST(len(words) AS BIGINT) AS n_words,
        CAST(length(array_to_string(words, '')) AS BIGINT) AS n_chars_in_words,
        n_symbols,
        CAST(len(lines) AS BIGINT) AS n_lines,
        CAST(len(list_filter(lines, l -> regexp_matches(l, '^[ \t]*([-*•‣▪●])'))) AS BIGINT) AS n_bullet_lines,
        CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.[ \t]*$'))) AS BIGINT) AS n_ellipsis_lines,
        CAST(len(list_filter(words, w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS n_alpha_words,
        CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                             s -> list_contains(words, s))) AS BIGINT) AS n_stop_hits
      FROM feat)
    SELECT doc_id, n_words, n_chars_in_words, n_symbols, n_lines,
           n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_hits,
           (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
           (n_chars_in_words >= 3 * n_words AND n_chars_in_words <= 10 * n_words) AS rule_mean_word_len,
           (10 * n_symbols <= n_words) AS rule_symbol_ratio,
           (10 * n_bullet_lines <= 9 * n_lines) AS rule_bullet_lines,
           (10 * n_ellipsis_lines <= 3 * n_lines) AS rule_ellipsis_lines,
           (10 * n_alpha_words >= 8 * n_words) AS rule_alpha_words,
           (n_stop_hits >= 2) AS rule_stopwords,
           ((n_words >= 50 AND n_words <= 100000)
            AND (n_chars_in_words >= 3 * n_words AND n_chars_in_words <= 10 * n_words)
            AND (10 * n_symbols <= n_words)
            AND (10 * n_bullet_lines <= 9 * n_lines)
            AND (10 * n_ellipsis_lines <= 3 * n_lines)
            AND (10 * n_alpha_words >= 8 * n_words)
            AND (n_stop_hits >= 2)) AS gopher_pass
    FROM c
    """,
    survey_ref="Gopher-style rule-based quality filtering (functions/"
    "gopher.py, Rae et al. 2021 SSA1.1 heuristics — the MassiveText/"
    "RefinedWeb-class auditable filter beside the learned "
    "txt_quality_classifier): word-count/mean-word-length/symbol-ratio/"
    "bullet-lines/ellipsis-lines/alpha-words/stopword rules, every ratio "
    "cleared to an integer inequality so thresholds are boundary-exact; "
    "gate plants one violation class per doc_id % 6 residue",
)
def txt_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.gopher import gopher_rules
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    d6 = (F.col("doc_id") % 6).cast("int")
    nl = F.lit("\n")
    mut = (
        F.when(d6 == 1, F.lit("short doc"))
        .when(d6 == 2, F.concat(F.lit("- item"), F.expr("repeat('\\n- item', 9)")))
        .when(d6 == 3, F.concat(F.expr("repeat('# ', 30)"), F.lit("#")))
        .when(d6 == 4, F.concat(F.col("text"), F.expr("repeat('\\nand so on...', 5)")))
        .when(d6 == 5, F.expr("repeat('111 222 333 ', 20)"))
        .otherwise(F.col("text"))
    )
    out = gopher_rules(F.col("m"))
    return docs.select("doc_id", mut.alias("m")).select(
        "doc_id", *[c.alias(k) for k, c in out.items()]
    )


@pending(
    "x17_salted_join",
    # the oracle is simply the UNSALTED join: salting must be invisible in
    # the result for any salt assignment — that is the operator's contract
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, l.l_linenumber, l.l_suppkey,
           CAST(l.l_quantity AS BIGINT) AS qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
    survey_ref="salted equi-join (operators/salted.py): the explicit "
    "hot-key mitigation — per-row salt on the skewed side, n_salts-way "
    "replication of the other side, join on (key, salt); result == plain "
    "join for ANY salt assignment (multiset-pinned in tests), which is "
    "why nondeterministic per-row salts are sound; complements AQE's "
    "skewedJoin for the cases it can't split (downstream same-key aggs, "
    "hash joins, single-key-exceeds-a-partition); hot-key wall measured "
    "flat in scripts/salted_skew.py",
)
def x17_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.salted import salted_join
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber", "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    out = salted_join(li, orders, ["k"], n_salts=8)
    return out.select(
        F.col("k").alias("o_orderkey"), "o_custkey", "l_linenumber",
        "l_suppkey", "qty",
    )


@pending(
    "sketch_percentiles_cont",
    oracle="""
    WITH s AS (SELECT n_chars AS v FROM documents WHERE n_chars IS NOT NULL),
    n AS (SELECT COUNT(*) AS n FROM s),
    ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM s),
    qs(q_num, q_den) AS (VALUES (1, 4), (1, 2), (3, 4), (9, 10)),
    spec AS (
      SELECT q_num, q_den,
             (q_num * (n.n - 1)) // q_den + 1 AS rank_lo,
             (q_num * (n.n - 1)) % q_den AS rem
      FROM qs CROSS JOIN n),
    j AS (
      SELECT s.q_num, s.q_den, s.rank_lo, s.rem,
             lo.v AS v_lo,
             hi.v AS v_hi
      FROM spec s
      JOIN ranked lo ON lo.rn = s.rank_lo
      JOIN ranked hi ON hi.rn = s.rank_lo + CASE WHEN s.rem > 0 THEN 1 ELSE 0 END)
    SELECT CAST(q_num AS INT) AS q_num, CAST(q_den AS INT) AS q_den,
           CAST(rank_lo AS BIGINT) AS rank_lo, CAST(rem AS BIGINT) AS rem,
           CAST(v_lo AS BIGINT) AS v_lo, CAST(v_hi AS BIGINT) AS v_hi,
           (v_lo * (q_den - rem) + v_hi * rem) / q_den AS value_cont
    FROM j
    """,
    survey_ref="exact interpolated percentiles (operators/sketches."
    "percentiles_cont — the SQL-standard percentile_cont convention "
    "p = q*(n-1) with linear interpolation, completing quantiles_exact's "
    "'disc' face): rational q gives exact integer bracketing ranks and "
    "interpolation weights, value as ONE integer-to-double division "
    "(IEEE-identical both engines); same two-pass histogram->refine core, "
    "no full sort",
)
def sketch_percentiles_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import percentiles_cont
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return percentiles_cont(
        docs.select(F.col("n_chars").alias("v")), "v",
        [(1, 4), (1, 2), (3, 4), (9, 10)],
    )


@pending(
    "o10_scd2_history",
    oracle="""
    WITH ev AS (SELECT event_id, epoch_ns(ts) AS ts_ns, user_id, event_type FROM events),
    ch AS (
      SELECT user_id, ts_ns, event_id, event_type,
             lag(event_type) OVER w AS prev_type
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
    v AS (SELECT * FROM ch WHERE prev_type IS NULL OR prev_type != event_type),
    iv AS (
      SELECT user_id, event_type, ts_ns AS valid_from,
             lead(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) AS valid_to,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) AS INT) AS version
      FROM v)
    SELECT user_id, event_type, valid_from, valid_to, version,
           (valid_to IS NULL) AS is_current
    FROM iv
    """,
    survey_ref="SCD2 (slowly-changing-dimension type 2) history build — "
    "the warehouse temporal-dimension primitive: per-user event_type "
    "change stream collapsed to consecutive-duplicate-free versions with "
    "[valid_from, valid_to) validity intervals, open-ended current row, "
    "monotone version numbers; ONE user_id exchange shared by the "
    "change-detect lag, interval lead, and version row_number (the S10 "
    "upsert sink's batch-side complement)",
)
def o10_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_ns").alias("valid_from"),
        F.lead("ts_ns").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("int").alias("version"),
        F.lead("ts_ns").over(w2).isNull().alias("is_current"),
    )


@pending(
    "corpus_tv_drift",
    # per-lang drift between the even- and odd-doc_id corpus halves: the
    # numerator is an exact integer (|a*N_b - b*N_a| summed), tv is ONE
    # float division of it
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS tok
      FROM documents),
    a AS (SELECT lang AS k, tok, CAST(COUNT(*) AS BIGINT) AS a
          FROM tok WHERE doc_id % 2 = 0 GROUP BY 1, 2),
    b AS (SELECT lang AS k, tok, CAST(COUNT(*) AS BIGINT) AS b
          FROM tok WHERE doc_id % 2 = 1 GROUP BY 1, 2),
    j AS (
      SELECT COALESCE(a.k, b.k) AS k, COALESCE(a.tok, b.tok) AS tok,
             COALESCE(a.a, 0) AS a, COALESCE(b.b, 0) AS b
      FROM a FULL OUTER JOIN b ON a.k = b.k AND a.tok = b.tok),
    tot AS (
      SELECT k, CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
      FROM j GROUP BY k),
    s AS (
      SELECT j.k, tot.n_a, tot.n_b,
             SUM(ABS(a::HUGEINT * tot.n_b - b::HUGEINT * tot.n_a)) AS tv_num
      FROM j JOIN tot USING (k) GROUP BY 1, 2, 3)
    SELECT k, n_a, n_b, CAST(tv_num AS BIGINT) AS tv_num,
           CAST(tv_num AS DOUBLE) / (2.0 * n_a * n_b) AS tv
    FROM s WHERE n_a > 0 AND n_b > 0
    """,
    survey_ref="corpus distribution drift as total-variation distance "
    "(operators/drift.py): per-lang token-distribution TV between the "
    "even/odd corpus halves — the monitoring primitive for crawl/mixture "
    "drift, chosen over KL/PSI/G because TV's numerator is an exact "
    "integer (sum |a*N_b - b*N_a|) both engines hash-match, with the "
    "distance itself ONE float division; one count join, empty sides "
    "dropped loudly",
)
def corpus_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import token_counts, tv_drift
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = token_counts(docs.filter(F.col("doc_id") % 2 == 0), "text", ["lang"])
    b = token_counts(docs.filter(F.col("doc_id") % 2 == 1), "text", ["lang"])
    out = tv_drift(a, b, ["lang"])
    return out.select(
        F.col("lang").alias("k"), "n_a", "n_b",
        F.col("tv_num").cast("long").alias("tv_num"), "tv",
    )


@pending(
    "g8_triangle_count",
    # deterministic graph synthesized from doc_id on BOTH engines: a path
    # with +1/+2 chords (one triangle per interior vertex) plus hub edges
    # (d -> d%23 and d -> d%23+1) that put every vertex in a triangle
    # with a consecutive hub pair — so the triangle distribution is
    # HEAVILY skewed at the 23 hubs, which is exactly the regime the
    # degree orientation exists for; the path (no wrap-around) keeps the
    # fixture free of any corpus-count dim — zero scalar joins
    oracle="""
    WITH e0 AS (
      SELECT doc_id AS s, doc_id + 1 AS t FROM documents
      UNION ALL
      SELECT doc_id, doc_id + 2 FROM documents
      UNION ALL
      SELECT doc_id, doc_id % 23 FROM documents
      UNION ALL
      SELECT doc_id, doc_id % 23 + 1 FROM documents
    ),
    e AS (SELECT DISTINCT LEAST(s, t) AS u, GREATEST(s, t) AS v
          FROM e0 WHERE s != t),
    tri AS (
      SELECT a.u AS x, a.v AS y, b.v AS z
      FROM e a
      JOIN e b ON b.u = a.v
      JOIN e c ON c.u = a.u AND c.v = b.v),
    nd AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM nd GROUP BY node
    """,
    survey_ref="distributed triangle counting (operators/triangles.py, "
    "Schank-Wagner forward / Suri-Vassilvitskii MapReduce formulation): "
    "per-vertex triangle participation via degree-ordered wedge closing "
    "— each edge oriented low-(deg,id) -> high, wedges generated at the "
    "apex (out-degree bounded by sqrt(2m) so a celebrity hub generates "
    "ZERO wedges instead of deg^2), closed by one (b,c) equi-join; the "
    "fixture's 23 hubs carry ~N/23 triangles each, pinning exactly the "
    "skew the orientation dismantles; oracle is the id-ordered 3-way "
    "self-join",
)
def g8_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.triangles import triangle_counts
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    e0 = (
        docs.select(d.alias("s"), (d + 1).alias("t"))
        .unionAll(docs.select(d.alias("s"), (d + 2).alias("t")))
        .unionAll(docs.select(d.alias("s"), (d % 23).alias("t")))
        .unionAll(docs.select(d.alias("s"), (d % 23 + 1).alias("t")))
    )
    return triangle_counts(e0, "s", "t")


@pending(
    "txt_pmi_cooccur",
    # directed skip-gram pairs at window 3; lift9 = the integer-scaled
    # PMI exponent floor(1e9 * n_xy * T / (n_x * n_y)) — ln is monotone
    # so PMI orderings are preserved and both engines truncate the same
    # DECIMAL/HUGEINT division identically
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x != '') AS t
      FROM documents),
    pr AS (
      SELECT t[i] AS w1, t[i + j] AS w2
      FROM tok,
           LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) ii,
           (SELECT unnest([1, 2, 3]) AS j) jj
      WHERE i + j <= len(t)),
    c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy FROM pr GROUP BY 1, 2),
    m AS (
      SELECT w1, w2, n_xy,
             SUM(n_xy) OVER (PARTITION BY w1) AS n_x,
             SUM(n_xy) OVER (PARTITION BY w2) AS n_y,
             SUM(n_xy) OVER () AS t_pairs
      FROM c)
    SELECT w1, w2, n_xy, CAST(n_x AS BIGINT) AS n_x, CAST(n_y AS BIGINT) AS n_y,
           CAST((n_xy::HUGEINT * t_pairs * 1000000000)
                // (n_x::HUGEINT * n_y) AS BIGINT) AS lift9
    FROM m WHERE n_xy >= 2
    """,
    survey_ref="skip-gram co-occurrence + PMI association "
    "(operators/cooccur.py): the (center, context) pair statistics "
    "word2vec/GloVe training data and collocation mining consume — pair "
    "generation is NOT a join (each doc zips its own token array against "
    "j-shifted slices of itself, so the only shuffle is the (w1,w2) hash "
    "agg; the naive position self-join shuffles the token stream twice "
    "and detonates on long docs); marginals as windows over the "
    "aggregated pair relation, corpus total as a 1-row broadcast dim, "
    "lift9 in the tfidf/bm25 exact-integer score convention",
)
def txt_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cooccur import pmi_cooccur
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return pmi_cooccur(docs, "text", window=3, min_count=2)


@pending(
    "dedup_snm_pairs",
    # lang-blocked sorted neighborhood: sort by (n_chars, 16-char
    # normalized prefix, doc_id), compare each record to its 3 sort
    # successors; dist is exact Levenshtein (ASCII corpus — the
    # fuzzy.py engine-parity envelope)
    oracle="""
    WITH s AS (
      SELECT doc_id, text, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY n_chars, substr(lower(text), 1, 16), doc_id) AS rn
      FROM documents),
    p AS (
      SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(b.rn - a.rn AS BIGINT) AS gap,
             CAST(levenshtein(a.text, b.text) AS INT) AS dist
      FROM s a JOIN s b
        ON a.lang = b.lang AND b.rn > a.rn AND b.rn <= a.rn + 3)
    SELECT lang, id_a, id_b, gap, dist FROM p
    """,
    survey_ref="sorted-neighborhood candidate generation (operators/"
    "snm.py, Hernandez-Stolfo 1995) — the third dedup candidate family "
    "beside hash blocking and LSH: ONE partitioned window over ONE "
    "exchange carries each record's 3 sort-successors out via lead() "
    "structs (no self-join, no O(n^2) block; text rides the sort instead "
    "of being re-joined by id), Levenshtein verify runs in the same task "
    "once per candidate; the oracle self-joins on rank distance — the "
    "formulation the operator exists to avoid",
)
def dedup_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.snm import sorted_neighborhood_pairs
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        docs,
        "doc_id",
        "text",
        ["lang"],
        [F.col("n_chars"), F.substring(F.lower(F.col("text")), 1, 16)],
        window=3,
    )


# ---------------------------------------------------------------------------
# round-8 fourth wave
# ---------------------------------------------------------------------------


@pending(
    "ev_markov_transitions",
    oracle=f"""
    WITH {EV_CTE},
    st AS (
      SELECT lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts_ns, event_id) AS from_state,
             event_type AS to_state
      FROM ev),
    c AS (
      SELECT from_state, to_state, COUNT(*) AS n
      FROM st WHERE from_state IS NOT NULL GROUP BY 1, 2),
    t AS (
      SELECT c.*, CAST(SUM(n) OVER (PARTITION BY from_state) AS BIGINT) AS n_from
      FROM c)
    SELECT from_state, to_state, n, n_from,
           CAST((1000000000 * n) // n_from AS BIGINT) AS prob9
    FROM t
    """,
    survey_ref="first-order Markov transition matrix (operators/markov.py) "
    "over per-user ordered event sequences — the corpus-level 'what "
    "follows what' of the reference's intra-block ordering analyses "
    "(sandwich front->victim->back, inspectors/sandwich.rs); ONE key "
    "shuffle for the lag (no self-join on consecutive ranks), transition "
    "hash-agg output bounded by |states|^2, prob9 normalization window "
    "over that bounded relation only; scaled-integer exact probabilities",
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.markov import transition_stats
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    return transition_stats(ev, "user_id", ["ts_ns", "event_id"], "event_type")


@pending(
    "x18_twap",
    oracle=f"""
    WITH {EV_CTE},
    s AS (
      SELECT user_id, event_id, ts_ns,
             (ts_ns - (ts_ns % 1000000 + 1000000) % 1000000) // 1000000 AS ms,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM ev),
    d AS (
      SELECT user_id, cents,
             COALESCE(lead(ms) OVER (
               PARTITION BY user_id ORDER BY ts_ns, event_id) - ms, 0) AS dur_ms
      FROM s),
    a AS (
      SELECT user_id AS key, COUNT(*) AS n_obs,
             CAST(SUM(dur_ms) AS BIGINT) AS span_ms,
             CAST(SUM(cents * dur_ms) AS BIGINT) AS num
      FROM d GROUP BY 1)
    SELECT key, n_obs, span_ms,
           CASE WHEN span_ms > 0 THEN
             (num // span_ms) * 10000000
             + ((num - (num // span_ms) * span_ms) * 10000000) // span_ms
           END AS twap9
    FROM a
    """,
    survey_ref="time-weighted average price (operators/twap.py) — the "
    "duration-weighted sibling of X4/X6's volume-weighted family, the "
    "benchmark for quote snapshots (db/cex_utils.rs bid/ask tables); "
    "piecewise-constant hold-until-next semantics, exact cents x "
    "millisecond integer arithmetic, twap9 = floor(1e9*dollars) via the "
    "overflow-safe two-step division; ONE key shuffle (lead window) + one "
    "map-side-combined aggregate",
)
def x18_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.twap import twap
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    return twap(ev, "user_id", "ts_ns", "value", "event_id")


@pending(
    "sample_stratified_n",
    oracle="""
    WITH r AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substr(md5(
                 'strat|' || lang || ':' || CAST(doc_id AS VARCHAR)
               ), 1, 15))::BIGINT, doc_id) AS rk
      FROM documents)
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 3
    """,
    survey_ref="stratified exact-n sampling (operators/sampling.py "
    "stratified_sample_exact_n) — the data-mixing draw: min(n, |stratum|) "
    "rows per language, rank = md5(salt, stratum, id) so the sample is a "
    "pure function of identity (re-partitioning or growing OTHER strata "
    "never changes a stratum's draw); rank<=n compiles to WindowGroupLimit "
    "so each task ships at most n rows per stratum into the exchange",
)
def sample_stratified_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import stratified_sample_exact_n
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_exact_n(docs, "lang", "doc_id", 3).select(
        "lang", "doc_id", "rk"
    )


@pending(
    "o11_skyline",
    # quadratic NOT-EXISTS dominance — the formulation the operator's
    # sweep exists to avoid (|distinct points|^2 pair checks)
    # axes chosen to DECORRELATE (count vs min single-order price — the
    # "many orders, none cheap" premium screen): total spend correlates
    # with order count so strongly that its frontier collapses to 1-2
    # points and the sweep has nothing to prune
    oracle="""
    WITH c AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS floor_c
      FROM orders GROUP BY 1),
    p AS (SELECT n_orders, floor_c, COUNT(*) AS n_cust FROM c GROUP BY 1, 2)
    SELECT CAST(a.n_orders AS BIGINT) AS n_orders, a.floor_c,
           CAST(a.n_cust AS BIGINT) AS n_cust
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.n_orders >= a.n_orders AND b.floor_c >= a.floor_c
        AND (b.n_orders > a.n_orders OR b.floor_c > a.floor_c))
    """,
    survey_ref="2-D skyline / Pareto frontier (operators/skyline.py) — "
    "multi-criteria pruning (the reference's inspectors rank bundles on "
    "several PnL axes at once, brontes-inspect composer ordering): "
    "distinct-point collapse + per-x champion (two hash aggregates) + ONE "
    "descending sweep window whose input is |distinct x|, with the "
    "partition-local pre-prune (dominance transitivity) as the "
    "high-cardinality path — prune_local=True here to keep the scale "
    "shape under test; exact integer cents",
)
def o11_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skyline import skyline_max2
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.min(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("floor_c"),
    )
    return (
        skyline_max2(cust, "n_orders", "floor_c", prune_local=True)
        .select(
            F.col("x").alias("n_orders"),
            F.col("y").alias("floor_c"),
            F.col("n_pts").alias("n_cust"),
        )
    )


@pending(
    "corpus_temperature_mix",
    oracle="""
    WITH c AS (SELECT source AS domain, COUNT(*) AS n FROM documents GROUP BY 1),
    s AS (
      SELECT domain, n,
             CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS s
      FROM c),
    t AS (SELECT CAST(SUM(s) AS BIGINT) AS s_total FROM s)
    SELECT domain, n, s,
           CAST((1000000000 * s) // s_total AS BIGINT) AS weight9
    FROM s, t
    """,
    survey_ref="temperature-2 corpus mixing weights (operators/mixing.py) "
    "— domain resampling p_i ∝ sqrt(n_i), the GPT-3/XLM-R rare-domain "
    "up-weighting; engine-exact because IEEE 754 REQUIRES sqrt correctly "
    "rounded (floor∘sqrt is the contract, identical in both engines even "
    "in the near-perfect-square twilight), then pure-bigint weight9; one "
    "map-side-combined aggregate to |domains| rows, 1-row scalar total "
    "dim joined on a literal (the bm25 constant-folded broadcast); "
    "general-T float path exists but is pytest-only by policy",
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixing import temperature_weights_sqrt
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return temperature_weights_sqrt(docs, "source")


def _kcore_oracle(k: int, rounds: int) -> str:
    edges = """
      SELECT DISTINCT LEAST(s, t) AS s, GREATEST(s, t) AS t FROM (
        SELECT doc_id AS s, doc_id // 2 AS t FROM documents
        UNION ALL
        SELECT doc_id AS s, doc_id // 3 AS t FROM documents
      ) raw WHERE s != t"""
    ctes = [f"e0 AS ({edges})"]
    for r in range(rounds + 1):
        ctes.append(
            f"d{r} AS (SELECT node, COUNT(*) AS deg FROM ("
            f"SELECT s AS node FROM e{r} UNION ALL SELECT t FROM e{r}"
            f") u GROUP BY node)"
        )
        if r == rounds:
            break
        ctes.append(f"k{r} AS (SELECT node FROM d{r} WHERE deg >= {k})")
        ctes.append(
            f"e{r + 1} AS (SELECT s, t FROM e{r} "
            f"WHERE s IN (SELECT node FROM k{r}) "
            f"AND t IN (SELECT node FROM k{r}))"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, CAST(deg AS BIGINT) AS deg FROM d{rounds}"
    )


@pending(
    "g9_kcore",
    oracle=None,  # set below: generated unrolled-peel twin
    survey_ref="k-core decomposition by fixed-round peeling "
    "(operators/kcore.py) — the density screen of iterative graph "
    "analytics (G3's 'prune the periphery first' generalized): each round "
    "is one degree aggregate + two semi-joins, lineage cut per round "
    "(each round reads the previous edge set TWICE, so the localCheckpoint "
    "prevents quadratic re-execution, not just plan bloat); the division "
    "tree (d->d//2, d->d//3) cascades a genuine multi-round peel (996 -> "
    "494 -> 244 -> 120 -> 58 edges at sf0.01, k=3); DuckDB twin replays "
    "the SAME 4 rounds as generated unrolled CTEs — the g7_pagerank "
    "pattern for fixpoint-free exact parity",
)
def g9_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kcore import peel_rounds
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    edges = docs.select(d.alias("s"), (d / 2).cast("long").alias("t")).unionAll(
        docs.select(d.alias("s"), (d / 3).cast("long").alias("t"))
    )
    return peel_rounds(edges, k=3, rounds=4)


PENDING["g9_kcore"] = QuerySpec(
    name="g9_kcore",
    build=PENDING["g9_kcore"].build,
    oracle=_kcore_oracle(k=3, rounds=4),
    survey_ref=PENDING["g9_kcore"].survey_ref,
)


@pending(
    "txt_bpe_pair_stats",
    # the first BPE training iteration's pair table: adjacent-character
    # counts weighted by word frequency, total-ordered top 40
    oracle="""
    WITH wx AS (
      SELECT x FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS x FROM documents) u
      WHERE regexp_matches(x, '^[a-z]+$')),
    wd AS (SELECT x AS word, COUNT(*) AS n FROM wx GROUP BY 1),
    pr AS (
      SELECT substr(word, CAST(i AS INT), 1) AS a,
             substr(word, CAST(i AS INT) + 1, 1) AS b, n
      FROM wd, LATERAL (SELECT unnest(range(1, length(word))) AS i) ii),
    ag AS (SELECT a, b, CAST(SUM(n) AS BIGINT) AS pair_n FROM pr GROUP BY 1, 2)
    SELECT a, b, pair_n FROM ag ORDER BY pair_n DESC, a, b LIMIT 40
    """,
    survey_ref="BPE tokenizer training, stats step (operators/bpe.py) — "
    "Sennrich et al. 2016: the pair-count relation the merge argmax reads; "
    "the scale contract is ONE corpus scan into the (word, n) vocabulary, "
    "after which every merge round runs on the VOCAB relation (bounded by "
    "distinct words, not corpus tokens) — bpe_train's loop + regex merge "
    "semantics (left-to-right greedy, whole-symbol lookaround anchors) are "
    "pinned against an independent list-walk Python reference in "
    "tests/test_bpe.py; ascii_only keeps per-char arithmetic "
    "codepoint-agnostic across engines (the fuzzy.py lesson)",
)
def txt_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import initial_symbols, pair_stats, word_vocabulary
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab = initial_symbols(word_vocabulary(docs, "text"), end_marker=False)
    return (
        pair_stats(vocab)
        .orderBy(F.col("pair_n").desc(), F.col("a"), F.col("b"))
        .limit(40)
    )


@pending(
    "x19_ols_trend",
    # the DuckDB twin runs the SAME exact-integer closed form in HUGEINT
    # (int128) where Spark uses decimal(38,0). BOTH engines' integer
    # division truncates toward zero (duckdb's `//` floors only for
    # DOUBLEs — measured: -7 // 2 = -3), so BOTH sides carry the same
    # explicit floor adjustment for negative numerators
    oracle=f"""
    WITH {EV_CTE},
    b AS (
      SELECT user_id,
             (ts_ns - (ts_ns % 1000000000 + 1000000000) % 1000000000)
               // 1000000000 AS t_raw,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM ev),
    r AS (
      SELECT user_id,
             t_raw - MIN(t_raw) OVER (PARTITION BY user_id) AS t, y
      FROM b),
    a AS (
      SELECT user_id, COUNT(*) AS n, MAX(t) AS t_span,
             CAST(SUM(t) AS HUGEINT) AS st, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(t * y) AS HUGEINT) AS sty,
             CAST(SUM(t * t) AS HUGEINT) AS stt
      FROM r GROUP BY 1),
    f AS (
      SELECT user_id, n, t_span,
             n * sty - st * sy AS num, n * stt - st * st AS den, sy, st
      FROM a)
    SELECT user_id AS key, CAST(n AS BIGINT) AS n,
           CAST(t_span AS BIGINT) AS t_span,
           CAST(CASE WHEN den = 0 THEN NULL
                WHEN num >= 0 THEN (num * 1000000000) // den
                ELSE ((num * 1000000000) - (den - 1)) // den
                END AS BIGINT) AS slope9,
           CAST(CASE WHEN den = 0 THEN NULL
                WHEN sy * den * 1000000000 - num * 1000000000 * st >= 0
                THEN (sy * den * 1000000000 - num * 1000000000 * st)
                     // (n * den)
                ELSE ((sy * den * 1000000000 - num * 1000000000 * st)
                      - (n * den - 1)) // (n * den)
                END AS BIGINT) AS intercept9
    FROM f
    """,
    survey_ref="group-wise exact-integer OLS trend (operators/ols.py) — "
    "per-user least-squares value-vs-time slope, the ordered-data sibling "
    "of I14's mean+2σ screen: per-key t re-basing (window and aggregate "
    "share ONE key exchange), bigint sums, cross-products lifted to "
    "decimal(38,0) vs the twin's HUGEINT, floor-adjusted `div` vs native "
    "`//` for negative numerators; slope9/intercept9 = floor(1e9·b), "
    "floor(1e9·a) — engine-exact, no doubles anywhere",
)
def x19_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ols import ols_trend
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return ols_trend(
        ev.select("user_id", "ts_ns", cents.alias("cents")),
        "user_id",
        "ts_ns",
        "cents",
        t_unit=1_000_000_000,
    ).select(
        F.col("user_id").alias("key"), "n", "t_span", "slope9", "intercept9"
    )


@pending(
    "ev_attribution_linear",
    # the oracle is the inequality self-join the operator's bucket-banded
    # composition exists to avoid at scale
    oracle=f"""
    WITH {EV_CTE},
    c AS (SELECT user_id, event_id AS conv_id, ts_ns AS conv_ts
          FROM ev WHERE event_type = 'purchase'),
    t AS (SELECT user_id, event_id AS touch_id, ts_ns AS touch_ts
          FROM ev WHERE event_type = 'view'),
    p AS (
      SELECT c.user_id AS key, conv_id, touch_id,
             conv_ts - touch_ts AS gap_ns, touch_ts
      FROM c JOIN t ON c.user_id = t.user_id
        AND t.touch_ts <= c.conv_ts
        AND t.touch_ts >= c.conv_ts - 259200000000000),
    w AS (
      SELECT key, conv_id, touch_id, gap_ns, touch_ts,
             COUNT(*) OVER (PARTITION BY conv_id) AS n_touch,
             MIN(touch_ts) OVER (PARTITION BY conv_id) AS f_ts,
             MAX(touch_ts) OVER (PARTITION BY conv_id) AS l_ts
      FROM p)
    SELECT key, conv_id, touch_id, gap_ns, CAST(n_touch AS BIGINT) AS n_touch,
           CAST(1000000000 // n_touch AS BIGINT) AS credit9,
           touch_ts = f_ts AS is_first, touch_ts = l_ts AS is_last
    FROM w
    """,
    survey_ref="multi-touch linear attribution (operators/attribution.py) "
    "— view->purchase credit split over a 72h lookback: pair generation "
    "COMPOSES the bucket-banded interval join (x16's equi-join scale "
    "shape — never the oracle's inequality self-join), credit "
    "normalization + first/last-touch flags share ONE conv-keyed window "
    "exchange; credit9 = floor(1e9/n_touch) exact; last-touch alone "
    "reduces to X1's as-of join, making this its many-to-many elder",
)
def ev_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.attribution import linear_attribution
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    return linear_attribution(
        ev,
        "user_id",
        "ts_ns",
        "event_id",
        "event_type",
        touch_type="view",
        conv_type="purchase",
        horizon_ns=259_200_000_000_000,  # 72h
    )


def _labelprop_oracle(rounds: int) -> str:
    ctes = [
        """e0 AS (
      SELECT DISTINCT LEAST(s, t) AS s, GREATEST(s, t) AS t FROM (
        SELECT doc_id AS s, doc_id + 1 AS t FROM documents
        UNION ALL
        SELECT doc_id AS s, (doc_id // 50) * 50 AS t FROM documents
      ) raw WHERE s != t)""",
        "bidir AS (SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0)",
        "l0 AS (SELECT DISTINCT s AS node, s AS label FROM bidir)",
    ]
    for r in range(rounds):
        ctes.append(
            f"""l{r + 1} AS (
      SELECT node, n_label AS label FROM (
        SELECT b.s AS node, l.label AS n_label, COUNT(*) AS cnt,
               row_number() OVER (PARTITION BY b.s
                                  ORDER BY COUNT(*) DESC, l.label) AS rn
        FROM bidir b JOIN l{r} l ON l.node = b.t
        GROUP BY b.s, l.label) x WHERE rn = 1)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, label FROM l{rounds}"
    )


@pending(
    "g10_label_prop",
    oracle=None,  # set below: generated unrolled-round twin
    survey_ref="synchronous label propagation (operators/labelprop.py, "
    "Raghavan et al. 2007 made deterministic: simultaneous updates + "
    "total (count DESC, label ASC) tie order) — community detection "
    "completing the iterative graph family (CC, PageRank, k-core, "
    "triangles); one edge⋈label join + one count agg + one argmax per "
    "round, lineage cut per round; the chain+block-hub fixture (d—d+1, "
    "d—50-block hub) converges to block communities; DuckDB twin replays "
    "the SAME 3 rounds as generated CTEs (the g7/g9 pattern); staged for "
    "the r10 promotion tier (the r9 window is exactly full — see header)",
)
def g10_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.labelprop import label_propagation
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    edges = docs.select(d.alias("s"), (d + 1).alias("t")).unionAll(
        docs.select(d.alias("s"), ((d / 50).cast("long") * 50).alias("t"))
    )
    return label_propagation(edges, rounds=3)


PENDING["g10_label_prop"] = QuerySpec(
    name="g10_label_prop",
    build=PENDING["g10_label_prop"].build,
    oracle=_labelprop_oracle(rounds=3),
    survey_ref=PENDING["g10_label_prop"].survey_ref,
)


@pending(
    "o12_rrf_fusion",
    # two REAL single-criterion retrievers (parts by revenue, parts by
    # ship volume) fused; the relational shape is identical to fusing
    # BM25 + dense-ANN lists (tests pin that composition directly)
    oracle="""
    WITH rev AS (
      SELECT l_returnflag AS query, l_partkey AS id,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))) DESC,
                        l_partkey) AS rk
      FROM lineitem GROUP BY l_returnflag, l_partkey),
    qty AS (
      SELECT l_returnflag AS query, l_partkey AS id,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY SUM(l_quantity) DESC, l_partkey) AS rk
      FROM lineitem GROUP BY l_returnflag, l_partkey),
    u AS (
      SELECT query, id, 1000000000 // (60 + rk) AS term
      FROM (SELECT * FROM rev WHERE rk <= 20
            UNION ALL SELECT * FROM qty WHERE rk <= 20) z),
    f AS (
      SELECT query, id, CAST(COUNT(*) AS BIGINT) AS n_lists,
             CAST(SUM(term) AS BIGINT) AS score9
      FROM u GROUP BY query, id),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY query ORDER BY score9 DESC, id) AS fused_rank
      FROM f)
    SELECT query, id, n_lists, score9, CAST(fused_rank AS BIGINT) AS fused_rank
    FROM r WHERE fused_rank <= 10
    """,
    survey_ref="Reciprocal Rank Fusion (operators/fusion.py, Cormack et "
    "al. 2009) — the hybrid-retrieval merge (BM25 + dense ANN + recency) "
    "that needs ranks only, no score calibration: per-term "
    "floor(1e9/(k+rank)) keeps the fused score an exact bigint; union of "
    "top-N lists + one hash agg + WindowGroupLimit top-k, nothing "
    "data-sized (the retrievers upstream did the heavy work); staged for "
    "the r10 promotion tier",
)
def o12_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fusion import rrf_fuse
    from ..sources.testdata import load_table
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")

    def ranked(order_expr):
        agg = li.groupBy(
            F.col("l_returnflag").alias("query"),
            F.col("l_partkey").alias("id"),
        ).agg(order_expr.alias("_v"))
        w = W.partitionBy("query").orderBy(F.col("_v").desc(), F.col("id"))
        return (
            agg.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 20)
            .select("query", "id", "rk")
        )

    rev = ranked(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")))
    qty = ranked(F.sum("l_quantity"))
    return rrf_fuse([rev, qty], "query", "id", "rk", k=60, top=10)


@pending(
    "x20_pearson_corr",
    # the single double step (int64->double, *, sqrt, /) is correctly
    # rounded at every operation in both engines, so the floor agrees;
    # casting num/d1/d2 to BIGINT before DOUBLE keeps both sides on the
    # same int64->double conversion (never a >2^53 decimal/HUGEINT cast)
    oracle=f"""
    WITH {EV_CTE},
    b AS (
      SELECT user_id,
             (ts_ns - (ts_ns % 1000000000 + 1000000000) % 1000000000)
               // 1000000000 AS t_raw,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM ev),
    r AS (
      SELECT user_id,
             t_raw - MIN(t_raw) OVER (PARTITION BY user_id) AS t, y
      FROM b),
    a AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(t) AS HUGEINT) AS st, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(t * y) AS HUGEINT) AS sty,
             CAST(SUM(t * t) AS HUGEINT) AS stt,
             CAST(SUM(y * y) AS HUGEINT) AS syy
      FROM r GROUP BY 1),
    f AS (
      SELECT user_id, n,
             CAST(n * sty - st * sy AS BIGINT) AS num,
             CAST(n * stt - st * st AS BIGINT) AS d1,
             CAST(n * syy - sy * sy AS BIGINT) AS d2
      FROM a)
    SELECT user_id AS key, CAST(n AS BIGINT) AS n,
           CASE WHEN d1 > 0 AND d2 > 0 THEN
             CAST(FLOOR(1000000000.0 * CAST(num AS DOUBLE)
                  / SQRT(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)))
                  AS BIGINT)
           END AS corr9
    FROM f
    """,
    survey_ref="per-key Pearson correlation (operators/ols.pearson_corr) "
    "— bivariate statistics on the OLS exact-sum core: integer num/d1/d2, "
    "ONE final double chain (int64→double, *, IEEE sqrt, /) where every "
    "op is correctly rounded so both engines produce the bit-identical "
    "double and the corr9 floor agrees; one key exchange (window+agg "
    "share it); staged for the r10 promotion tier",
)
def x20_pearson_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ols import pearson_corr
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return pearson_corr(
        ev.select("user_id", "ts_ns", cents.alias("cents")),
        "user_id",
        "ts_ns",
        "cents",
        t_unit=1_000_000_000,
    ).select(F.col("user_id").alias("key"), "n", "corr9")


@pending(
    "x21_rolling_distinct",
    # 7-day rolling distinct users per day; the oracle is the W-scan
    # correlated form the operator's collapse+explode exists to avoid
    oracle=f"""
    WITH {EV_CTE},
    a AS (
      SELECT DISTINCT user_id AS key,
             (ts_ns - (ts_ns % 86400000000000 + 86400000000000)
              % 86400000000000) // 86400000000000 AS day
      FROM ev),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM a),
    grid AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM span)
    SELECT g.day AS day,
           CAST((SELECT COUNT(DISTINCT key) FROM a
                 WHERE a.day BETWEEN g.day - 6 AND g.day) AS BIGINT)
             AS n_active
    FROM grid g
    """,
    survey_ref="sliding-window distinct counts / rolling WAU "
    "(operators/rolling_distinct.py) — COUNT(DISTINCT) does not "
    "decompose over sliding windows, so: collapse to distinct (key, day) "
    "FIRST (bounds all later work by active-key-days, not events), "
    "explode each into its W visible report days, one distinct agg per "
    "report day; span-grid zero-fill without a calendar join; the "
    "HLL-merge swap-in for W>90 documented; staged for the r10 tier",
)
def x21_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rolling_distinct import rolling_distinct
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    return rolling_distinct(ev, "user_id", "ts_ns", window_days=7)


def _hits_oracle(rounds: int) -> str:
    ctes = [
        """e AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        "nodes AS (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT DISTINCT dst FROM e)",
        "h0 AS (SELECT node, CAST(1 AS BIGINT) AS hub FROM nodes)",
    ]
    for r in range(rounds):
        ctes.append(
            f"""a{r + 1} AS (
      SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS auth
      FROM nodes n LEFT JOIN (
        SELECT e.dst, SUM(h.hub) AS s
        FROM e JOIN h{r} h ON h.node = e.src GROUP BY e.dst) s
      ON s.dst = n.node)"""
        )
        ctes.append(
            f"""h{r + 1} AS (
      SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS hub
      FROM nodes n LEFT JOIN (
        SELECT e.src, SUM(a.auth) AS s
        FROM e JOIN a{r + 1} a ON a.node = e.dst GROUP BY e.src) s
      ON s.src = n.node)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a.node, a.auth, h.hub FROM a{rounds} a "
        f"JOIN h{rounds} h ON h.node = a.node"
    )


@pending(
    "g11_hits",
    oracle=None,  # set below: generated unrolled-round twin
    survey_ref="fixed-round integer HITS (operators/hits.py, Kleinberg "
    "1999) — hubs & authorities over the directed customer->supplier "
    "trade graph, completing the centrality family beside PageRank: "
    "normalization dropped (a positive per-round scalar — rankings and "
    "within-side ratios unchanged) so every score stays an exact bigint "
    "the unrolled-CTE DuckDB twin reproduces digit-for-digit; two joins "
    "+ two aggregates per round over the cached edge list, lineage cut "
    "per round; magnitude envelope documented (deg^(2·rounds) under "
    "2^63); staged for the r10 tier",
)
def g11_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.hits import hits_integer
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    return hits_integer(pairs, rounds=2)


PENDING["g11_hits"] = QuerySpec(
    name="g11_hits",
    build=PENDING["g11_hits"].build,
    oracle=_hits_oracle(rounds=2),
    survey_ref=PENDING["g11_hits"].survey_ref,
)


@pending(
    "o13_table_diff",
    # old = orders as-is; new = deterministic in-plan mutation (drop
    # %97-keys, flip priority on %89-keys, add shifted synthetic keys) —
    # both engines synthesize the identical 'new' snapshot
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders),
    new AS (
      SELECT o_orderkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 89 = 0 THEN 'X-FLIPPED'
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders WHERE o_orderkey % 97 != 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'Z', 'SYNTH'
      FROM orders WHERE o_orderkey % 101 = 0),
    j AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_orderkey IS NOT NULL AS in_old,
             n.o_orderkey IS NOT NULL AS in_new,
             o.o_orderstatus IS DISTINCT FROM n.o_orderstatus AS d_status,
             o.o_orderpriority IS DISTINCT FROM n.o_orderpriority AS d_prio
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
    SELECT o_orderkey,
           CASE WHEN in_old AND NOT in_new THEN 'removed'
                WHEN in_new AND NOT in_old THEN 'added'
                ELSE 'changed' END AS status,
           CASE WHEN in_old AND in_new THEN
             concat_ws(',',
               CASE WHEN d_status THEN 'o_orderstatus' END,
               CASE WHEN d_prio THEN 'o_orderpriority' END)
           ELSE '' END AS changed_cols
    FROM j
    WHERE (NOT in_old) OR (NOT in_new) OR d_status OR d_prio
    """,
    survey_ref="keyed table diff (operators/table_diff.py) — the "
    "migration/backfill/CDC validation primitive (re-run a block range "
    "after a classifier fix, diff the MevBlocks): ONE full-outer hash "
    "join, NULL-safe per-column comparison vector in pure codegen, "
    "detail output bounded by the true change set (the unchanged bulk "
    "is dropped; diff_counts reports it from the same join); staged for "
    "the r10 tier",
)
def o13_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.table_diff import table_diff
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    old = orders.select("o_orderkey", "o_orderstatus", "o_orderpriority")
    k = F.col("o_orderkey")
    new = (
        old.filter(k % 97 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(k % 89 == 0, F.lit("X-FLIPPED"))
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
        )
        .unionAll(
            old.filter(k % 101 == 0).select(
                (k + 100_000_000).alias("o_orderkey"),
                F.lit("Z").alias("o_orderstatus"),
                F.lit("SYNTH").alias("o_orderpriority"),
            )
        )
    )
    return table_diff(old, new, ["o_orderkey"])


@pending(
    "x22_winsorize",
    # per-event-type winsorized value stats at [p5, p95]; positional
    # percentile_disc bounds via exact integer rank selection
    oracle=f"""
    WITH {EV_CTE},
    v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
             event_id
      FROM ev),
    r AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY c, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    b AS (
      SELECT event_type,
             MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN c END) AS lo,
             MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN c END) AS hi
      FROM r GROUP BY event_type),
    w AS (
      SELECT v.event_type,
             LEAST(GREATEST(v.c, b.lo), b.hi) AS wc
      FROM v JOIN b ON b.event_type = v.event_type)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(wc) AS BIGINT) AS lo_c, CAST(MAX(wc) AS BIGINT) AS hi_c,
           CAST(SUM(wc) AS BIGINT) AS sum_c
    FROM w GROUP BY event_type
    """,
    survey_ref="group-wise winsorization (operators/winsorize.py) — clip "
    "to empirical [p5, p95] per event type, the repair sibling of x12's "
    "MAD detection: positional percentile_disc bounds via exact integer "
    "rank ceil(q·n) (no float touches rank selection), ONE key-shuffle "
    "window pass + |keys|-row broadcast bounds join; winsorized sums "
    "exact in cents; staged for the r10 tier",
)
def x22_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.winsorize import winsorize
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = winsorize(
        ev.select("event_type", cents.alias("c"), "event_id"),
        "event_type",
        "c",
        "event_id",
        q_lo=(5, 100),
        q_hi=(95, 100),
    )
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("clamped").alias("lo_c"),
        F.max("clamped").alias("hi_c"),
        F.sum("clamped").alias("sum_c"),
    )


@pending(
    "o14_dq_checks",
    # a clean-data suite (zeros) plus checks DESIGNED to fire on the
    # testdata (range tighter than reality, FK against a filtered parent)
    # so the gate proves both directions
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS n_violations
    FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders
          GROUP BY 1 HAVING COUNT(*) > 1) d
    UNION ALL
    SELECT 'lineitem_orderkey_not_null',
           CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'returnflag_domain',
           CAST(COUNT(*) FILTER (l_returnflag NOT IN ('A','N','R')
                                 OR l_returnflag IS NULL) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'lineitem_fk_even_orders_only',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l LEFT JOIN (
      SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0) o
      ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'quantity_in_1_50',
           CAST(COUNT(*) FILTER (l_quantity IS NULL OR l_quantity < 1
                                 OR l_quantity > 50) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'quantity_in_1_10_fires',
           CAST(COUNT(*) FILTER (l_quantity IS NULL OR l_quantity < 1
                                 OR l_quantity > 10) AS BIGINT)
    FROM lineitem
    """,
    survey_ref="declarative data-quality checks (operators/dq.py — the "
    "dbt-tests/Deequ surface): unique / not-null / accepted-values / "
    "referential-integrity / range constraints each compiled to one "
    "scan+aggregate or anti-join, unioned into a (check, n_violations) "
    "report; the gate runs a clean suite (zeros) AND deliberately-firing "
    "checks (tightened range, filtered parent) so both directions are "
    "pinned; staged for the r10 tier",
)
def o14_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dq import (
        check_accepted,
        check_foreign_key,
        check_in_range,
        check_not_null,
        check_unique,
        run_checks,
    )
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    even_orders = orders.filter(F.col("o_orderkey") % 2 == 0)
    return run_checks([
        check_unique(orders, ["o_orderkey"], "orders_pk_unique"),
        check_not_null(li, "l_orderkey", "lineitem_orderkey_not_null"),
        check_accepted(li, "l_returnflag", ["A", "N", "R"], "returnflag_domain"),
        check_foreign_key(li, "l_orderkey", orders, "o_orderkey",
                          "lineitem_fk_orders"),
        check_foreign_key(li, "l_orderkey", even_orders, "o_orderkey",
                          "lineitem_fk_even_orders_only"),
        check_in_range(li, "l_quantity", 1, 50, "quantity_in_1_50"),
        check_in_range(li, "l_quantity", 1, 10, "quantity_in_1_10_fires"),
    ])


@pending(
    "x23_cusum",
    # every statistic is an exact bigint: cents enter via the decimal cast,
    # mu0/k/h are integer literals, and both engines run the identical
    # prefix-sum / running-min windows over the identical total order
    oracle=f"""
    WITH {EV_CTE},
    b AS (
      SELECT user_id, event_id, ts_ns,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM ev),
    p AS (
      SELECT user_id, ts_ns,
             SUM(cents - 5000 - 500) OVER w AS pp,
             SUM(5000 - cents - 500) OVER w AS pn
      FROM b
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id
                   ROWS UNBOUNDED PRECEDING)),
    s AS (
      SELECT user_id, ts_ns,
             pp - LEAST(0, MIN(pp) OVER w) AS sp,
             pn - LEAST(0, MIN(pn) OVER w) AS sn
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns
                   ROWS UNBOUNDED PRECEDING))
    SELECT user_id AS key, COUNT(*) AS n,
           CAST(MAX(sp) AS BIGINT) AS max_pos,
           CAST(MAX(sn) AS BIGINT) AS max_neg,
           CAST(COALESCE(SUM(CASE WHEN sp > 50000 OR sn > 50000
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_alarm_rows,
           MIN(CASE WHEN sp > 50000 OR sn > 50000 THEN ts_ns END)
             AS first_alarm_ts
    FROM s GROUP BY 1
    """,
    survey_ref="CUSUM change-point detection (operators/changepoint.py) — "
    "Page's sequential drift detector, the ORDERED sibling of I14's "
    "mean+2sigma screen. The max(0, S+d) recursion that looks like a "
    "sequential fold collapses to prefix-sum minus running-min, so the "
    "whole detector is ONE key-partitioned ordered window (running sum, "
    "running min over it, per-key summary aggregate — all on a single "
    "exchange, pure codegen, no UDF); exact integer cents against "
    "mu0=5000c k=500c h=50000c fires 24 up-drift and 11 down-drift users "
    "of 150 at sf0.01, exercising both sides; the resetting variant is "
    "documented as genuinely sequential and deliberately out; staged for "
    "the r10 promotion tier",
)
def x23_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.changepoint import cusum_summary
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    rows = ev.select(
        "user_id", "event_id", "ts_ns", cents.alias("cents")
    )
    return cusum_summary(
        rows,
        "user_id",
        ["ts_ns", "event_id"],
        "ts_ns",
        "cents",
        target=5000,
        allowance=500,
        threshold=50000,
    ).select(F.col("user_id").alias("key"), "n", "max_pos", "max_neg",
             "n_alarm_rows", "first_alarm_ts")


def _bfs_oracle(rounds: int) -> str:
    ctes = [
        """eraw AS (
      SELECT DISTINCT 'c' || o_custkey AS s, 's' || l_suppkey AS t
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        "edges AS (SELECT s, t FROM eraw UNION ALL SELECT t AS s, s AS t FROM eraw)",
        """d0 AS (
      SELECT 's' || s_suppkey AS node, 0 AS dist, 's' || s_suppkey AS root
      FROM supplier WHERE s_suppkey % 10 = 0)""",
        "f0 AS (SELECT node, root FROM d0)",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""c{r} AS (
      SELECT e.t AS node, MIN(f.root) AS root
      FROM edges e JOIN f{r - 1} f ON f.node = e.s GROUP BY e.t)"""
        )
        ctes.append(
            f"""n{r} AS (
      SELECT c.node, {r} AS dist, c.root
      FROM c{r} c LEFT JOIN d{r - 1} d ON d.node = c.node
      WHERE d.node IS NULL)"""
        )
        ctes.append(
            f"d{r} AS (SELECT * FROM d{r - 1} UNION ALL SELECT * FROM n{r})"
        )
        ctes.append(f"f{r} AS (SELECT node, root FROM n{r})")
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, dist, root FROM d{rounds}"


@pending(
    "g12_bfs_hops",
    oracle=None,  # set below: generated unrolled-round twin
    survey_ref="distributed multi-source BFS with nearest-seed assignment "
    "(operators/bfs.py) — the scale-out member of the reference's G2 "
    "graph-walk family (its driver-side Dijkstra is right for the ~1e4-node "
    "token graph; this is for graphs that do NOT fit a driver): hop "
    "distance + graph-Voronoi root labels from 10 seed suppliers over the "
    "DEDUPED bidirected trade graph, 3 rounds; per round ONE edge hash "
    "join + one min-root agg + one anti-join, frontier shrinks as the "
    "ball saturates, lineage cut per round; smallest-root tie-break makes "
    "it a pure function of (edges, seeds, rounds) so the DuckDB twin "
    "replays the SAME rounds as generated CTEs (g7/g9/g10 pattern); "
    "staged for the r10 promotion tier",
)
def g12_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bfs import bfs_nearest_seed
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("s"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("t"),
        )
        .distinct()
    )
    edges = pairs.unionAll(
        pairs.select(F.col("t").alias("s"), F.col("s").alias("t"))
    )
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    return bfs_nearest_seed(edges, seeds, rounds=3)


PENDING["g12_bfs_hops"] = QuerySpec(
    name="g12_bfs_hops",
    build=PENDING["g12_bfs_hops"].build,
    oracle=_bfs_oracle(rounds=3),
    survey_ref=PENDING["g12_bfs_hops"].survey_ref,
)


@pending(
    "txt_chi2_features",
    # every quantity is a COUNT, so chi2 is an exact rational: both
    # engines build num = 1e9*N*det^2 in wide integers (decimal(38,0) /
    # HUGEINT) and take ONE positive-operand integer division
    oracle="""
    WITH tok AS (
      SELECT lang,
             list_distinct(list_filter(string_split(lower(text), ' '),
                                       x -> x != '')) AS toks
      FROM documents),
    nc AS (SELECT lang, COUNT(*) AS n_class FROM tok GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    occ AS (SELECT lang, unnest(toks) AS term FROM tok),
    ac AS (SELECT lang AS class, term, COUNT(*) AS a FROM occ GROUP BY 1, 2),
    wd AS (SELECT class, term, a,
                  CAST(SUM(a) OVER (PARTITION BY term) AS BIGINT) AS df
           FROM ac),
    f AS (SELECT w.class, w.term, w.a, w.df, nc.n_class, tot.n
          FROM wd w JOIN nc ON nc.lang = w.class CROSS JOIN tot),
    g AS (SELECT class, term, a, df, n_class, n,
                 a * (n - df - n_class + a)
                   - (df - a) * (n_class - a) AS det,
                 df * (n - df) * n_class * (n - n_class) AS den
          FROM f),
    h AS (SELECT class, term, a, df, n_class,
                 CAST((CAST(1000000000 AS HUGEINT) * n * det * det) // den
                      AS BIGINT) AS chi2_9
          FROM g WHERE den > 0),
    r AS (SELECT *, row_number() OVER (PARTITION BY class
                                       ORDER BY chi2_9 DESC, term) AS rank
          FROM h)
    SELECT class, term, a, df, n_class, chi2_9, rank
    FROM r WHERE rank <= 25
    """,
    survey_ref="chi-squared feature selection (operators/chi2.py) — the "
    "vocabulary screen behind fastText-style quality/langid classifier "
    "training (C4/CCNet lineage): presence-based 2x2 contingency per "
    "(term, class) with chi2_9 = floor(1e9*N*det^2/den) in exact wide "
    "integers; ONE distinct-(doc,term) explode scan, df as a window over "
    "the term partition (no second scan), broadcast class sizes, "
    "constant-folded N dim, rank<=25 via WindowGroupLimit; degenerate "
    "df==N / n_class==N strata excluded on both engines; staged for the "
    "r10 promotion tier",
)
def txt_chi2_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import ws_tokens
    from ..operators.chi2 import chi2_topk_terms
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return chi2_topk_terms(docs, "lang", ws_tokens(F.col("text")), k=25)


@pending(
    "o15_k_anonymity",
    # pure GROUP BY counts — exact integers; NULL QI classes group
    # normally in both engines, NULL sensitive adds one explicit state
    oracle="""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size,
             COUNT(DISTINCT c_acctbal)
               + MAX(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
               AS n_sensitive
      FROM customer GROUP BY 1, 2)
    SELECT c_nationkey, c_mktsegment, class_size,
           CAST(n_sensitive AS BIGINT) AS n_sensitive,
           class_size < 8 AS k_violation,
           n_sensitive < 8 AS l_violation
    FROM g WHERE class_size < 8 OR n_sensitive < 8
    """,
    survey_ref="k-anonymity / l-diversity release screen "
    "(operators/kanon.py — Sweeney 2002 / Machanavajjhala 2007): every "
    "(nation, segment) quasi-identifier class must hold >=k records AND "
    ">=l distinct sensitive values before an extract ships; ONE hash "
    "aggregate on the QI tuple (count + count-distinct compile to one "
    "two-phase agg), filter to violators — the actionable relation of "
    "the generalize-and-re-run release loop; NULL-QI classes audited, "
    "not dropped; staged for the r10 promotion tier",
)
def o15_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kanon import kanon_violations
    from ..sources.testdata import load_table

    cust = load_table(spark, sf_dir, "customer")
    return kanon_violations(
        cust, ["c_nationkey", "c_mktsegment"], "c_acctbal", k=8, l_div=8
    )


@pending(
    "o16_benford",
    # the irrational log10 expectations are 1e9-scaled integer LITERALS
    # (the operator's spec, identical by construction); the chi-square
    # contribution is one positive-operand integer division over exact
    # wide integers
    oracle="""
    WITH p9(digit, p9) AS (VALUES
      (1, 301029995), (2, 176091259), (3, 124938736), (4, 96910013),
      (5, 79181246), (6, 66946789), (7, 57991946), (8, 51152522),
      (9, 45757490)),
    obs AS (
      SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                               AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
               AS digit,
             COUNT(*) AS n_obs
      FROM orders WHERE o_totalprice > 0 GROUP BY 1),
    tot AS (SELECT SUM(n_obs) AS n FROM obs),
    j AS (
      SELECT p.digit, COALESCE(o.n_obs, 0) AS n_obs, p.p9, tot.n
      FROM p9 p LEFT JOIN obs o ON o.digit = p.digit CROSS JOIN tot)
    SELECT CAST(digit AS BIGINT) AS digit, n_obs, CAST(p9 AS BIGINT) AS p9,
           CAST(((CAST(1000000000 AS HUGEINT) * n_obs - n * p9)
                 * (CAST(1000000000 AS HUGEINT) * n_obs - n * p9))
                // (n * p9) AS BIGINT) AS chi2_9
    FROM j
    """,
    survey_ref="Benford first-digit conformance screen "
    "(operators/benford.py) — the forensic/data-quality audit for "
    "financial magnitude columns (the MEV accounting surfaces are such "
    "columns): leading digit via exact string head on cents integers "
    "(no doubles, no logs), expectations as 1e9-scaled integer literal "
    "spec constants, per-digit chi2_9 in exact decimal(38)/HUGEINT with "
    "ONE integer division; absent digits surface as n_obs=0 rows (the "
    "loudest violation must not vanish); one column-pruned scan + 9-row "
    "agg + broadcast dims; staged for the r10 promotion tier",
)
def o16_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.benford import benford_screen
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    return benford_screen(orders, "cents")


@pending(
    "txt_nb_train",
    # training IS aggregation: every model quantity is a count, and the
    # Laplace likelihood ships as an exact (num, den) rational pair
    oracle="""
    WITH base AS (
      SELECT lang AS class,
             list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
      FROM documents WHERE lang IS NOT NULL),
    ndc AS (SELECT class, COUNT(*) AS n_docs_class FROM base GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n_docs FROM base),
    occ AS (SELECT class, unnest(toks) AS term FROM base),
    tf AS (SELECT class, term, COUNT(*) AS tf FROM occ GROUP BY 1, 2),
    ct AS (SELECT class, CAST(SUM(tf) AS BIGINT) AS class_tokens
           FROM tf GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT term) AS vocab FROM tf)
    SELECT t.class, t.term, t.tf, t.tf + 1 AS like_num,
           c.class_tokens + v.vocab AS like_den,
           ndc.n_docs_class, nd.n_docs, c.class_tokens, v.vocab
    FROM tf t
    JOIN ct c USING (class) JOIN ndc USING (class)
    CROSS JOIN v CROSS JOIN nd
    """,
    survey_ref="multinomial Naive Bayes training (operators/nb.py) — the "
    "count-native classifier behind CCNet/C4-style quality and language "
    "filters, paired with chi2 vocabulary selection: ONE token-explode "
    "scan + two hash aggregates (tf, class totals), model emitted as "
    "exact integer rationals (tf+1)/(class_tokens+V) with priors — no "
    "logs, no doubles, engine-exact; the scorer (nb_classify, broadcast "
    "model + left join for sparse unseen-term mass) is the documented "
    "double boundary, pinned against an independent Python reference in "
    "tests/test_nb.py; staged for the r10 promotion tier",
)
def txt_nb_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import ws_tokens
    from ..operators.nb import nb_train
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    return nb_train(docs, "lang", ws_tokens(F.col("text")))


def _rfm_cut_cte(metric: str, tag: str) -> str:
    picks = ", ".join(
        f"MAX(CASE WHEN rn = ({i} * n.n + 4) // 5 THEN v END) AS c{i}"
        for i in range(1, 5)
    )
    return f"""{tag} AS (
      SELECT {picks}
      FROM (SELECT {metric} AS v,
                   row_number() OVER (ORDER BY {metric}) AS rn
            FROM base) CROSS JOIN n)"""


def _rfm_oracle() -> str:
    bucket = lambda m, t: (  # noqa: E731
        f"CAST(1 + (CASE WHEN {m} > {t}.c1 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {m} > {t}.c2 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {m} > {t}.c3 THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {m} > {t}.c4 THEN 1 ELSE 0 END) AS INT)"
    )
    return f"""
    WITH {EV_CTE},
    agg AS (
      SELECT user_id, MAX(ts_ns) AS last_ts, COUNT(*) AS frequency,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS monetary
      FROM ev GROUP BY 1),
    mx AS (SELECT MAX(last_ts) AS gmax FROM agg),
    base AS (
      SELECT user_id, mx.gmax - last_ts AS recency_ns, frequency, monetary
      FROM agg CROSS JOIN mx),
    n AS (SELECT COUNT(*) AS n FROM base),
    {_rfm_cut_cte("recency_ns", "rcut")},
    {_rfm_cut_cte("frequency", "fcut")},
    {_rfm_cut_cte("monetary", "mcut")}
    SELECT user_id AS key, recency_ns, frequency, monetary,
           {bucket("recency_ns", "rcut")} AS r_bucket,
           {bucket("frequency", "fcut")} AS f_bucket,
           {bucket("monetary", "mcut")} AS m_bucket
    FROM base CROSS JOIN rcut CROSS JOIN fcut CROSS JOIN mcut
    """


@pending(
    "x24_rfm_segments",
    oracle=None,  # set below: generated cut-pivot twin
    survey_ref="RFM segmentation on exact-quantile bucketize "
    "(operators/bucketize.py) — feature discretization WITHOUT the "
    "global-ntile single-partition sort: quintile cuts via the two-pass "
    "histogram->refine rank-selection core (one hash agg + one bounded "
    "refine shuffle per metric over the per-user relation), then "
    "pure-codegen comparison chains (bucket = 1 + sum[v > cut_i], zero "
    "extra shuffle); percentile_disc-lower cuts, ties collapse to the "
    "lower bucket, duplicate cuts skip labels identically on both "
    "engines; staged for the r10 promotion tier",
)
def x24_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bucketize import rfm_segments
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    rows = ev.select("user_id", "ts_ns", cents.alias("cents"))
    return rfm_segments(rows, "user_id", "ts_ns", "cents", k=5).select(
        F.col("user_id").alias("key"), "recency_ns", "frequency", "monetary",
        "r_bucket", "f_bucket", "m_bucket"
    )


PENDING["x24_rfm_segments"] = QuerySpec(
    name="x24_rfm_segments",
    build=PENDING["x24_rfm_segments"].build,
    oracle=_rfm_oracle(),
    survey_ref=PENDING["x24_rfm_segments"].survey_ref,
)


@pending(
    "x25_autocorr",
    # the x20 parity pattern: exact integer num/d1/d2 (HUGEINT/decimal38),
    # then one int64->double, *, IEEE sqrt, / chain — every op correctly
    # rounded, so the corr9 floor agrees bit-for-bit
    oracle=f"""
    WITH {EV_CTE},
    b AS (
      SELECT user_id, event_id, ts_ns,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM ev),
    p AS (
      SELECT user_id, cents AS y,
             LAG(cents, 1) OVER (PARTITION BY user_id
                                 ORDER BY ts_ns, event_id) AS x
      FROM b),
    c AS (SELECT user_id, x, y FROM p WHERE x IS NOT NULL),
    a AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(y * y) AS HUGEINT) AS syy
      FROM c GROUP BY 1),
    f AS (
      SELECT user_id, n,
             CAST(n * sxy - sx * sy AS BIGINT) AS num,
             CAST(n * sxx - sx * sx AS BIGINT) AS d1,
             CAST(n * syy - sy * sy AS BIGINT) AS d2
      FROM a)
    SELECT user_id AS key, CAST(1 AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
           CASE WHEN d1 > 0 AND d2 > 0 THEN
             CAST(FLOOR(1000000000.0 * CAST(num AS DOUBLE)
                  / SQRT(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)))
                  AS BIGINT)
           END AS corr9
    FROM f
    """,
    survey_ref="lag-1 autocorrelation (operators/ols.autocorr on the new "
    "general pearson_corr_xy face) — the sample ACF point estimate in "
    "pairwise form, the drift-screen sibling CUSUM then localizes in "
    "time; ONE ordered window (lag) sharing the key exchange with the "
    "exact-sum correlation aggregate, x20's correctly-rounded final "
    "double chain; staged for the r10 promotion tier",
)
def x25_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ols import autocorr
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    rows = ev.select("user_id", "event_id", "ts_ns", cents.alias("cents"))
    return autocorr(
        rows, "user_id", ["ts_ns", "event_id"], "cents", lag=1
    ).select(F.col("user_id").alias("key"), "lag", "n", "corr9")


@pending(
    "o17_compaction_plan",
    # the file listing synthesizes deterministically from orders (one
    # "file" per order date, size = rows x 97-byte proxy width) so both
    # engines plan over the identical metadata relation
    oracle="""
    WITH f AS (
      SELECT CAST(o_orderdate AS VARCHAR) AS file_id,
             COUNT(*) * 97 AS size_bytes
      FROM orders GROUP BY 1),
    p AS (
      SELECT file_id, size_bytes,
             SUM(size_bytes) OVER (ORDER BY size_bytes DESC, file_id ASC
                                   ROWS UNBOUNDED PRECEDING) - size_bytes
               AS before
      FROM f)
    SELECT file_id AS file, CAST(size_bytes AS BIGINT) AS size_bytes,
           CAST(before // 4000 AS BIGINT) AS bin
    FROM p
    """,
    survey_ref="small-file compaction planning (operators/compaction.py) "
    "— the OPTIMIZE scheduler as ONE ordered window over the "
    "metadata-sized file listing: (size DESC, file) layout order, "
    "running-byte boundary binning every target_bytes (bin = bytes-before "
    "div target), oversized files isolate in their own bins, every bin "
    "bounded by target + max_file; no driver loop, no sequential "
    "first-fit fold; the global window is deliberate and bounded by "
    "listing cardinality, never data; staged for the r10 promotion tier",
)
def o17_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.compaction import compaction_plan
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy("o_orderdate").agg(
        (F.count(F.lit(1)) * 97).alias("size_bytes")
    ).select(
        F.col("o_orderdate").cast("string").alias("file_id"), "size_bytes"
    )
    return compaction_plan(files, "file_id", "size_bytes", target_bytes=4000)


@pending(
    "o18_assoc_rules",
    # every statistic is a basket count; support/confidence/lift ship as
    # exact scaled-integer floors (one positive integer division each)
    oracle="""
    WITH m AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey % 50 AS item
      FROM lineitem),
    ni AS (SELECT item, COUNT(*) AS n_i FROM m GROUP BY 1),
    nb AS (SELECT COUNT(DISTINCT b) AS n FROM m),
    p AS (
      SELECT a.item AS item_a, c.item AS item_b, COUNT(*) AS n_ab
      FROM m a JOIN m c ON a.b = c.b AND a.item < c.item
      GROUP BY 1, 2 HAVING COUNT(*) >= 90)
    SELECT p.item_a, p.item_b,
           na.n_i AS n_a, nc.n_i AS n_b, p.n_ab,
           CAST((CAST(1000000000 AS HUGEINT) * p.n_ab) // nb.n AS BIGINT)
             AS support_9,
           CAST((CAST(1000000000 AS HUGEINT) * p.n_ab) // na.n_i AS BIGINT)
             AS conf_a_to_b_9,
           CAST((CAST(1000000000 AS HUGEINT) * p.n_ab) // nc.n_i AS BIGINT)
             AS conf_b_to_a_9,
           CAST((CAST(1000000000 AS HUGEINT) * nb.n * p.n_ab)
                // (CAST(na.n_i AS HUGEINT) * nc.n_i) AS BIGINT) AS lift_9
    FROM p
    JOIN ni na ON na.item = p.item_a
    JOIN ni nc ON nc.item = p.item_b
    CROSS JOIN nb
    """,
    survey_ref="association rules over baskets (operators/assoc.py — "
    "Agrawal & Srikant 1994's 2-itemset core): support / confidence / "
    "lift as exact scaled-integer rationals; pair generation is a "
    "basket-key self-join bounded by basket size (never corpus x "
    "corpus, the PMI posture), min-support prunes BEFORE the broadcast "
    "item-count lift join, N constant-folds; mega-basket skew documented "
    "with the domain-cap/salting upgrade path; TPC-H orders x part "
    "category (mod-50) baskets, min_pair_count=90 exercises the prune "
    "on both sides; staged for the r10 promotion tier",
)
def o18_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.assoc import association_rules
    from ..sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("b"),
        (F.col("l_partkey") % 50).alias("item"),
    )
    return association_rules(li, "b", "item", min_pair_count=90).select(
        "item_a", "item_b", "n_a", "n_b", "n_ab",
        "support_9", "conf_a_to_b_9", "conf_b_to_a_9", "lift_9"
    )


@pending(
    "o19_pareto",
    # the threshold test is cross-multiplied integers (5*cum >= 4*total),
    # top1 share one positive integer division — no percentage doubles
    oracle="""
    WITH contrib AS (
      SELECT s.s_nationkey AS grp, l.l_suppkey AS member,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    r AS (
      SELECT grp, member, cents,
             SUM(cents) OVER (PARTITION BY grp ORDER BY cents DESC, member
                              ROWS UNBOUNDED PRECEDING) AS cum,
             row_number() OVER (PARTITION BY grp
                                ORDER BY cents DESC, member) AS rk,
             SUM(cents) OVER (PARTITION BY grp) AS total
      FROM contrib)
    SELECT grp, COUNT(*) AS n_members, CAST(MAX(total) AS BIGINT) AS total,
           MIN(CASE WHEN total > 0 AND 5 * cum >= 4 * total THEN rk END)
             AS n_cover,
           CAST(CASE WHEN MAX(total) > 0 THEN
             (CAST(1000000000 AS HUGEINT)
              * MAX(CASE WHEN rk = 1 THEN cents END)) // MAX(total)
           END AS BIGINT) AS top1_share_9
    FROM r GROUP BY 1
    """,
    survey_ref="Pareto concentration (operators/pareto.py) — 'how many "
    "suppliers cover 80% of a nation's revenue' (the corpus twin: 'how "
    "many domains supply 80% of tokens'); ONE key exchange end to end "
    "(rank + running sum + group total share the sort, the twap "
    "discipline), cross-multiplied integer threshold, exact cents; "
    "staged for the r10 promotion tier",
)
def o19_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pareto import pareto_cover
    from ..sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    contrib = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("grp"),
                 F.col("l_suppkey").alias("member"))
        .agg(F.sum("cents").alias("cents"))
    )
    return pareto_cover(contrib, "grp", "member", "cents", num=4, den=5)


def _sssp_oracle(rounds: int) -> str:
    ctes = [
        """eraw AS (
      SELECT 'c' || o_custkey AS s, 's' || l_suppkey AS t,
             CAST(MIN(l_quantity) AS BIGINT) AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2)""",
        "edges AS (SELECT s, t, w FROM eraw"
        " UNION ALL SELECT t AS s, s AS t, w FROM eraw)",
        """d0 AS (
      SELECT 's' || s_suppkey AS node, CAST(0 AS BIGINT) AS dist,
             's' || s_suppkey AS root
      FROM supplier WHERE s_suppkey % 10 = 0)""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""c{r} AS (
      SELECT e.t AS node, d.dist + e.w AS dist, d.root
      FROM edges e JOIN d{r - 1} d ON d.node = e.s)"""
        )
        ctes.append(
            f"""d{r} AS (
      SELECT node, dist, root FROM (
        SELECT node, dist, root,
               row_number() OVER (PARTITION BY node
                                  ORDER BY dist, root) AS rn
        FROM (SELECT * FROM d{r - 1} UNION ALL SELECT * FROM c{r})) x
      WHERE rn = 1)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, dist, root FROM d{rounds}"


@pending(
    "g13_sssp_weighted",
    oracle=None,  # set below: generated unrolled-round twin
    survey_ref="weighted multi-source shortest paths "
    "(operators/bfs.sssp_bellman_ford) — fixed-round Bellman-Ford "
    "completing the graph family's weighted dimension: per round one "
    "edge hash join + one (dist, root)-struct argmin over settled ∪ "
    "relaxed (later rounds IMPROVE distances, unlike hop-BFS), "
    "non-negative integer min-quantity weights on the deduped bidirected "
    "trade graph, smallest-root distance-tie-break; DuckDB twin replays "
    "the SAME 3 rounds as generated rank-1 CTEs; staged for the r10 "
    "promotion tier",
)
def g13_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bfs import sssp_bellman_ford
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("s"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("t"),
        )
        .agg(F.min("l_quantity").cast("long").alias("w"))
    )
    edges = pairs.unionAll(
        pairs.select(F.col("t").alias("s"), F.col("s").alias("t"), "w")
    )
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    return sssp_bellman_ford(edges, seeds, rounds=3).select(
        "node", F.col("dist").cast("long").alias("dist"), "root"
    )


PENDING["g13_sssp_weighted"] = QuerySpec(
    name="g13_sssp_weighted",
    build=PENDING["g13_sssp_weighted"].build,
    oracle=_sssp_oracle(rounds=3),
    survey_ref=PENDING["g13_sssp_weighted"].survey_ref,
)


@pending(
    "o20_skew_profile",
    # counts, ranks, and two exact scaled-integer ratios; the 1-row
    # summary broadcasts onto the hot-key list so one gate pins both faces
    oracle=f"""
    WITH {EV_CTE},
    c AS (SELECT user_id AS key, COUNT(*) AS cnt FROM ev GROUP BY 1),
    r AS (SELECT key, cnt,
                 row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
          FROM c),
    s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                 COUNT(*) AS n_keys, MAX(cnt) AS max_cnt
          FROM c)
    SELECT r.key, r.cnt, r.rank, s.n_rows, s.n_keys, s.max_cnt,
           CAST((CAST(1000000000 AS HUGEINT) * s.max_cnt * s.n_keys)
                // s.n_rows AS BIGINT) AS skew_ratio_9,
           CAST((CAST(1000000000 AS HUGEINT) * s.max_cnt)
                // s.n_rows AS BIGINT) AS p_hot_9
    FROM r CROSS JOIN s WHERE r.rank <= 5
    """,
    survey_ref="join-key skew profiling (operators/skew.py) — the "
    "pre-flight check that picks plain-shuffle vs AQE skew-split vs "
    "salted join (the top-k hot list feeds salted_join's hot-key set "
    "directly, and KMV join_size_estimate answers the companion "
    "output-size question): one map-side-combined count aggregate, "
    "rank<=k hot list, exact scaled-integer skew_ratio/p_hot; staged "
    "for the r10 promotion tier",
)
def o20_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_skew_profile, key_skew_summary
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    prof = key_skew_profile(ev, "user_id", top_k=5)
    summ = key_skew_summary(ev, "user_id")
    return prof.join(F.broadcast(summ))


@pending(
    "txt_readability",
    # each count is one codegen regexp pass (engine-verified identical
    # semantics); flesch_9 is one truncating integer division — the
    # truncation (not floor) convention is the documented rounding and
    # both engines truncate toward zero identically
    oracle="""
    WITH c AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x != '')) AS BIGINT) AS words,
             GREATEST(CAST(1 AS BIGINT),
               CAST(length(regexp_replace(text, '[.!?]+', 'V', 'g'))
                    - length(regexp_replace(text, '[.!?]+', '', 'g'))
                    AS BIGINT)) AS sentences,
             CAST(length(regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'))
                  - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
                  AS BIGINT) AS syllables
      FROM documents)
    SELECT doc_id, words, sentences, syllables,
           CASE WHEN words > 0 THEN CAST(
             (CAST(206835000000 AS HUGEINT) * sentences * words
              - CAST(1015000000 AS HUGEINT) * words * words
              - CAST(84600000000 AS HUGEINT) * syllables * sentences)
             // (CAST(1000 AS HUGEINT) * sentences * words) AS BIGINT)
           END AS flesch_9
    FROM c
    """,
    survey_ref="readability scoring (functions/text.readability_counts + "
    "with_flesch_9) — the dictionary-free Flesch reading-ease quality "
    "signal beside the Gopher rules: words / sentence-boundary groups / "
    "vowel-group syllable proxies, each ONE zero-shuffle codegen regexp "
    "pass (no explode — whitespace breaks vowel runs at word boundaries "
    "on its own), flesch_9 as one truncating integer division over "
    "decimal(38)/HUGEINT; staged for the r10 promotion tier",
)
def txt_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import readability_counts, with_flesch_9
    from ..sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    counts = readability_counts(F.col("text"))
    base = docs.select(
        "doc_id",
        counts["words"].alias("words"),
        counts["sentences"].alias("sentences"),
        counts["syllables"].alias("syllables"),
    )
    return with_flesch_9(base, "words", "sentences", "syllables")


_PPR_SEEDS_SQL = (
    "seeds(node) AS (SELECT 's' || s_suppkey FROM supplier "
    "WHERE s_suppkey % 10 = 0)"
)


def _ppr_oracle() -> str:
    from ..operators.pagerank import ppr_oracle_sql

    return ppr_oracle_sql(_PR_EDGES_SQL, _PPR_SEEDS_SQL, iters=3)


@pending(
    "g14_ppr",
    oracle=None,  # set below: generated unrolled-iteration twin
    survey_ref="personalized PageRank (operators/pagerank.ppr_integer) — "
    "teleport mass restricted to the 10 seed suppliers over the "
    "bidirectional trade graph: importance RELATIVE to a seed set, the "
    "related-entity/topic-conditioned ranking whose locality (rank "
    "support grows only iters hops from the seeds) is what makes it a "
    "100 TB citizen; same exact-integer per-iteration arithmetic and "
    "unrolled-CTE twin as g7, with the start/teleport constants computed "
    "from counts on BOTH engines so one oracle serves every sf; staged "
    "for the r10 promotion tier",
)
def g14_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import ppr_integer
    from ..sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    return ppr_integer(edges, seeds, iters=3)


PENDING["g14_ppr"] = QuerySpec(
    name="g14_ppr",
    build=PENDING["g14_ppr"].build,
    oracle=_ppr_oracle(),
    survey_ref=PENDING["g14_ppr"].survey_ref,
)


@pending(
    "o21_corr_matrix",
    # one aggregate computes every sum/square/cross-product; the oracle
    # unpivots the same single row via UNION ALL branches over a shared CTE
    oracle="""
    WITH b AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // 100000 AS price_k,
             CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)
               AS disc_c,
             CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS tax_c
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
    a AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(qty) AS HUGEINT) AS s0, CAST(SUM(qty*qty) AS HUGEINT) AS q0,
             CAST(SUM(price_k) AS HUGEINT) AS s1, CAST(SUM(price_k*price_k) AS HUGEINT) AS q1,
             CAST(SUM(disc_c) AS HUGEINT) AS s2, CAST(SUM(disc_c*disc_c) AS HUGEINT) AS q2,
             CAST(SUM(tax_c) AS HUGEINT) AS s3, CAST(SUM(tax_c*tax_c) AS HUGEINT) AS q3,
             CAST(SUM(qty*price_k) AS HUGEINT) AS p01,
             CAST(SUM(qty*disc_c) AS HUGEINT) AS p02,
             CAST(SUM(qty*tax_c) AS HUGEINT) AS p03,
             CAST(SUM(price_k*disc_c) AS HUGEINT) AS p12,
             CAST(SUM(price_k*tax_c) AS HUGEINT) AS p13,
             CAST(SUM(disc_c*tax_c) AS HUGEINT) AS p23
      FROM b),
    l AS (
      SELECT 'qty' AS col_a, 'price_k' AS col_b, n, p01 AS sxy, s0 AS sx, s1 AS sy, q0 AS sxx, q1 AS syy FROM a
      UNION ALL SELECT 'qty', 'disc_c', n, p02, s0, s2, q0, q2 FROM a
      UNION ALL SELECT 'qty', 'tax_c', n, p03, s0, s3, q0, q3 FROM a
      UNION ALL SELECT 'price_k', 'disc_c', n, p12, s1, s2, q1, q2 FROM a
      UNION ALL SELECT 'price_k', 'tax_c', n, p13, s1, s3, q1, q3 FROM a
      UNION ALL SELECT 'disc_c', 'tax_c', n, p23, s2, s3, q2, q3 FROM a),
    f AS (
      SELECT col_a, col_b, n,
             CAST(n * sxy - sx * sy AS BIGINT) AS num,
             CAST(n * sxx - sx * sx AS BIGINT) AS d1,
             CAST(n * syy - sy * sy AS BIGINT) AS d2
      FROM l)
    SELECT col_a, col_b, n,
           CASE WHEN d1 > 0 AND d2 > 0 THEN
             CAST(FLOOR(1000000000.0 * CAST(num AS DOUBLE)
                  / SQRT(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)))
                  AS BIGINT)
           END AS corr9
    FROM f
    """,
    survey_ref="one-pass correlation matrix (operators/ols.corr_matrix) "
    "— all k sums, squares, and k(k-1)/2 cross-products in a SINGLE "
    "map-side-combined aggregate over one scan (cost of a count(*), "
    "independent of the pair count), pair rows unpivoted from the 1-row "
    "aggregate with a literal stack; listwise-complete sample, x20's "
    "correctly-rounded final double chain per pair; lineitem "
    "qty/price/discount/tax cents; staged for the r10 promotion tier",
)
def o21_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ols import corr_matrix
    from ..sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
               " div 100000").alias("price_k"),
        (F.col("l_discount").cast("decimal(4,2)") * 100)
        .cast("long").alias("disc_c"),
        (F.col("l_tax").cast("decimal(4,2)") * 100).cast("long").alias("tax_c"),
    )
    return corr_matrix(li, ["qty", "price_k", "disc_c", "tax_c"])


@pending(
    "o22_mann_whitney",
    # doubled midranks clear the .5 tie halves, so U and the identity
    # U_A + U_B = n_A*n_B are exact integers; rb_9 is one truncating
    # integer division (the flesch_9 convention, identical both engines)
    oracle=f"""
    WITH {EV_CTE},
    b AS (
      SELECT event_type = 'purchase' AS is_a,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM ev
      WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL),
    h AS (
      SELECT v, CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      FROM b GROUP BY 1),
    r AS (
      SELECT ca, cb,
             CAST(SUM(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) - ca - cb AS below
      FROM h),
    a AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
             CAST(SUM(ca * (2 * (1 + below) + ca + cb - 1)) AS BIGINT) AS r2a
      FROM r),
    f AS (
      SELECT n_a, n_b, r2a - n_a * (n_a + 1) AS u2_a FROM a),
    g AS (
      SELECT n_a, n_b, u2_a, 2 * n_a * n_b - u2_a AS u2_b FROM f)
    SELECT n_a, n_b, u2_a, u2_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             CAST((CAST(u2_a - u2_b AS HUGEINT) * 1000000000)
                  // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
           END AS rb_9
    FROM g
    """,
    survey_ref="Mann-Whitney U (operators/mannwhitney.py) — the engine's "
    "first hypothesis-test surface: exact-integer nonparametric A/B via "
    "doubled midranks (U, the U_A+U_B=nAnB identity, and rank-biserial "
    "effect size all exact); ONE data-sized hash aggregate to the "
    "distinct-value histogram, then one ordered window over the value "
    "DOMAIN (partition-less deliberately — domain-sized, with upstream "
    "quantization as the tie/size policy); purchase-vs-error cents at "
    "the gate; staged for the r10 promotion tier",
)
def o22_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mannwhitney import mann_whitney_u
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    rows = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return mann_whitney_u(rows, "event_type", "cents", "purchase", "error")


@pending(
    "o23_ks_test",
    # cross-multiplied ECDFs keep the max an exact integer; one positive
    # integer division scales it
    oracle=f"""
    WITH {EV_CTE},
    b AS (
      SELECT event_type = 'purchase' AS is_a,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM ev
      WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL),
    h AS (
      SELECT v, CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      FROM b GROUP BY 1),
    c AS (
      SELECT ca, cb,
             CAST(SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cuma,
             CAST(SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cumb,
             CAST(SUM(ca) OVER () AS BIGINT) AS na,
             CAST(SUM(cb) OVER () AS BIGINT) AS nb
      FROM h),
    g AS (
      SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
             MAX(ABS(cuma * nb - cumb * na)) AS d_num
      FROM c)
    SELECT n_a, n_b, d_num,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             CAST((CAST(d_num AS HUGEINT) * 1000000000)
                  // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
           END AS d_9
    FROM g
    """,
    survey_ref="Kolmogorov-Smirnov two-sample statistic "
    "(operators/mannwhitney.ks_two_sample) — the pointwise-gap "
    "complement to MW's dominance view: D as an exact rational via "
    "cross-multiplied integer ECDFs (no division inside the max), same "
    "histogram->ordered-window shape, purchase-vs-error cents; staged "
    "for the r10 promotion tier",
)
def o23_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mannwhitney import ks_two_sample
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    rows = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return ks_two_sample(rows, "event_type", "cents", "purchase", "error")


@pending(
    "o24_spearman",
    # doubled midranks are exact integers, so Spearman IS the pearson
    # exact-sum chain on ranks; one correctly-rounded double floor
    oracle=f"""
    WITH {EV_CTE},
    b AS (
      SELECT (ts_ns - (ts_ns % 1000000000 + 1000000000) % 1000000000)
               // 1000000000 AS x,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM ev WHERE event_type = 'purchase' AND value IS NOT NULL),
    hx AS (SELECT x, COUNT(*) AS c FROM b GROUP BY 1),
    rx AS (SELECT x, 2 * (CAST(SUM(c) OVER (ORDER BY x ROWS UNBOUNDED
                  PRECEDING) AS BIGINT) - c) + c + 1 AS mr2x FROM hx),
    hy AS (SELECT y, COUNT(*) AS c FROM b GROUP BY 1),
    ry AS (SELECT y, 2 * (CAST(SUM(c) OVER (ORDER BY y ROWS UNBOUNDED
                  PRECEDING) AS BIGINT) - c) + c + 1 AS mr2y FROM hy),
    j AS (SELECT rx.mr2x AS mx, ry.mr2y AS my
          FROM b JOIN rx ON rx.x = b.x JOIN ry ON ry.y = b.y),
    a AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(mx) AS HUGEINT) AS sx, CAST(SUM(my) AS HUGEINT) AS sy,
             CAST(SUM(mx * my) AS HUGEINT) AS sxy,
             CAST(SUM(mx * mx) AS HUGEINT) AS sxx,
             CAST(SUM(my * my) AS HUGEINT) AS syy
      FROM j),
    f AS (
      SELECT n, CAST(n * sxy - sx * sy AS BIGINT) AS num,
             CAST(n * sxx - sx * sx AS BIGINT) AS d1,
             CAST(n * syy - sy * sy AS BIGINT) AS d2
      FROM a)
    SELECT CAST(n AS BIGINT) AS n,
           CASE WHEN d1 > 0 AND d2 > 0 THEN
             CAST(FLOOR(1000000000.0 * CAST(num AS DOUBLE)
                  / SQRT(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE)))
                  AS BIGINT)
           END AS rho9
    FROM f
    """,
    survey_ref="Spearman rank correlation "
    "(operators/mannwhitney.spearman_corr) — the monotonic-association "
    "complement to Pearson's linear view: exact doubled midranks (MW "
    "trick) feed the pearson exact-sum chain unchanged; purchase-event "
    "time-vs-spend at the gate; envelope documented (4n^4/3 < 2^63 -> "
    "n ~ 1.2M per statistic, sample above); staged for the r10 "
    "promotion tier",
)
def o24_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mannwhitney import spearman_corr
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    rows = ev.filter(F.col("event_type") == "purchase").select(
        F.expr("(ts_ns - pmod(ts_ns, 1000000000)) div 1000000000").alias("t_s"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return spearman_corr(rows, "t_s", "cents")


@pending(
    "ev_json_extract",
    # both engines build the IDENTICAL nested document by concatenation,
    # then extract scalars inside the probed parity envelope (leaf paths,
    # array index, missing/null -> NULL); k doubles through an arithmetic
    # round-trip to prove the typed getter, not just text passthrough
    oracle=f"""
    WITH {EV_CTE},
    j AS (
      SELECT event_id,
             '{{"m": ' || props || ', "t": "' || event_type
               || '", "a": [' || CAST(user_id AS VARCHAR) || ', '
               || CAST(event_id AS VARCHAR) || ']}}' AS doc
      FROM ev),
    x AS (
      SELECT event_id,
             TRY_CAST(json_extract_string(doc, '$.m.k') AS BIGINT) AS k,
             json_extract_string(doc, '$.t') AS t,
             TRY_CAST(json_extract_string(doc, '$.a[0]') AS BIGINT) AS uid,
             TRY_CAST(json_extract_string(doc, '$.a[1]') AS BIGINT) AS eid,
             json_extract_string(doc, '$.missing') AS miss
      FROM j)
    SELECT event_id, k * 2 AS k2, t, uid, eid,
           CASE WHEN miss IS NULL THEN CAST(1 AS BIGINT) ELSE 0 END
             AS miss_is_null
    FROM x
    """,
    survey_ref="JSON path extraction (functions/json.py) — the "
    "semi-structured column surface replacing regexp mining of the "
    "events props JSON: get_json_object / json_extract_string inside "
    "the PROBED parity envelope (scalar leaves, zero-based array index, "
    "missing/JSON-null -> SQL NULL on both engines; object-subtree "
    "re-serialization documented OUT of the envelope), typed getters "
    "with try-cast malformed-row tolerance; pure codegen, zero shuffle, "
    "column-pruning friendly; staged for the r10 promotion tier",
)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.json import json_get, json_get_long
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    doc = F.concat(
        F.lit('{"m": '), F.col("props"), F.lit(', "t": "'),
        F.col("event_type"), F.lit('", "a": ['),
        F.col("user_id").cast("string"), F.lit(", "),
        F.col("event_id").cast("string"), F.lit("]}"),
    )
    j = ev.select("event_id", doc.alias("doc"))
    return j.select(
        "event_id",
        (json_get_long(F.col("doc"), "$.m.k") * 2).alias("k2"),
        json_get(F.col("doc"), "$.t").alias("t"),
        json_get_long(F.col("doc"), "$.a[0]").alias("uid"),
        json_get_long(F.col("doc"), "$.a[1]").alias("eid"),
        json_get(F.col("doc"), "$.missing").isNull().cast("long").alias(
            "miss_is_null"
        ),
    )


@pending(
    "x26_seasonality",
    # the calendar grid derives from epoch INTEGERS (1970-01-01 was a
    # Thursday: dow = (days + 4) % 7, 0 = Sunday) — Spark's dayofweek()
    # is 1-based-Sunday while DuckDB's is 0-based-Sunday, so portable
    # pipelines never touch either engine's calendar function for grids
    oracle=f"""
    WITH {EV_CTE},
    b AS (
      SELECT (ts_ns - (ts_ns % 1000000000 + 1000000000) % 1000000000)
               // 1000000000 AS ts_s,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM ev),
    g AS (
      SELECT ((ts_s // 86400) + 4) % 7 AS dow,
             (ts_s % 86400) // 3600 AS hour, cents
      FROM b)
    SELECT dow, hour, COUNT(*) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents_sum
    FROM g GROUP BY 1, 2
    """,
    survey_ref="seasonality profile (day-of-week x hour-of-day activity "
    "grid) — the time-profile rollup behind load shaping and anomaly "
    "baselines, with the engine-parity lesson as the point: the grid "
    "derives from epoch-second INTEGER arithmetic ((days+4)%7, UTC) "
    "because Spark and DuckDB disagree on dayofweek() numbering; one "
    "hash aggregate, exact cents; staged for the r10 promotion tier",
)
def x26_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    # integer division end to end (the `div` discipline — no double hop)
    g = ev.select(
        F.expr("(ts_ns - pmod(ts_ns, 1000000000)) div 1000000000").alias("ts_s"),
        cents.alias("cents"),
    ).select(
        F.expr("((ts_s div 86400) + 4) % 7").alias("dow"),
        F.expr("(ts_s % 86400) div 3600").alias("hour"),
        "cents",
    )
    return g.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents_sum")
    )


@pending(
    "x27_quantile_normalize",
    # the twin uses the lazy one-node global row_number; the operator
    # uses the histogram/sequence rank map — the VALUE at a pooled rank
    # is tie-order independent, so both produce identical rows
    oracle=f"""
    WITH {EV_CTE},
    b AS (
      SELECT event_id, event_type AS grp,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM ev WHERE value IS NOT NULL),
    rn AS (
      SELECT event_id, grp, cents,
             CAST(row_number() OVER (PARTITION BY grp
                                     ORDER BY cents, event_id) AS BIGINT)
               AS rank_in_group
      FROM b),
    ng AS (SELECT grp, COUNT(*) AS n_g FROM b GROUP BY 1),
    nt AS (SELECT COUNT(*) AS n FROM b),
    rs AS (
      SELECT rn.event_id, rn.grp, rn.cents, rn.rank_in_group,
             CAST((rn.rank_in_group * nt.n + ng.n_g - 1) // ng.n_g
                  AS BIGINT) AS pooled_rank
      FROM rn JOIN ng ON ng.grp = rn.grp CROSS JOIN nt),
    pool AS (
      SELECT cents AS normalized,
             CAST(row_number() OVER (ORDER BY cents) AS BIGINT) AS r
      FROM b)
    SELECT rs.event_id, rs.grp, rs.cents, rs.rank_in_group,
           rs.pooled_rank, pool.normalized
    FROM rs JOIN pool ON pool.r = rs.pooled_rank
    """,
    survey_ref="quantile normalization (operators/qnorm.py — Bolstad et "
    "al. 2003's batch-effect corrector; here: make per-source quality "
    "scores comparable): percentile_disc-lower pooled mapping with "
    "r* = ceil(rn*N/n_g) in exact integers; the scale path replaces the "
    "global-row_number anti-pattern with a domain histogram whose rank "
    "intervals explode into an N-row equi-join map (shuffled by rank, "
    "never one-task-sorted); event_type groups over cents; staged for "
    "the r10 promotion tier",
)
def x27_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.qnorm import quantile_normalize
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    rows = ev.select(
        "event_id",
        F.col("event_type").alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    return quantile_normalize(rows, "grp", "cents", ["event_id"]).select(
        "event_id", "grp", "cents", "rank_in_group", "pooled_rank", "normalized"
    )


@pending(
    "ml_fold_assign",
    # fold = md5('0|' || user) % 5 — the functions/hashing.md5_long twin;
    # counts are exact and the group-atomicity invariant is structural
    oracle=f"""
    WITH {EV_CTE},
    f AS (
      SELECT ('0x' || substr(md5('0|' || CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % 5 AS fold,
             event_type, user_id
      FROM ev WHERE user_id IS NOT NULL)
    SELECT fold, event_type AS class, COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_groups
    FROM f GROUP BY 1, 2
    """,
    survey_ref="group-aware CV fold assignment (operators/folds.py) — "
    "leakage-safe deterministic splits: fold = md5(seed|group) % k, so "
    "same group -> same fold by construction and any engine reproduces "
    "the split bit-for-bit; zero-shuffle codegen assignment + one "
    "hash-agg balance report (rows/groups per fold x class), with "
    "exact-n stratified sampling as the documented alternative when "
    "exact sizes beat group atomicity; staged for the r10 promotion "
    "tier",
)
def ml_fold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.folds import fold_report
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    return fold_report(ev, "user_id", "event_type", k=5)
