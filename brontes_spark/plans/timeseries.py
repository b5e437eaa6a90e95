"""Time-series / event-stream queries over the `events` table, instantiating
the reference's CEX-pricing and inspector operators (SURVEY.md §2.5/§2.7):

  x1  as-of join            — quote-at-or-before lookup (cex_quotes.rs:124+)
  x4  expanding-window VWAP — markout walker (time_window_vwam.rs:94-520)
  s3  grid downsample       — 1-sec quote grid (raw_cex_quotes.sql argMin)
  s4  volume ranking        — most-liquid-exchange (most_volume_pair_exchange.sql)
  c9  window dedup          — transfer double-count pruning (tree_pruning.rs)
  c11 group stats           — per-block priority-fee avg/stddev (tree/mod.rs:136-163)
  i14 outlier discovery     — priority_fee > avg + 2σ (discovery.rs:33-73)
  i15 rolling window        — multi-block sliding window (multi_block_window.rs:7-30)
  i1  sandwich pair gen     — duplicate-sender windows + interleaved victims
                              (sandwich/mod.rs:1014-1135)
  i6  sequence classify     — swap-continuity classification (atomic_arb.rs:398-424)
  o4  daily rollup          — MevBlock header aggregates (composer/utils.rs:15-242)

Event time is epoch-nanosecond bigint (`ts_ns`, see sources/testdata.py);
grains derive via integer division so Spark and DuckDB agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.decimals import dec, to_dbl
from ..operators.asof import asof_join
from ..operators.vwap import expanding_vwap
from ..operators.windows import grid_downsample, rank_by_group, window_dedup
from ..sources.testdata import load_events
from .registry import EV_CTE, register

HOUR_NS = 3_600_000_000_000
DAY_NS = 86_400_000_000_000


@register(
    "x1_asof_join",
    oracle=f"""
    WITH {EV_CTE},
    p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
    v AS (SELECT * FROM ev WHERE event_type = 'view'),
    pairs AS (
      SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             v.event_id AS view_id, p.ts_ns - v.ts_ns AS gap_ns,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts_ns DESC, v.event_id DESC) AS rn
      FROM p JOIN v ON p.user_id = v.user_id AND v.ts_ns <= p.ts_ns)
    SELECT purchase_id, user_id, view_id, gap_ns FROM pairs WHERE rn = 1
    """,
    survey_ref="X1/A3 as-of lookup (db/cex/quotes/cex_quotes.rs:124+, db/dex.rs:154-170)",
)
def x1_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ns"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts_ns").alias("view_ts"),
    )
    j = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_time="ts_ns",
        right_time="view_ts",
        tiebreak="view_id",
        payload_prefix="",
        how="inner",
    )
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "view_id",
        (F.col("ts_ns") - F.col("view_ts")).alias("gap_ns"),
    )


def _vwap_inputs(ev):
    """Shared X4/X6 projection: purchases as volume-seeking anchors, view/
    click events as price ticks (price mined from props' "k"). ONE source of
    truth so the two gates (and their oracle CTEs) cannot drift apart."""
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("key"),
        F.col("ts_ns").alias("anchor_ts"),
        dec("value").alias("required_vol"),
    )
    ticks = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("key"),
        F.col("ts_ns").alias("tick_ts"),
        dec(F.regexp_extract("props", '"k": ([0-9]+)', 1)).alias("price"),
        dec("value").alias("vol"),
        F.col("event_id").alias("tick_id"),
    )
    return anchors, ticks


@register(
    "x4_expanding_vwap",
    oracle=f"""
    WITH {EV_CTE},
    anchors AS (
      SELECT event_id AS anchor_id, user_id AS key, ts_ns AS anchor_ts,
             CAST(value AS DECIMAL(18,6)) AS required_vol
      FROM ev WHERE event_type = 'purchase'),
    ticks AS (
      SELECT user_id AS key, ts_ns AS tick_ts,
             CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS DECIMAL(18,6)) AS price,
             CAST(value AS DECIMAL(18,6)) AS vol
      FROM ev WHERE event_type IN ('view', 'click')),
    j AS (
      SELECT a.anchor_id, a.required_vol, t.price, t.vol,
             GREATEST(1, CAST(CEIL(CASE WHEN t.tick_ts <= a.anchor_ts
                 THEN (a.anchor_ts - t.tick_ts) / 300000000000.0
                 ELSE (t.tick_ts - a.anchor_ts) / 600000000000.0 END) AS INT)) AS step
      FROM anchors a JOIN ticks t ON a.key = t.key
       AND t.tick_ts >= a.anchor_ts - 1800000000000
       AND t.tick_ts <= a.anchor_ts + 3600000000000),
    per_step AS (
      SELECT anchor_id, required_vol, step,
             SUM(vol) AS svol, SUM(price * vol) AS spv
      FROM j GROUP BY 1, 2, 3),
    cum AS (
      SELECT *, SUM(svol) OVER (PARTITION BY anchor_id ORDER BY step) AS cum_vol
      FROM per_step),
    cutoff AS (
      SELECT anchor_id,
             MIN(CASE WHEN cum_vol >= required_vol THEN step END) AS cutoff_step
      FROM cum GROUP BY anchor_id
      HAVING MIN(CASE WHEN cum_vol >= required_vol THEN step END) IS NOT NULL)
    SELECT p.anchor_id AS purchase_id, c.cutoff_step,
           CAST(CAST(SUM(p.spv) AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(SUM(p.svol) AS DECIMAL(38,6)) AS DOUBLE) AS vwap,
           CAST(CAST(SUM(p.svol) AS DECIMAL(38,6)) AS DOUBLE) AS covered_vol
    FROM cum p JOIN cutoff c
      ON p.anchor_id = c.anchor_id AND p.step <= c.cutoff_step
    GROUP BY 1, 2
    """,
    survey_ref="X4 expanding-window VWAP (db/cex/trades/time_window_vwam.rs:94-520)",
)
def x4_expanding_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    anchors, ticks = _vwap_inputs(ev)
    out = expanding_vwap(
        anchors, ticks, pre_step=300_000_000_000, post_step=600_000_000_000, max_steps=6
    )
    return out.select(
        F.col("anchor_id").alias("purchase_id"), "cutoff_step", "vwap", "covered_vol"
    )


#: X4 decay weights (1/ns). The reference defaults are per-µs
#: (config.rs: pre −5e-7, post −2e-7) sized for 10–20 s max windows; the
#: events grid spans hours, so the same shape is rescaled to reach ~e^-0.9
#: at the max pre window (1.8e12 ns) and ~e^-0.72 at the max post window.
_X4_PRE_DECAY = -5e-13
_X4_POST_DECAY = -2e-13


@register(
    "x4_decay_vwap",
    oracle=f"""
    WITH {EV_CTE},
    anchors AS (
      SELECT event_id AS anchor_id, user_id AS key, ts_ns AS anchor_ts,
             CAST(value AS DECIMAL(18,6)) AS required_vol
      FROM ev WHERE event_type = 'purchase'),
    ticks AS (
      SELECT user_id AS key, ts_ns AS tick_ts,
             CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS DECIMAL(18,6)) AS price,
             CAST(value AS DECIMAL(18,6)) AS vol
      FROM ev WHERE event_type IN ('view', 'click')),
    j AS (
      SELECT a.anchor_id, a.required_vol, t.price, t.vol,
             GREATEST(1, CAST(CEIL(CASE WHEN t.tick_ts <= a.anchor_ts
                 THEN (a.anchor_ts - t.tick_ts) / 300000000000.0
                 ELSE (t.tick_ts - a.anchor_ts) / 600000000000.0 END) AS INT)) AS step,
             CAST(EXP(CASE WHEN t.tick_ts <= a.anchor_ts
                 THEN -0.0000000000005 * CAST(a.anchor_ts - t.tick_ts AS DOUBLE)
                 ELSE -0.0000000000002 * CAST(t.tick_ts - a.anchor_ts AS DOUBLE) END)
               AS DECIMAL(9,6)) AS w
      FROM anchors a JOIN ticks t ON a.key = t.key
       AND t.tick_ts >= a.anchor_ts - 1800000000000
       AND t.tick_ts <= a.anchor_ts + 3600000000000),
    per_step AS (
      SELECT anchor_id, required_vol, step,
             SUM(vol) AS svol,
             SUM(CAST(price * vol AS DECIMAL(18,6)) * w) AS swpv,
             SUM(vol * w) AS swvol
      FROM j GROUP BY 1, 2, 3),
    cum AS (
      SELECT *, SUM(svol) OVER (PARTITION BY anchor_id ORDER BY step) AS cum_vol
      FROM per_step),
    cutoff AS (
      SELECT anchor_id,
             MIN(CASE WHEN cum_vol >= required_vol THEN step END) AS cutoff_step
      FROM cum GROUP BY anchor_id
      HAVING MIN(CASE WHEN cum_vol >= required_vol THEN step END) IS NOT NULL)
    SELECT p.anchor_id AS purchase_id, c.cutoff_step,
           CAST(CAST(SUM(p.swpv) AS DECIMAL(38,8)) AS DOUBLE)
             / CAST(CAST(SUM(p.swvol) AS DECIMAL(38,8)) AS DOUBLE) AS vwap,
           CAST(CAST(SUM(p.svol) AS DECIMAL(38,6)) AS DOUBLE) AS covered_vol
    FROM cum p JOIN cutoff c
      ON p.anchor_id = c.anchor_id AND p.step <= c.cutoff_step
    GROUP BY 1, 2
    """,
    survey_ref="X4 expanding-window VWAP with exponential time-decay "
    "weighting (db/cex/trades/config.rs:26-48 use_block_time_weights_vwap; "
    "weight per trade in db/cex/trades/utils.rs:485-499; window cutoff "
    "stays unweighted as in time_window_vwam.rs)",
)
def x4_decay_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    anchors, ticks = _vwap_inputs(ev)
    out = expanding_vwap(
        anchors,
        ticks,
        pre_step=300_000_000_000,
        post_step=600_000_000_000,
        max_steps=6,
        pre_decay=_X4_PRE_DECAY,
        post_decay=_X4_POST_DECAY,
    )
    return out.select(
        F.col("anchor_id").alias("purchase_id"), "cutoff_step", "vwap", "covered_vol"
    )


@register(
    "s3_grid_downsample",
    oracle=f"""
    WITH {EV_CTE},
    g AS (
      SELECT user_id, ts_ns // {HOUR_NS} AS hour_cell, event_id, value,
             row_number() OVER (PARTITION BY user_id, ts_ns // {HOUR_NS}
                                ORDER BY ts_ns % {HOUR_NS} ASC, event_id ASC) AS rn
      FROM ev)
    SELECT user_id, hour_cell, event_id, value FROM g WHERE rn = 1
    """,
    survey_ref="S3 quote 1-sec grid argMin (clickhouse/queries/raw_cex_quotes.sql)",
)
def s3_grid_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    out = grid_downsample(
        ev,
        keys=["user_id"],
        grid=F.expr(f"ts_ns div {HOUR_NS}"),
        distance=F.col("ts_ns") % HOUR_NS,
        tiebreak="event_id",
    )
    return out.select("user_id", F.col("grid_cell").alias("hour_cell"), "event_id", "value")


@register(
    "s4_volume_rank",
    oracle=f"""
    WITH {EV_CTE},
    vol AS (
      SELECT event_type, user_id, SUM(CAST(value AS DECIMAL(18,6))) AS vol
      FROM ev GROUP BY event_type, user_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY vol DESC, user_id ASC) AS rnk
      FROM vol)
    SELECT event_type, rnk, user_id,
           CAST(CAST(vol AS DECIMAL(38,6)) AS DOUBLE) AS vol
    FROM ranked WHERE rnk <= 10
    """,
    survey_ref="S4 most-liquid-exchange ranking (queries/most_volume_pair_exchange.sql)",
)
def s4_volume_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    vol = ev.groupBy("event_type", "user_id").agg(F.sum(dec("value")).alias("vol"))
    ranked = rank_by_group(vol, ["event_type"], F.col("vol"), "user_id", top_k=10)
    return ranked.select("event_type", "rnk", "user_id", to_dbl("vol").alias("vol"))


@register(
    "c9_window_dedup",
    oracle=f"""
    WITH {EV_CTE},
    d AS (
      SELECT user_id, event_type, ts_ns // {DAY_NS} AS day, event_id,
             row_number() OVER (PARTITION BY user_id, event_type, ts_ns // {DAY_NS}
                                ORDER BY ts_ns ASC, event_id ASC) AS rn
      FROM ev)
    SELECT event_id, user_id, event_type, day FROM d WHERE rn = 1
    """,
    survey_ref="C9 transfer double-count pruning (tree_builder/tree_pruning.rs)",
)
def c9_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).withColumn("day", F.expr(f"ts_ns div {DAY_NS}"))
    out = window_dedup(ev, ["user_id", "event_type", "day"], ["ts_ns", "event_id"])
    return out.select("event_id", "user_id", "event_type", "day")


_STATS_CTE = f"""
    WITH {EV_CTE},
    s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sv,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS svv
      FROM ev GROUP BY event_type),
    stats AS (
      SELECT event_type, n, sv / n AS mean_value,
             sqrt(greatest(0, svv / n - (sv / n) * (sv / n))) AS stddev_value
      FROM s)
"""


def _spark_stats(ev: DataFrame) -> DataFrame:
    """Deterministic avg/stddev_pop from exact decimal sums (C11).

    Mirrors `finalize_tree` (tree/mod.rs:136-163) but via the
    sum/sum-of-squares identity so Spark and the oracle compute the same
    doubles from the same exact operands.
    """
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        to_dbl(F.sum(dec("value"))).alias("sv"),
        to_dbl(F.sum(dec("value") * dec("value"))).alias("svv"),
    )
    mean = F.col("sv") / F.col("n")
    return agg.select(
        "event_type",
        "n",
        mean.alias("mean_value"),
        # greatest(0, ·): the FP difference dips ~-1e-16 for constant/
        # singleton groups — DuckDB sqrt hard-errors, Spark returns NaN
        F.sqrt(F.greatest(F.lit(0.0), F.col("svv") / F.col("n") - mean * mean)).alias("stddev_value"),
    )


@register(
    "c11_group_stats",
    oracle=_STATS_CTE + "SELECT event_type, n, mean_value, stddev_value FROM stats",
    survey_ref="C11 block stats finalize (tree/mod.rs:136-163)",
)
def c11_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spark_stats(load_events(spark, sf_dir))


@register(
    "i14_outlier_discovery",
    oracle=_STATS_CTE
    + """
    SELECT e.event_id, e.event_type, e.value,
           s.mean_value + 2 * s.stddev_value AS threshold
    FROM ev e JOIN stats s ON e.event_type = s.event_type
    WHERE e.value > s.mean_value + 2 * s.stddev_value
    """,
    survey_ref="I14 possible-MEV discovery avg+2σ (brontes-inspect/src/discovery.rs:33-73)",
)
def i14_outlier_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    stats = _spark_stats(ev)
    thr = (F.col("mean_value") + 2 * F.col("stddev_value")).alias("threshold")
    return (
        ev.join(F.broadcast(stats.select("event_type", "mean_value", "stddev_value")), "event_type")
        .filter(F.col("value") > F.col("mean_value") + 2 * F.col("stddev_value"))
        .select("event_id", "event_type", "value", thr)
    )


@register(
    "i15_rolling_window",
    oracle=f"""
    WITH {EV_CTE}
    SELECT event_id, user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts_ns ASC, event_id ASC
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS DOUBLE)
             AS rolling_value
    FROM ev
    """,
    survey_ref="I15 multi-block sliding window (executor.rs, multi_block_window.rs:7-30)",
)
def i15_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts_ns").asc(), F.col("event_id").asc())
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "event_id", "user_id", to_dbl(F.sum(dec("value")).over(w)).alias("rolling_value")
    )


@register(
    "i1_sandwich_pairs",
    oracle=f"""
    WITH {EV_CTE},
    p AS (SELECT event_id, user_id, ts_ns, ts_ns // {DAY_NS} AS day
          FROM ev WHERE event_type = 'purchase'),
    pairs AS (
      SELECT user_id, day, event_id AS front_id, ts_ns AS front_ts,
             lead(event_id) OVER w AS back_id,
             lead(ts_ns) OVER w AS back_ts
      FROM p WINDOW w AS (PARTITION BY user_id, day ORDER BY ts_ns ASC, event_id ASC)),
    cand AS (SELECT * FROM pairs WHERE back_id IS NOT NULL)
    SELECT c.user_id, c.day, c.front_id, c.back_id,
           COUNT(v.event_id) AS n_victims,
           CAST(CAST(COALESCE(SUM(CAST(v.value AS DECIMAL(18,6))), 0) AS DECIMAL(38,6)) AS DOUBLE) AS victim_value
    FROM cand c
    LEFT JOIN (SELECT event_id, user_id, ts_ns, value, ts_ns // {DAY_NS} AS day
               FROM ev WHERE event_type = 'purchase') v
      ON v.day = c.day AND v.user_id != c.user_id
     AND v.ts_ns > c.front_ts AND v.ts_ns < c.back_ts
    GROUP BY c.user_id, c.day, c.front_id, c.back_id
    """,
    survey_ref="I1 possible-sandwich duplicate-sender windows + interleaved victims "
    "(mev_inspectors/sandwich/mod.rs:1014-1135)",
)
def i1_sandwich_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_ns", F.expr(f"ts_ns div {DAY_NS}").alias("day"), "value"
    )
    w = W.partitionBy("user_id", "day").orderBy(F.col("ts_ns").asc(), F.col("event_id").asc())
    cand = (
        p.select(
            "user_id",
            "day",
            F.col("event_id").alias("front_id"),
            F.col("ts_ns").alias("front_ts"),
            F.lead("event_id").over(w).alias("back_id"),
            F.lead("ts_ns").over(w).alias("back_ts"),
        )
        .filter(F.col("back_id").isNotNull())
    )
    v = p.select(
        F.col("day").alias("v_day"),
        F.col("user_id").alias("v_user"),
        F.col("ts_ns").alias("v_ts"),
        F.col("event_id").alias("v_id"),
        F.col("value").alias("v_value"),
    )
    return (
        cand.join(
            v,
            (F.col("v_day") == F.col("day"))
            & (F.col("v_user") != F.col("user_id"))
            & (F.col("v_ts") > F.col("front_ts"))
            & (F.col("v_ts") < F.col("back_ts")),
            "left",
        )
        .groupBy("user_id", "day", "front_id", "back_id")
        .agg(
            F.count("v_id").alias("n_victims"),
            to_dbl(
                F.coalesce(F.sum(dec("v_value")), F.lit(0).cast("decimal(18,6)"))
            ).alias("victim_value"),
        )
    )


@register(
    "i6_sequence_classify",
    oracle=f"""
    WITH {EV_CTE},
    seqs AS (
      SELECT user_id, ts_ns // {DAY_NS} AS day,
             list(event_type ORDER BY ts_ns ASC, event_id ASC) AS seq
      FROM ev GROUP BY 1, 2)
    SELECT user_id, day,
           len(seq) AS n_events,
           seq[1] AS first_type,
           seq[-1] AS last_type,
           (len(seq) >= 2 AND seq[1] = seq[-1]) AS is_round_trip,
           len(list_distinct(seq)) AS n_distinct_types,
           list_contains(seq, 'purchase') AS has_purchase
    FROM seqs
    """,
    survey_ref="I6 atomic-arb sequence classification (atomic_arb.rs:398-424)",
)
def i6_sequence_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    seqs = (
        ev.withColumn("day", F.expr(f"ts_ns div {DAY_NS}"))
        .groupBy("user_id", "day")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts_ns", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ).alias("seq")
        )
    )
    first = F.element_at("seq", 1)
    last = F.element_at("seq", -1)
    return seqs.select(
        "user_id",
        "day",
        F.size("seq").alias("n_events"),
        first.alias("first_type"),
        last.alias("last_type"),
        ((F.size("seq") >= 2) & (first == last)).alias("is_round_trip"),
        F.size(F.array_distinct("seq")).alias("n_distinct_types"),
        F.array_contains("seq", "purchase").alias("has_purchase"),
    )


@register(
    "o4_daily_rollup",
    oracle=f"""
    WITH {EV_CTE}
    SELECT ts_ns // {DAY_NS} AS day,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_value,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'purchase')
                AS DECIMAL(38,6)) AS DOUBLE) AS purchase_value
    FROM ev GROUP BY 1
    """,
    survey_ref="O4 MevBlock header build (composer/utils.rs:15-242)",
)
def o4_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    is_t = lambda t: (F.col("event_type") == t).cast("long")  # noqa: E731
    return ev.groupBy(F.expr(f"ts_ns div {DAY_NS}").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(is_t("purchase")).alias("n_purchases"),
        F.sum(is_t("click")).alias("n_clicks"),
        F.sum(is_t("error")).alias("n_errors"),
        F.countDistinct("user_id").alias("n_users"),
        to_dbl(F.sum(dec("value"))).alias("total_value"),
        to_dbl(F.sum(F.when(F.col("event_type") == "purchase", dec("value")))).alias(
            "purchase_value"
        ),
    )


@register(
    "x8_sessionize",
    oracle=f"""
    WITH {EV_CTE},
    flagged AS (
      SELECT user_id, event_id, ts_ns,
             CASE WHEN ts_ns - lag(ts_ns) OVER w > 1800000000000 OR
                       lag(ts_ns) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
    sess AS (
      SELECT user_id, event_id, ts_ns,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged)
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(ts_ns) AS session_start_ns, MAX(ts_ns) AS session_end_ns,
           MAX(ts_ns) - MIN(ts_ns) AS duration_ns
    FROM sess
    GROUP BY user_id, session_seq
    """,
    survey_ref="gap-based sessionization (30-min inactivity): the classic "
    "large-scale event-pipeline op — one per-user window + one hash agg, "
    "both on the same user_id shuffle",
)
def x8_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    GAP_NS = 30 * 60 * 1_000_000_000
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    w_cum = w.rowsBetween(W.unboundedPreceding, 0)
    prev = F.lag("ts_ns").over(w)
    flagged = ev.select("user_id", "event_id", "ts_ns").withColumn(
        "new_sess",
        F.when(prev.isNull() | (F.col("ts_ns") - prev > GAP_NS), 1).otherwise(0),
    )
    return (
        flagged.withColumn("session_seq", F.sum("new_sess").over(w_cum))
        .groupBy("user_id", F.col("session_seq").cast("long").alias("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ns").alias("session_start_ns"),
            F.max("ts_ns").alias("session_end_ns"),
            (F.max("ts_ns") - F.min("ts_ns")).alias("duration_ns"),
        )
    )


@register(
    "x6_optimistic_vwap",
    oracle=f"""
    WITH {EV_CTE},
    anchors AS (
      SELECT event_id AS anchor_id, user_id AS key, ts_ns AS anchor_ts,
             CAST(value AS DECIMAL(18,6)) AS required_vol
      FROM ev WHERE event_type = 'purchase'),
    ticks AS (
      SELECT user_id AS key, ts_ns AS tick_ts,
             CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS DECIMAL(18,6)) AS price,
             CAST(value AS DECIMAL(18,6)) AS vol,
             event_id AS tick_id
      FROM ev WHERE event_type IN ('view', 'click')),
    j AS (
      SELECT a.anchor_id, a.required_vol, t.price, t.vol, t.tick_id
      FROM anchors a JOIN ticks t ON a.key = t.key
       AND t.tick_ts >= a.anchor_ts - 1800000000000
       AND t.tick_ts <= a.anchor_ts + 1800000000000),
    cum AS (
      SELECT *, SUM(vol) OVER (PARTITION BY anchor_id
                               ORDER BY price ASC, tick_id ASC) AS cum_vol
      FROM j),
    taken AS (SELECT * FROM cum WHERE cum_vol - vol < required_vol)
    SELECT anchor_id AS purchase_id,
           CAST(CAST(required_vol AS DECIMAL(38,6)) AS DOUBLE) AS required_vol,
           CAST(CAST(SUM(price * vol) AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(SUM(vol) AS DECIMAL(38,6)) AS DOUBLE) AS optimistic_price,
           COUNT(*) AS n_trades
    FROM taken
    GROUP BY anchor_id, required_vol
    HAVING MAX(cum_vol) >= required_vol
    """,
    survey_ref="X6 optimistic VWAP (db/cex/trades/optimistic.rs:41-398): "
    "cheapest-trades-first idealized execution — one range join + one "
    "price-ordered cumulative window, no iteration",
)
def x6_optimistic_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cex_quotes import optimistic_vwap

    ev = load_events(spark, sf_dir)
    anchors, ticks = _vwap_inputs(ev)
    out = optimistic_vwap(anchors, ticks, window_us=1_800_000_000_000)
    return out.select(
        F.col("anchor_id").alias("purchase_id"),
        to_dbl("required_vol").alias("required_vol"),
        "optimistic_price",
        "n_trades",
    )


#: X6 optimistic decay weights (1/ns), the reference's per-µs
#: pre/post_decay_weight_op rescaled to the events grid like _X4_*.
_X6_PRE_DECAY = -3e-13
_X6_POST_DECAY = -1.2e-13


@register(
    "x6_decay_vwap",
    oracle=f"""
    WITH {EV_CTE},
    anchors AS (
      SELECT event_id AS anchor_id, user_id AS key, ts_ns AS anchor_ts,
             CAST(value AS DECIMAL(18,6)) AS required_vol
      FROM ev WHERE event_type = 'purchase'),
    ticks AS (
      SELECT user_id AS key, ts_ns AS tick_ts,
             CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS DECIMAL(18,6)) AS price,
             CAST(value AS DECIMAL(18,6)) AS vol,
             event_id AS tick_id
      FROM ev WHERE event_type IN ('view', 'click')),
    j AS (
      SELECT a.anchor_id, a.anchor_ts, a.required_vol,
             t.price, t.vol, t.tick_id, t.tick_ts
      FROM anchors a JOIN ticks t ON a.key = t.key
       AND t.tick_ts >= a.anchor_ts - 1800000000000
       AND t.tick_ts <= a.anchor_ts + 1800000000000),
    cum AS (
      SELECT *, SUM(vol) OVER (PARTITION BY anchor_id
                               ORDER BY price ASC, tick_id ASC) AS cum_vol
      FROM j),
    taken AS (
      SELECT *, CAST(EXP(CASE WHEN tick_ts <= anchor_ts
                 THEN -0.0000000000003 * CAST(anchor_ts - tick_ts AS DOUBLE)
                 ELSE -0.00000000000012 * CAST(tick_ts - anchor_ts AS DOUBLE) END)
               AS DECIMAL(9,6)) AS w
      FROM cum WHERE cum_vol - vol < required_vol)
    SELECT anchor_id AS purchase_id,
           CAST(CAST(required_vol AS DECIMAL(38,6)) AS DOUBLE) AS required_vol,
           CAST(CAST(SUM(CAST(price * vol AS DECIMAL(18,6)) * w) AS DECIMAL(38,8)) AS DOUBLE)
             / CAST(CAST(SUM(vol * w) AS DECIMAL(38,8)) AS DOUBLE) AS optimistic_price,
           COUNT(*) AS n_trades
    FROM taken
    GROUP BY anchor_id, required_vol
    HAVING MAX(cum_vol) >= required_vol
    """,
    survey_ref="X6 optimistic VWAP with exponential time-decay weighting "
    "(db/cex/trades/config.rs use_block_time_weights_optimistic; weight per "
    "selected trade in optimistic.rs:292-342 — basket selection stays "
    "cheapest-first on unweighted volume)",
)
def x6_decay_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cex_quotes import optimistic_vwap

    ev = load_events(spark, sf_dir)
    anchors, ticks = _vwap_inputs(ev)
    out = optimistic_vwap(
        anchors,
        ticks,
        window_us=1_800_000_000_000,
        pre_decay=_X6_PRE_DECAY,
        post_decay=_X6_POST_DECAY,
    )
    return out.select(
        F.col("anchor_id").alias("purchase_id"),
        to_dbl("required_vol").alias("required_vol"),
        "optimistic_price",
        "n_trades",
    )


@register(
    "x5_intermediary_price",
    oracle="""
    WITH legs AS (
      SELECT n.n_name AS base_token, r.r_name AS quote_token,
             CAST(n.n_nationkey + 1 AS DECIMAL(18,6)) AS price
      FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
      UNION ALL
      SELECT r.r_name, 'WORLD', CAST(r.r_regionkey + 2 AS DECIMAL(18,6))
      FROM region r),
    a AS (SELECT base_token AS from_token, quote_token AS mid_token, price AS p0 FROM legs),
    b AS (SELECT base_token AS mid_token, quote_token AS to_token, price AS p1 FROM legs)
    SELECT a.from_token, b.to_token, a.mid_token,
           CAST(CAST(a.p0 * b.p1 AS DECIMAL(38,6)) AS DOUBLE) AS price
    FROM a JOIN b USING (mid_token)
    WHERE a.from_token <> b.to_token
    """,
    survey_ref="X5 intermediary-leg pricing (time_window_vwam.rs:168-300): "
    "price(A,B) = price(A,X)·price(X,B) over every shared intermediary — "
    "the leg relation here derives from the nation→region→WORLD dims",
)
def x5_intermediary_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cex_quotes import intermediary_price
    from ..sources.testdata import load_table

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    leg_a = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select(
        F.col("n_name").alias("base_token"),
        F.col("r_name").alias("quote_token"),
        (F.col("n_nationkey") + 1).cast("decimal(18,6)").alias("price"),
    )
    leg_b = region.select(
        F.col("r_name").alias("base_token"),
        F.lit("WORLD").alias("quote_token"),
        (F.col("r_regionkey") + 2).cast("decimal(18,6)").alias("price"),
    )
    out = intermediary_price(leg_a.unionByName(leg_b))
    return out.select(
        "from_token", "to_token", "mid_token", to_dbl("price").alias("price")
    )


@register(
    "x9_funnel_stages",
    oracle=f"""
    WITH {EV_CTE},
    s1 AS (SELECT user_id, MIN(ts_ns) AS t1 FROM ev
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts_ns) AS t2 FROM ev e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts_ns > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts_ns) AS t3 FROM ev e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts_ns > s2.t2 GROUP BY e.user_id),
    u AS (SELECT DISTINCT user_id FROM ev)
    SELECT u.user_id, s1.t1, s2.t2, s3.t3,
           CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                     WHEN s2.t2 IS NOT NULL THEN 2
                     WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS stage
    FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
           LEFT JOIN s3 USING (user_id)
    """,
    survey_ref="ordered funnel analysis (view -> click -> purchase, strictly "
    "increasing timestamps): ONE user_id shuffle — per-user sorted event "
    "list + an in-row aggregate fold computes all stage times, vs the "
    "textbook 3-join formulation the oracle uses (equivalent because the "
    "strict > makes same-timestamp tie order irrelevant: the fold's first "
    "qualifying event IS the join's MIN). At 100 TB the single shuffle "
    "replaces three self-join shuffles over the full event stream; the "
    "fold is per-user linear",
)
def x9_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import funnel_stage_times

    ev = load_events(spark, sf_dir)
    # prefilter=False: every user appears (stage 0 for never-entered) in
    # the same single shuffle — matches the oracle's DISTINCT-user spine
    return funnel_stage_times(
        ev, ["view", "click", "purchase"], prefilter=False
    )


@register(
    "x10_retention_cohorts",
    oracle=f"""
    WITH {EV_CTE},
    d AS (SELECT DISTINCT user_id, ts_ns // 86400000000000 AS day FROM ev),
    c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
    SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
           COUNT(*) AS n_users
    FROM d JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
    survey_ref="retention cohort matrix: cohort = each user's first active "
    "epoch-day, n_users active per (cohort, day-offset) cell — the classic "
    "growth-analytics rollup. ONE scan, TWO exchanges (plan-audited): an "
    "up-front user_id repartition satisfies both the (user, day) distinct "
    "(subset-key clustering) and the per-user cohort-min window, so no "
    "second scan and no join; only the final tiny (cohort, offset) agg "
    "re-shuffles. Day arithmetic is integer `div` (ns epoch / 86400e9), "
    "identical in both engines",
)
def x10_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        ev.select("user_id", F.expr("ts_ns div 86400000000000").alias("day"))
        .repartition(n_part, F.col("user_id"))
        .dropDuplicates(["user_id", "day"])
    )
    cohort = F.min("day").over(W.partitionBy("user_id"))
    return (
        d.withColumn("cohort_day", cohort)
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


#: 6-hour grid in nanoseconds for the gapfill gate
_GF_STEP = 21_600_000_000_000

@register(
    "x11_gapfill",
    oracle=f"""
    WITH ev AS (
      SELECT epoch_ns(ts) AS ts_ns, user_id, value FROM events
      WHERE value IS NOT NULL),
    rng AS (
      SELECT user_id AS key, MIN(ts_ns) AS mn, MAX(ts_ns) AS mx
      FROM ev GROUP BY user_id),
    grid AS (
      SELECT key, unnest(generate_series((mn // {_GF_STEP}) * {_GF_STEP}, mx, {_GF_STEP})) AS ts,
             CAST(NULL AS DOUBLE) AS v, 0 AS is_real
      FROM rng),
    realr AS (
      SELECT user_id AS key, ts_ns AS ts, value AS v, 1 AS is_real FROM ev),
    u AS (SELECT * FROM grid UNION ALL SELECT * FROM realr),
    w AS (
      SELECT key, ts, is_real,
        last_value(CASE WHEN is_real = 1 THEN v END IGNORE NULLS) OVER win_p AS prev_v,
        last_value(CASE WHEN is_real = 1 THEN ts END IGNORE NULLS) OVER win_p AS prev_ts,
        first_value(CASE WHEN is_real = 1 THEN v END IGNORE NULLS) OVER win_f AS next_v,
        first_value(CASE WHEN is_real = 1 THEN ts END IGNORE NULLS) OVER win_f AS next_ts
      FROM u
      WINDOW
        win_p AS (PARTITION BY key ORDER BY ts, is_real DESC, v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        win_f AS (PARTITION BY key ORDER BY ts, is_real DESC, v
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT key, ts AS grid_ts, prev_v AS value_ffill,
           CASE WHEN prev_v IS NULL THEN NULL
                WHEN next_v IS NULL OR next_ts = prev_ts THEN prev_v
                ELSE prev_v + (next_v - prev_v)
                     * (CAST(ts - prev_ts AS DOUBLE) / CAST(next_ts - prev_ts AS DOUBLE))
           END AS value_interp
    FROM w WHERE is_real = 0
    """,
    survey_ref="regular-grid gap filling (operators/gapfill.py): per-user "
    "6-hour grid with locf forward fill + linear interpolation (the "
    "TimescaleDB time_bucket_gapfill/locf/interpolate family over S3's "
    "grid semantics); in-row sequence grid, one union, ONE per-key ordered "
    "window for both fills — two key shuffles total; fixed IEEE evaluation "
    "shape makes the interpolation bit-exact across engines",
)
def x11_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.gapfill import gapfill
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    return gapfill(ev, "user_id", "ts_ns", "value", step=_GF_STEP)

@register(
    "x12_mad_outliers",
    oracle="""
    WITH ev AS (
      SELECT event_id, event_type AS key, value AS v FROM events
      WHERE value IS NOT NULL),
    r AS (
      SELECT key, event_id, v,
             row_number() OVER (PARTITION BY key ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY key) AS n
      FROM ev),
    m AS (
      SELECT key, event_id, v,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) OVER (PARTITION BY key) AS med
      FROM r),
    d AS (SELECT key, event_id, v, med, ABS(v - med) AS dev FROM m),
    r2 AS (
      SELECT key, event_id, v, med, dev,
             row_number() OVER (PARTITION BY key ORDER BY dev) AS rn2,
             COUNT(*) OVER (PARTITION BY key) AS n2
      FROM d),
    mm AS (
      SELECT key, event_id, v, med, dev,
             MAX(CASE WHEN rn2 = (n2 + 1) // 2 THEN dev END) OVER (PARTITION BY key) AS mad
      FROM r2)
    SELECT key, event_id, v AS value, med, mad
    FROM mm WHERE dev > 3.0 * mad
    """,
    survey_ref="median/MAD robust outlier flagging per event_type "
    "(operators/anomaly.py, Hampel's rule |x-med| > k*MAD with 50% "
    "breakdown — the robust complement of i14's avg+2sigma): lower order "
    "statistics via two sort-windows over ONE key shuffle, selection not "
    "arithmetic, so doubles are exact",
)
def x12_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.anomaly import mad_anomalies
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir).select("event_id", "event_type", "value")
    return mad_anomalies(ev, "event_type", "value", k=3.0, keep_cols=["event_id"])

@register(
    "x15_window_suite",
    oracle="""
    WITH ev AS (
      SELECT event_id, epoch_ns(ts) AS ts_ns, user_id, value FROM events
      WHERE value IS NOT NULL)
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS INT) AS rn,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           lag(value, 1) OVER w AS prev_value,
           lead(value, 1) OVER w AS next_value,
           value - first_value(value) OVER w AS delta_from_first,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)
    """,
    survey_ref="analytic window-function breadth in one gate — row_number/"
    "ntile/percent_rank/cume_dist/lag/lead/first_value over a per-user "
    "event ordering (the §2.9 'window kernel' families an analytics "
    "engine is judged on), all sharing ONE user_id exchange + sort; "
    "percent_rank/cume_dist are exact rationals of integer ranks so the "
    "doubles are bit-identical across engines",
)
def x15_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    wp = W.partitionBy("user_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        (F.col("value") - F.first("value").over(w)).alias("delta_from_first"),
        F.count(F.lit(1)).over(wp).alias("n_events"),
    )

#: 1-hour candle buckets in nanoseconds
_OHLC_B = 3_600_000_000_000

@register(
    "s11_ohlc_candles",
    oracle=f"""
    WITH ev AS (
      SELECT event_type AS key, epoch_ns(ts) AS ts_ns, value AS p
      FROM events WHERE value IS NOT NULL),
    b AS (
      SELECT key, ts_ns - ts_ns % {_OHLC_B} AS bucket_start, ts_ns, p FROM ev),
    r AS (
      SELECT key, bucket_start, p,
             row_number() OVER (PARTITION BY key, bucket_start
                                ORDER BY ts_ns, p) AS ra,
             row_number() OVER (PARTITION BY key, bucket_start
                                ORDER BY ts_ns DESC, p DESC) AS rd
      FROM b)
    SELECT key, bucket_start,
           MAX(CASE WHEN ra = 1 THEN p END) AS open,
           MAX(p) AS high,
           MIN(p) AS low,
           MAX(CASE WHEN rd = 1 THEN p END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM r GROUP BY key, bucket_start
    """,
    survey_ref="OHLC candle downsampling (operators/windows.ohlc_downsample) "
    "— the finance-native grid reduction beside S3's last-tick grid: "
    "open/high/low/close per 1h cell via min_by/max_by on the (ts, price) "
    "composite (selection, not arithmetic — doubles exact), ONE hash "
    "aggregate with map-side combine, no window; (ts,price) tie-break "
    "makes duplicate-timestamp feeds deterministic",
)
def s11_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import ohlc_downsample
    from ..sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    return ohlc_downsample(ev, "event_type", "ts_ns", "value", bucket_ns=_OHLC_B)
