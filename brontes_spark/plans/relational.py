"""Relational-kernel queries (SURVEY.md §2.9 checklist) over the testdata
star schema. Each query instantiates reference operators — filters/projections
(T1), semi/anti joins (T8/T6), broadcast dimension joins (C1/A3-style),
hash aggregations (A1/C11/O4/O5), dominant-row dedup (A7/O3) — as declarative
DataFrame plans with DuckDB oracle twins.

Scale notes apply to all: dimension tables (region/nation/supplier/part at
TPC-H ratios) are broadcast; fact-fact joins shuffle on their keys with AQE
handling skew; aggregates use exact decimals (functions/decimals.py) so
results are partition-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.decimals import dec, to_dbl
from ..operators.accounting import delta_accounting
from ..operators.windows import keep_largest, rank_by_group
from ..sources.testdata import load_table
from .registry import register

# (1 - discount) / (1 + tax) style factors: precision 8 keeps every decimal
# product below precision 38 → no intermediate rounding (see decimals.py).
_FACTOR = "decimal(8,6)"


def _disc_price():
    return dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(_FACTOR)


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6)) * CAST(1 + l_tax AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ref="§2.9 aggregations; O5-style wide agg (db/block_analysis.rs:22+)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp_ntz(F.lit("1998-09-02"))
    )
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        to_dbl(F.sum(dec("l_quantity"))).alias("sum_qty"),
        to_dbl(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
        to_dbl(F.sum(_disc_price())).alias("sum_disc_price"),
        to_dbl(
            F.sum(_disc_price() * (F.lit(1) + F.col("l_tax")).cast(_FACTOR))
        ).alias("sum_charge"),
        (to_dbl(F.sum(dec("l_quantity"))) / cnt).alias("avg_qty"),
        (to_dbl(F.sum(dec("l_extendedprice"))) / cnt).alias("avg_price"),
        (to_dbl(F.sum(dec("l_discount"))) / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "t1_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(38,6)) AS DOUBLE) AS disc_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    survey_ref="T1 collect/predicates (tree/mod.rs:217-247, search_args.rs:13-228)",
)
def t1_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1997-01-01")))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        to_dbl(dec("l_extendedprice") * F.col("l_discount").cast(_FACTOR)).alias("disc_revenue"),
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    survey_ref="§2.9 scalar agg; A6 gas accounting arithmetic (tree/root.rs:362-380)",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1997-01-01")))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        to_dbl(F.sum(dec("l_extendedprice") * F.col("l_discount").cast(_FACTOR))).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q3_top_urgent",
    oracle="""
    WITH rev AS (
      SELECT l_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             o_orderpriority,
             SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS rev
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1995-03-15'
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY rev DESC, l_orderkey ASC) AS rn FROM rev
    )
    SELECT l_orderkey, orderdate, o_orderpriority, CAST(CAST(rev AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM ranked WHERE rn <= 10
    """,
    survey_ref="§2.9 joins + top-k (O6 ordering composer/mod.rs:185-186)",
)
def q3_top_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp_ntz(F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp_ntz(F.lit("1995-03-15"))
    )
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(_disc_price()).alias("rev"))
    )
    # global top-k via sort+limit: plans as TakeOrderedAndProject (per-
    # partition partial top-k, driver merge) instead of a single-partition
    # global window — the rank column isn't in the output, so the row set
    # is identical
    return (
        rev.orderBy(F.col("rev").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey", "orderdate", "o_orderpriority",
            to_dbl("rev").alias("revenue"),
        )
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE year(o_orderdate) = 1996
    GROUP BY n_name
    """,
    survey_ref="§2.9 multi-join w/ broadcast dims (C1 dispatch join pattern)",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (supp["s_nationkey"] == cust["c_nationkey"]),
        )
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(
            to_dbl(F.sum(_disc_price())).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS ship_month,
      CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))
            ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(38,6)) AS DOUBLE) AS promo_revenue,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    survey_ref="§2.9 conditional agg (I3 count_if sandwich/mod.rs:556-740)",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            to_dbl(
                F.sum(F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero))
            ).alias("promo_revenue"),
            to_dbl(F.sum(_disc_price())).alias("total_revenue"),
        )
    )


@register(
    "t8_exists_semijoin",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.06)
    """,
    survey_ref="T8 tx_must_contain_action (tree/mod.rs:50-55) → semi join",
)
def t8_exists_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.06)
    return orders.join(
        li, orders["o_orderkey"] == li["l_orderkey"], "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "t6_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2001-01-01')
    """,
    survey_ref="T6/T4 coverage anti-join (tree/util/dedup.rs; tree/mod.rs:307-322)",
)
def t6_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp_ntz(F.lit("2001-01-01"))
    )
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "a7_overlap_dedup",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    survey_ref="A7 dedup_bundles keep-largest (shared_utils.rs:655-710); O3 precedence",
)
def a7_overlap_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    kept = keep_largest(
        orders, ["o_custkey", "o_orderdate"], F.col("o_totalprice"), "o_orderkey"
    )
    return kept.select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "a1_delta_accounting",
    oracle="""
    WITH deltas AS (
      SELECT 'C' || CAST(o_custkey AS VARCHAR) AS party, 'USD' AS token,
             -(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS amount
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      UNION ALL
      SELECT 'S' || CAST(l_suppkey AS VARCHAR) AS party, 'USD' AS token,
             CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6)) AS amount
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT party, token, CAST(CAST(SUM(amount) AS DECIMAL(38,6)) AS DOUBLE) AS net_amount, COUNT(*) AS n_deltas
    FROM deltas GROUP BY party, token
    """,
    survey_ref="A1/A2 delta accounting (normalized_actions/accounting.rs:19-57)",
)
def a1_delta_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_custkey", "l_suppkey", _disc_price().alias("amt")
    )
    net = delta_accounting(
        j,
        deltas=[
            (
                F.concat(F.lit("C"), F.col("o_custkey").cast("string")),
                F.lit("USD"),
                (-F.col("amt")).cast("decimal(27,12)"),
            ),
            (
                F.concat(F.lit("S"), F.col("l_suppkey").cast("string")),
                F.lit("USD"),
                F.col("amt").cast("decimal(27,12)"),
            ),
        ],
    )
    return net.select("party", "token", to_dbl("net_amount").alias("net_amount"), "n_deltas")


@register(
    "o5_wide_rollup",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY CAST(c_acctbal AS DECIMAL(18,6)) DESC, c_custkey ASC) AS rn
      FROM customer
    ), cust AS (
      SELECT c_nationkey,
             COUNT(*) AS n_customers,
             SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS acctbal,
             MIN(CASE WHEN rn = 1 THEN c_custkey END) AS top_custkey
      FROM ranked GROUP BY c_nationkey
    ), ords AS (
      SELECT c_nationkey, COUNT(*) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
    )
    SELECT n_name, n_customers, CAST(CAST(acctbal AS DECIMAL(38,6)) AS DOUBLE) AS total_acctbal, top_custkey,
           n_orders, CAST(CAST(revenue AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
    FROM nation JOIN cust ON n_nationkey = cust.c_nationkey
                JOIN ords ON n_nationkey = ords.c_nationkey
    """,
    survey_ref="O5 BlockAnalysis wide rollup (db/block_analysis.rs:22-2667); max_by top-k",
)
def o5_wide_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    cust_agg = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(dec("c_acctbal")).alias("acctbal"),
        F.min_by(
            "c_custkey", F.struct((-dec("c_acctbal")).alias("a"), F.col("c_custkey").alias("k"))
        ).alias("top_custkey"),
    )
    ord_agg = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(cust["c_nationkey"].alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("revenue"),
        )
    )
    return (
        F.broadcast(nation)
        .join(cust_agg, nation["n_nationkey"] == cust_agg["c_nationkey"])
        .join(ord_agg, nation["n_nationkey"] == ord_agg["nk"])
        .select(
            "n_name",
            "n_customers",
            to_dbl("acctbal").alias("total_acctbal"),
            "top_custkey",
            "n_orders",
            to_dbl("revenue").alias("total_revenue"),
        )
    )


@register(
    "q18_big_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(CAST(sum_qty AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    survey_ref="§2.9 agg-having + join chain (T8 existence over aggregates)",
)
def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, cust["c_custkey"] == orders["o_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            to_dbl("sum_qty").alias("sum_qty"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    survey_ref="§2.9 TPC-H q10 shape: selective fact filter + dim joins + "
    "top-k (TakeOrdered, distributed partial sort)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(to_dbl(F.sum(_disc_price())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name < cn.n_name
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
    survey_ref="§2.9 TPC-H q7 shape: fact-fact join + double dim alias join "
    "with cross-nation predicate",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    cn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(to_dbl(F.sum(_disc_price())).alias("volume"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH bal_stats AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS s, COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0),
    no_orders AS (
      SELECT c.* FROM customer c
      ANTI JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
      ON o.o_custkey = c.c_custkey)
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6))
                AS DOUBLE) AS totacctbal
    FROM no_orders, bal_stats
    WHERE CAST(c_acctbal AS DECIMAL(18,6)) * n > s
    GROUP BY c_mktsegment
    """,
    survey_ref="§2.9 TPC-H q22 shape: scalar-subquery broadcast + anti-join "
    "(customers above average balance with no urgent orders — the base anti-join is vacuous on this dense testdata)",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    # exact-decimal threshold via cross-multiplication (bal·n > Σbal):
    # a double avg would be partition-order dependent and can flip a
    # boundary customer run-to-run — bit-exact determinism policy
    bal_stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    no_orders = cust.join(
        urgent, cust["c_custkey"] == urgent["o_custkey"], "left_anti"
    )
    return (
        no_orders.join(F.broadcast(bal_stats))  # 1-row scalar, broadcast cross
        .filter(dec("c_acctbal") * F.col("n") > F.col("s"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            to_dbl(F.sum(dec("c_acctbal"))).alias("totacctbal"),
        )
    )


@register(
    "q4_priority_ontime",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
    GROUP BY o_orderpriority
    """,
    survey_ref="§2.9 TPC-H q4 shape: EXISTS semi-join feeding an aggregate "
    "(T8 tx_must_contain_action, tree/mod.rs:50-55, at the order grain)",
)
def q4_priority_ontime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp_ntz(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp_ntz(F.lit("1997-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 365 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q12_priority_pivot",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
    survey_ref="§2.9 TPC-H q12 shape: fact-fact shuffle join + conditional "
    "CASE pivot aggregation (I3 conditional agg, sandwich/mod.rs:556-740)",
)
def q12_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1998-01-01")))
    )
    orders = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus <> 'F') o
        ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    survey_ref="§2.9 TPC-H q13 shape: outer join + two-level aggregation "
    "(count-of-counts histogram; O4 header counts analog)",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    ANTI JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) bad
      ON bad.s_suppkey = l.l_suppkey
    WHERE p.p_size <= 20
    GROUP BY p.p_brand, p.p_type
    """,
    survey_ref="§2.9 TPC-H q16 shape: NOT-IN as anti-join + distinct "
    "aggregation (O3 anti-join precedence dedup analog)",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH stats AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total_price,
           COUNT(*) AS n_small
    FROM lineitem l JOIN stats s ON s.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,6)) * 5 * s.cnt < s.sq
    """,
    survey_ref="§2.9 TPC-H q17 shape: correlated per-group average threshold, "
    "made exact via decimal cross-multiplication (qty·5·n < Σqty ⟺ "
    "qty < 0.2·avg; same determinism policy as q22)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.sum(dec("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(stats, li["l_partkey"] == stats["sp_partkey"])
        .filter(dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sq"))
        .agg(
            to_dbl(F.sum(dec("l_extendedprice"))).alias("total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH fo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 180 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l
      JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
        ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey, l.l_suppkey),
    per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             SUM(is_late) AS n_late,
             MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
      FROM fo GROUP BY l_orderkey)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM per_order p JOIN supplier s ON s.s_suppkey = p.late_supp
    WHERE p.n_supp >= 2 AND p.n_late = 1
    GROUP BY s.s_name
    """,
    survey_ref="§2.9 TPC-H q21 shape: nested exists/not-exists — the sole "
    "late supplier among multi-supplier finished orders (two-level grouped "
    "semi/anti logic; I10 JIT candidate counting analog)",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    fo = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = fo.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supplier), per_order["late_supp"] == supplier["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY 1, 2),
    best AS (
      SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS min_cost
      FROM costs)
    SELECT p.p_partkey, p.p_brand, b.l_suppkey AS s_suppkey,
           CAST(b.cost AS DOUBLE) AS cost
    FROM best b JOIN part p ON p.p_partkey = b.l_partkey
    WHERE b.cost = b.min_cost AND p.p_size <= 10
    """,
    survey_ref="§2.9 TPC-H q2 shape: correlated min-per-group as a window "
    "(min-cost supplier per part within a region; the reference's "
    "min-over-group pattern, e.g. O5 max_by duals)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    dims = supp.join(
        F.broadcast(nation.join(F.broadcast(region),
                                nation["n_regionkey"] == region["r_regionkey"])),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey")
    costs = (
        li.join(F.broadcast(dims), li["l_suppkey"] == dims["s_suppkey"], "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(dec("l_extendedprice")).alias("cost"))
    )
    w = W.partitionBy("l_partkey")
    best = costs.withColumn("min_cost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("min_cost")
    )
    return best.join(
        F.broadcast(part), best["l_partkey"] == part["p_partkey"]
    ).select(
        "p_partkey", "p_brand",
        F.col("l_suppkey").alias("s_suppkey"),
        to_dbl("cost").alias("cost"),
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH vals AS (
      SELECT l.l_suppkey, l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY 1, 2),
    total AS (SELECT SUM(val) AS tot, COUNT(*) AS n FROM vals)
    SELECT v.l_partkey AS p_partkey,
           CAST(CAST(SUM(v.val) AS DECIMAL(38,6)) AS DOUBLE) AS part_value
    FROM vals v, total t
    GROUP BY v.l_partkey, t.tot, t.n
    HAVING SUM(v.val) * t.n * 10 > t.tot
    """,
    survey_ref="§2.9 TPC-H q11 shape: HAVING against a global scalar, made "
    "exact via cross-multiplication (Σpart·n·10 > Σtotal ⟺ part > "
    "total/(10n) — the q22/q17 determinism policy)",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    chosen = supp.join(
        F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"], "left_semi"
    ).select("s_suppkey")
    vals = (
        li.join(F.broadcast(chosen), li["l_suppkey"] == chosen["s_suppkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("val"))
    )
    total = vals.agg(F.sum("val").alias("tot"), F.count(F.lit(1)).alias("n"))
    return (
        vals.join(F.broadcast(total))
        .groupBy("l_partkey", "tot", "n")
        .agg(F.sum("val").alias("pv"))
        .filter(F.col("pv") * F.col("n") * 10 > F.col("tot"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            to_dbl("pv").alias("part_value"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * CAST(1 - l_discount AS DECIMAL(8,6))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey),
    best AS (SELECT *, MAX(total_rev) OVER () AS mx FROM rev)
    SELECT s.s_suppkey, s.s_name,
           CAST(CAST(b.total_rev AS DECIMAL(38,6)) AS DOUBLE) AS total_rev
    FROM best b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE b.total_rev = b.mx
    """,
    survey_ref="§2.9 TPC-H q15 shape: top-supplier by quarterly revenue — "
    "global max over an aggregate (ties kept, exact decimals so the max is "
    "well-defined across engines)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1996-04-01")))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("total_rev"))
    best = rev.withColumn("mx", F.max("total_rev").over(W.partitionBy())).filter(
        F.col("total_rev") == F.col("mx")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return best.join(
        F.broadcast(supp), best["l_suppkey"] == supp["s_suppkey"]
    ).select("s_suppkey", "s_name", to_dbl("total_rev").alias("total_rev"))


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                 * CAST(1 - l.l_discount AS DECIMAL(8,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    survey_ref="§2.9 TPC-H q19 shape: disjunctive multi-clause predicate "
    "over a dim join (the OR-of-ANDs predicate DSL of search_args.rs:13-228)",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 20)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 40)
           & F.col("l_quantity").between(20, 50))
    )
    return j.filter(clause).agg(
        to_dbl(F.sum(_disc_price())).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year, n.n_name,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                 * CAST(1 - l.l_discount AS DECIMAL(8,6))) AS volume
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
      GROUP BY 1, 2),
    tot AS (
      SELECT o_year, SUM(volume) AS total FROM rev GROUP BY o_year)
    SELECT rev.o_year, rev.n_name,
           CAST(CAST(rev.volume AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(CAST(tot.total AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share
    FROM rev JOIN tot USING (o_year)
    """,
    survey_ref="§2.9 TPC-H q8 shape: per-year nation market share — ratio of "
    "two exact-decimal aggregates converted to identical doubles before the "
    "one division (O4 builder-share arithmetic analog)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = cust.join(
        F.broadcast(
            nation.join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        ),
        cust["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey", "n_name")
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(dims), orders["o_custkey"] == dims["c_custkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"), "n_name")
        .agg(F.sum(_disc_price()).alias("volume"))
    )
    tot = rev.groupBy("o_year").agg(F.sum("volume").alias("total"))
    return rev.join(tot, "o_year").select(
        F.col("o_year").cast("long").alias("o_year"),
        "n_name",
        (to_dbl("volume") / to_dbl("total")).alias("mkt_share"),
    )


@register(
    "q20_majority_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2),
    per_part AS (
      SELECT l_partkey, SUM(sq) AS tot FROM per_supp GROUP BY 1)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM per_supp ps
    JOIN per_part pp ON pp.l_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE ps.sq * 2 > pp.tot
    """,
    survey_ref="§2.9 TPC-H q20 shape: nested semi — suppliers providing the "
    "majority of some part's yearly volume (exact-decimal cross-mult "
    "threshold, distinct projection)",
)
def q20_majority_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1998-01-01")))
    )
    per_supp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("sq")
    )
    per_part = per_supp.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum("sq").alias("tot")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        per_supp.join(per_part, per_supp["l_partkey"] == per_part["pp_partkey"])
        .filter(F.col("sq") * 2 > F.col("tot"))
        .join(F.broadcast(supp), per_supp["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
      CAST(CAST(SUM(
          CAST(l.l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l.l_discount AS DECIMAL(8,6))
          - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(0.01 AS DECIMAL(4,2))
            * CAST(l.l_quantity AS DECIMAL(12,2))
        ) AS DECIMAL(38,6)) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
    survey_ref="§2.9 TPC-H q9 shape: product-type profit by supplier nation "
    "and order year (testdata has no partsupp, so supply cost is the "
    "deterministic proxy 1% of p_retailprice per unit; 5-table join, "
    "LIKE-filtered dim, exact-decimal profit difference)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # every decimal product stays under precision 38 (cost term peaks at
    # DECIMAL(30,6), the difference at DECIMAL(37,12)) so no intermediate
    # rounding on either engine; the LIKE-filtered part dim broadcasts and
    # prunes lineitem BEFORE the one shuffle join against orders.
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit("0.01").cast("decimal(4,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    sn = supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(to_dbl(F.sum(_disc_price() - cost)).alias("sum_profit"))
    )


@register(
    "o7_grouping_sets",
    oracle="""
    SELECT COALESCE(lang, '<all>') AS lang,
           COALESCE(source, '<all>') AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(GROUPING(lang) * 2 + GROUPING(source) AS INT) AS gid
    FROM documents
    GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
    """,
    survey_ref="multi-grain rollup via GROUPING SETS — the OLAP cube "
    "surface of O5's wide rollups generalized: one pass emits (lang, "
    "source)/(lang)/(source)/grand-total grains with GROUPING() ids "
    "disambiguating real NULLs from subtotal rows; Spark expands grouping "
    "sets in a single Expand+hash-agg (one exchange), identical "
    "semantics in both engines",
)
def o7_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_gs_documents")
    return spark.sql(
        """
        SELECT COALESCE(lang, '<all>') AS lang,
               COALESCE(source, '<all>') AS source,
               COUNT(*) AS n_docs,
               SUM(n_chars) AS total_chars,
               CAST(GROUPING(lang) * 2 + GROUPING(source) AS INT) AS gid
        FROM _gs_documents
        GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        """
    )
