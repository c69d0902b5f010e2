"""Window-function surface: ranking, analytic (lag/lead), frames.

SURVEY.md §2 Part B "Window functions". All orderings inside windows
are total (tie-broken by a key column) so results are deterministic
under any partitioning — required for oracle hash comparison.

Scale: a window partitioned by a key is one shuffle on that key;
unpartitioned windows (global rank) serialize to a single task and are
avoided except on pre-aggregated (small) inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from spotify_app_etl_spark.plans.common import dec, t
from spotify_app_etl_spark.registry import query


@query(
    "q_window_running",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       ROW_NUMBER() OVER w AS rn,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       CAST(LAG(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS prev_price,
       CAST(LEAD(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(w).alias("rn"),
        F.sum(dec("o_totalprice")).over(frame).cast("double").alias("running_spend"),
        F.lag(dec("o_totalprice")).over(w).cast("double").alias("prev_price"),
        F.lead(dec("o_totalprice")).over(w).cast("double").alias("next_price"),
    )


@query(
    "q_window_rank",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice,
       RANK()       OVER w AS price_rank,
       DENSE_RANK() OVER w AS price_dense_rank,
       NTILE(4)     OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS quartile
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
""",
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    wt = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(wt).alias("quartile"),
    )


@query(
    "q_topk_per_group",
    note="top-3 orders per customer by price — window + filter, the "
    "scalable per-group top-k idiom (no global sort)",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
""",
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "q_window_moving_avg",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS qty_ma3
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-2, W.currentRow)
    )
    # AVG over DECIMAL: numerator is an exact 3-row decimal sum on both
    # engines; both then divide in the decimal domain. To keep division
    # identical we recompute avg as sum/count in double.
    return t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (
            F.sum(dec("l_quantity")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("qty_ma3"),
    )


@query(
    "q_window_analytic_extras",
    note="percent_rank/cume_dist/first_value/last_value/nth_value — "
    "ratios of identically-computed ints divide to identical doubles",
    oracle="""
SELECT o_custkey, o_orderkey,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume,
       FIRST_VALUE(o_orderkey) OVER w AS first_ok,
       LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS last_ok,
       NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS second_ok
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window", "analytic"),
)
def window_analytic_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # full frame so last/nth see the whole partition (the default frame
    # stops at CURRENT ROW — same default in DuckDB, but explicit is
    # deterministic under future default changes)
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wf).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_ok"),
    )
