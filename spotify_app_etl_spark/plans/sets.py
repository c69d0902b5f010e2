"""Set operations + duplicate elimination.

SURVEY.md §2: the reference's only set op is union+distinct over track
ids (spotify-etl.py:250, ``set(a + b)``); here the full surface:
union / intersect / except / dropDuplicates, all over testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spotify_app_etl_spark.plans.common import t
from spotify_app_etl_spark.registry import query


@query(
    "q_union_distinct",
    note="reference idiom A11: union two key columns, dedupe "
    "(spotify-etl.py:250)",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
    tags=("setop", "distinct"),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@query(
    "q_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
    tags=("setop",),
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@query(
    "q_except",
    note="customers who have placed 'O' orders but never 'F' orders",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("setop",),
)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_.subtract(finished)  # EXCEPT DISTINCT (exceptAll = multiset)


@query(
    "q_drop_duplicates",
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""",
    tags=("distinct",),
)
def drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").dropDuplicates()
