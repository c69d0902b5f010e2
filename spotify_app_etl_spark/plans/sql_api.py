"""SQL-API surface: ``spark.sql`` over registered views — including
subquery forms (EXISTS / IN / scalar) — and CSV/JSON source
round-trips.

The engine is DataFrame-first, but the SQL front-end is part of the
query surface a reference user would expect (SURVEY.md §2 Part B
file-format scans row; the reference itself reads REST JSON only).
Catalyst compiles both APIs to the same plans, so these also guard
against view-registration drift.

Round-trip queries write the parquet table to CSV/JSON under /tmp and
read it back with an explicit schema — proving non-parquet sources
preserve types (timestamps, doubles, booleans) against the parquet
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from spotify_app_etl_spark.io import load_table, register_views
from spotify_app_etl_spark.plans.common import t
from spotify_app_etl_spark.registry import query

_SQL_DSUM = "CAST(SUM(CAST({inner} AS DECIMAL(25,4))) AS DOUBLE)"


@query(
    "q_sql_revenue_filter",
    note="TPC-H Q6-shaped: SQL front-end, decimal-sum determinism",
    oracle=f"""
SELECT {_SQL_DSUM.format(inner="l_extendedprice * l_discount")} AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
    tags=("sql", "filter", "agg"),
)
def sql_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""
    )


@query(
    "q_sql_exists_subquery",
    note="correlated NOT EXISTS (customers with no urgent orders) — "
    "planner rewrites to anti join; predicate chosen to select rows at "
    "every sf (all-customers-have-orders made the bare form vacuous)",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
    tags=("sql", "subquery"),
)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""
    )


@query(
    "q_sql_scalar_subquery",
    note="uncorrelated scalar subquery in a predicate (parts above "
    "average retail price)",
    oracle="""
SELECT p_partkey, p_name, p_retailprice FROM part
WHERE p_retailprice > (SELECT AVG(CAST(p_retailprice AS DECIMAL(12,2))) FROM part)
""",
    tags=("sql", "subquery"),
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "part")
    return spark.sql(
        """
SELECT p_partkey, p_name, p_retailprice FROM part
WHERE p_retailprice > (SELECT AVG(CAST(p_retailprice AS DECIMAL(12,2))) FROM part)
"""
    )


@query(
    "q_sql_in_subquery",
    note="IN subquery across a 3-table dimension chain (suppliers in "
    "ASIA) — planner rewrites to semi join",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
WHERE s_nationkey IN (
  SELECT n_nationkey FROM nation
  WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
)
""",
    tags=("sql", "subquery"),
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "supplier", "nation", "region")
    return spark.sql(
        """
SELECT s_suppkey, s_name FROM supplier
WHERE s_nationkey IN (
  SELECT n_nationkey FROM nation
  WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
)
"""
    )


def _roundtrip_dir(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    # App-scoped scratch (no cross-session races) with exit-time
    # removal (no one-tree-per-process /tmp leak) — see
    # common.app_scratch_base.
    from spotify_app_etl_spark.plans.common import app_scratch_base

    tag = sf_dir.rstrip("/").replace("/", "_")
    return os.path.join(
        app_scratch_base(spark, "spark_graft_io"), f"{tag}.{fmt}"
    )


@query(
    "q_scan_csv_roundtrip",
    note="CSV sink + source with explicit schema (no inferSchema on "
    "the hot path, SURVEY.md §1.3); compared against the parquet oracle",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("source", "csv"),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _roundtrip_dir(spark, sf_dir, "csv")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema("n_nationkey int, n_name string, n_regionkey int").option(
        "header", "true"
    ).csv(path)


@query(
    "q_scan_json_roundtrip",
    note="JSON-lines sink + source with explicit schema incl timestamp "
    "fidelity; compared against the parquet oracle",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders
""",
    tags=("source", "json"),
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _roundtrip_dir(spark, sf_dir, "json")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    orders.write.mode("overwrite").json(path)
    return spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp"
    ).json(path)


@query(
    "q_scan_orc_roundtrip",
    note="ORC sink + source (columnar with type fidelity — doubles and "
    "timestamps survive bit-exact, unlike text formats); compared "
    "against the parquet oracle",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
""",
    tags=("source", "orc"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _roundtrip_dir(spark, sf_dir, "orc")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )
    part.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "q_scan_schema_evolution",
    note="schema-evolution read: two parquet batches written with "
    "different schemas (a later column added), merged with "
    "mergeSchema=true — missing columns null-extend, the drift case "
    "SURVEY §1.3 flags as silently corrupting the reference's "
    "inferred-schema tables; per-batch counts + null accounting",
    oracle="""
SELECT batch,
       COUNT(*) AS n,
       COUNT(o_totalprice) AS n_with_price,
       CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(12,2))) AS DOUBLE)
         AS price_sum
FROM (
  SELECT 'v1' AS batch, o_orderkey, NULL::DOUBLE AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT 'v2', o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 2 = 1
)
GROUP BY batch
""",
    tags=("source", "schema-evolution"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _roundtrip_dir(spark, sf_dir, "evolve")
    orders = load_table(spark, sf_dir, "orders")
    # batch v1: the early schema (no o_totalprice yet)
    (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select(F.lit("v1").alias("batch"), "o_orderkey")
        .write.mode("overwrite")
        .parquet(path + "/b1")
    )
    # batch v2: the evolved schema adds o_totalprice
    (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select(F.lit("v2").alias("batch"), "o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(path + "/b2")
    )
    merged = spark.read.option("mergeSchema", "true").parquet(
        path + "/b1", path + "/b2"
    )
    return merged.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_totalprice").alias("n_with_price"),
        F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)).cast("decimal(12,2)"))
        .cast("double")
        .alias("price_sum"),
    )


@query(
    "q_sql_recursive_cte",
    note="Spark 4 WITH RECURSIVE executed by SPARK (not just the DuckDB "
    "oracle): per-customer order-chain walk — seeds are each customer's "
    "first order, the recursive step follows the next-order-by-date "
    "edge (acyclic successor relation, so UNION ALL recursion "
    "terminates at chain end; Spark does not yet allow UNION dedup in "
    "the recursive step), accumulating step count and exact decimal "
    "running spend",
    oracle="""
WITH RECURSIVE nxt AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         lead(o_orderkey) OVER w AS next_key,
         row_number() OVER w AS rn
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), walk(o_custkey, o_orderkey, step, spend) AS (
  SELECT o_custkey, o_orderkey, 1,
         CAST(o_totalprice AS DECIMAL(18,2))
  FROM nxt WHERE rn = 1
  UNION ALL
  SELECT n.o_custkey, n.o_orderkey, w.step + 1,
         w.spend + CAST(n.o_totalprice AS DECIMAL(18,2))
  FROM walk w
  JOIN nxt p ON p.o_custkey = w.o_custkey AND p.o_orderkey = w.o_orderkey
  JOIN nxt n ON n.o_custkey = w.o_custkey AND n.o_orderkey = p.next_key
)
SELECT o_custkey, o_orderkey, step,
       CAST(spend AS DOUBLE) AS running_spend
FROM walk
""",
    tags=("sql", "recursive-cte", "window"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    # Materialize the successor-edge table ONCE before recursing: a
    # plain CTE is inlined into the recursive step, so every iteration
    # would re-run the window over all of orders (measured 12.9s ->
    # ~4s at sf0.1). The edge list is exactly what a 1000-executor
    # walk would precompute too — recursion then only joins the
    # shrinking frontier against a stationary table. Since r11 the
    # materialization is a CAPTURED-LAYOUT checkpoint, not a persist:
    # built under adaptive_off and hash-partitioned + sorted on the
    # per-level join keys (o_custkey, o_orderkey), the LogicalRDD
    # carries the partitioning into Spark's UnionLoop recursion, so
    # each level exchanges only the shrinking frontier instead of
    # re-shuffling the full edge table (interleaved A/B at the 128x
    # replica: walk 57 s -> 34 s; a persisted table cannot promise its
    # layout to consumers under canChangeCachedPlanOutputPartitioning).
    from spotify_app_etl_spark.operators.checkpoint import adaptive_off
    from spotify_app_etl_spark.operators.persist import scoped_checkpoint

    with adaptive_off(spark):
        nxt = scoped_checkpoint(
            spark.sql(
                """
SELECT o_custkey, o_orderkey, o_totalprice,
       lead(o_orderkey) OVER w AS next_key,
       row_number() OVER w AS rn
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""
            )
            .repartition("o_custkey", "o_orderkey")
            .sortWithinPartitions("o_custkey", "o_orderkey")
        )
    nxt.createOrReplaceTempView("nxt_edges")
    # The frontier CARRIES next_key (r08): the original recursive step
    # joined nxt_edges twice per iteration — once to re-find the
    # current row's next_key, once to fetch the successor. Selecting
    # next_key into the walk relation makes each iteration ONE
    # equi-join (frontier ⋈ edges on the successor key); termination
    # is unchanged (NULL next_key matches nothing). Row-identical
    # output (A/B verified), ~25% faster at sf0.1, and at cluster
    # scale it halves the shuffle-join count × chain-length
    # iterations. A BROADCAST(n) hint measured NO better here (the
    # per-iteration re-broadcast costs what the shuffle costs) and
    # would be wrong at 100 TB where the edge table outgrows the
    # broadcast budget.
    return spark.sql(
        """
WITH RECURSIVE walk(o_custkey, o_orderkey, step, spend, next_key) AS (
  SELECT o_custkey, o_orderkey, 1,
         CAST(o_totalprice AS DECIMAL(18,2)), next_key
  FROM nxt_edges WHERE rn = 1
  UNION ALL
  SELECT n.o_custkey, n.o_orderkey, w.step + 1,
         CAST(w.spend + CAST(n.o_totalprice AS DECIMAL(18,2)) AS DECIMAL(18,2)),
         n.next_key
  FROM walk w
  JOIN nxt_edges n ON n.o_custkey = w.o_custkey AND n.o_orderkey = w.next_key
)
SELECT o_custkey, o_orderkey, step,
       CAST(spend AS DOUBLE) AS running_spend
FROM walk
"""
    )


@query(
    "q_json_variant",
    note="Spark 4 VARIANT semi-structured type: parse_json(props) once "
    "into a variant column, typed variant_get extraction, integer "
    "aggregation — the open-schema path that keeps shredding "
    "engine-side instead of exploding strings per field",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
FROM events
GROUP BY event_type
""",
    tags=("sql", "variant", "json"),
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.parse_json("props")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )
