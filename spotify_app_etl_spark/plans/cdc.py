"""CDC / incremental-load queries: SCD1 MERGE, SCD2 history, rollup merge.

Re-expresses the reference's full-replace load stage
(/root/reference/spotify-etl.py:209-215, ``to_sql(if_exists='replace')``)
as incremental change application — what a 100 TB pipeline actually
runs. The change feed is derived *deterministically* from the orders
table (key-modulus buckets), so DuckDB can mirror it exactly and the
driver hash-checks the full MERGE semantics:

- keys ``%13 == 0``  → delete
- keys ``%10 == 0``  → insert (excluded from the base snapshot)
- keys ``%7  == 0``  → update (price bumped by an exact DECIMAL +100.00)

Scale notes: one full-outer shuffle join for MERGE (change feed ≪
snapshot → AQE broadcasts it); one window shuffle for SCD2; rollup
merge touches only partial aggregates, never re-scans the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spotify_app_etl_spark.operators import cdc
from spotify_app_etl_spark.plans.common import MONEY, dec, t
from spotify_app_etl_spark.registry import query

_SNAP_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]

#: DuckDB mirrors of the snapshot / change-feed derivations below.
_SQL_SNAP = """
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
  FROM orders WHERE o_orderkey % 10 <> 0
"""
_SQL_CHG = """
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(12,2))
              + CAST(100.00 AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
         o_orderdate,
         CASE WHEN o_orderkey % 13 = 0 THEN 'D'
              WHEN o_orderkey % 10 = 0 THEN 'I'
              ELSE 'U' END AS op
  FROM orders
  WHERE o_orderkey % 13 = 0 OR o_orderkey % 10 = 0 OR o_orderkey % 7 = 0
"""


def _snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 != 0)
        .select(*_SNAP_COLS)
    )


def _changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .filter((k % 13 == 0) | (k % 10 == 0) | (k % 7 == 0))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            (dec("o_totalprice") + F.lit("100.00").cast(MONEY))
            .cast("double")
            .alias("o_totalprice"),
            "o_orderdate",
            F.when(k % 13 == 0, F.lit("D"))
            .when(k % 10 == 0, F.lit("I"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
    )


@query(
    "q_cdc_scd1_merge",
    note="MERGE upsert (SCD1): deterministic change feed applied to the "
    "orders snapshot — delete/insert/update per key-modulus bucket; "
    "one full-outer shuffle, AQE broadcasts the small feed",
    oracle=f"""
WITH snap AS ({_SQL_SNAP}), chg AS ({_SQL_CHG})
SELECT COALESCE(c.o_orderkey, s.o_orderkey) AS o_orderkey,
       CASE WHEN c.op IS NOT NULL THEN c.o_custkey ELSE s.o_custkey END AS o_custkey,
       CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus ELSE s.o_orderstatus END AS o_orderstatus,
       CASE WHEN c.op IS NOT NULL THEN c.o_totalprice ELSE s.o_totalprice END AS o_totalprice,
       CASE WHEN c.op IS NOT NULL THEN c.o_orderdate ELSE s.o_orderdate END AS o_orderdate
FROM snap s FULL JOIN chg c ON s.o_orderkey = c.o_orderkey
WHERE c.op IS NULL OR c.op <> 'D'
""",
    tags=("cdc", "merge", "join"),
)
def q_cdc_scd1_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc.apply_changes(
        _snapshot(spark, sf_dir), _changes(spark, sf_dir), keys=["o_orderkey"]
    )


@query(
    "q_cdc_scd2_history",
    note="SCD2 effective-dated history of each customer's order "
    "priority: consecutive-duplicate compaction + effective_from/to "
    "+ version + is_current; single window shuffle on the entity key",
    oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate,
         row_number() OVER w AS rn,
         lag(o_orderpriority) OVER w AS prev
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), versions AS (
  SELECT o_custkey, o_orderpriority, o_orderdate AS effective_from, rn
  FROM ordered
  WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev
)
SELECT o_custkey, o_orderpriority, effective_from,
       lead(effective_from) OVER w2 AS effective_to,
       CAST(row_number() OVER w2 AS INTEGER) AS version,
       lead(effective_from) OVER w2 IS NULL AS is_current
FROM versions
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY effective_from, rn)
""",
    tags=("cdc", "scd2", "window"),
)
def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc.scd2_history(
        t(spark, sf_dir, "orders"),
        keys=["o_custkey"],
        attr_cols=["o_orderpriority"],
        ts_col="o_orderdate",
        tiebreak_cols=["o_orderkey"],
    )


@query(
    "q_cdc_incremental_rollup",
    note="incremental rollup: per-day algebraic partials (decimal sums, "
    "counts, min/max) merged exactly into the monthly cube — the "
    "merge never re-scans the fact table, so a changed day folds in "
    "at partial-size cost",
    oracle="""
SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
FROM lineitem
GROUP BY 1
""",
    tags=("cdc", "rollup", "aggregate"),
)
def q_cdc_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(
        F.sum(dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
        F.min(dec("l_extendedprice")).alias("min_price"),
        F.max(dec("l_extendedprice")).alias("max_price"),
        F.sum(dec("l_extendedprice")).alias("sum_price"),
    )
    merged = cdc.merge_partial_aggregates(
        daily,
        group_cols=["month"],
        sum_cols=["sum_qty", "sum_price"],
        count_cols=["n_items"],
        min_cols=["min_price"],
        max_cols=["max_price"],
    )
    return merged.select(
        "month",
        F.col("sum_qty").cast("double").alias("total_qty"),
        "n_items",
        (F.col("sum_price").cast("double") / F.col("n_items")).alias("avg_price"),
        F.col("min_price").cast("double").alias("min_price"),
        F.col("max_price").cast("double").alias("max_price"),
    )


@query(
    "q_cdc_point_in_time",
    note="temporal (point-in-time) join: each fact looks up the SCD2 "
    "dimension version in effect at fact time — equi-join on the "
    "entity key plus half-open [effective_from, effective_to) "
    "predicates, so the shuffle stays keyed on o_custkey and the "
    "interval check is a post-join filter; the data-warehouse "
    "correctness pattern full-replace loads cannot express",
    oracle="""
WITH ordered AS (
  SELECT o_custkey, o_orderpriority, o_orderdate,
         row_number() OVER w AS rn,
         lag(o_orderpriority) OVER w AS prev
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), versions AS (
  SELECT o_custkey, o_orderpriority, o_orderdate AS effective_from, rn
  FROM ordered
  WHERE rn = 1 OR o_orderpriority IS DISTINCT FROM prev
), hist AS (
  SELECT o_custkey, o_orderpriority, effective_from,
         lead(effective_from) OVER w2 AS effective_to,
         CAST(row_number() OVER w2 AS INTEGER) AS version
  FROM versions
  WINDOW w2 AS (PARTITION BY o_custkey ORDER BY effective_from, rn)
)
SELECT f.o_orderkey, f.o_custkey, f.o_orderdate,
       h.o_orderpriority AS priority_at_time, h.version
FROM (SELECT o_orderkey, o_custkey, o_orderdate FROM orders
      WHERE o_orderkey % 5 = 0) f
JOIN hist h
  ON h.o_custkey = f.o_custkey
 AND h.effective_from <= f.o_orderdate
 AND (h.effective_to IS NULL OR f.o_orderdate < h.effective_to)
""",
    tags=("cdc", "scd2", "temporal-join"),
)
def q_cdc_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    hist = cdc.scd2_history(
        orders,
        keys=["o_custkey"],
        attr_cols=["o_orderpriority"],
        ts_col="o_orderdate",
        tiebreak_cols=["o_orderkey"],
    ).select(
        F.col("o_custkey").alias("h_custkey"),
        F.col("o_orderpriority").alias("priority_at_time"),
        "effective_from",
        "effective_to",
        "version",
    )
    facts = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return (
        facts.join(
            hist,
            (F.col("h_custkey") == F.col("o_custkey"))
            & (F.col("effective_from") <= F.col("o_orderdate"))
            & (
                F.col("effective_to").isNull()
                | (F.col("o_orderdate") < F.col("effective_to"))
            ),
        )
        .select(
            "o_orderkey", "o_custkey", "o_orderdate", "priority_at_time", "version"
        )
    )
