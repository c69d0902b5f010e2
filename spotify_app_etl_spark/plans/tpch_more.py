"""TPC-H completion suite: the remaining query shapes, adapted to the
driver testdata schema (no partsupp table, no l_commitdate/receiptdate
— lateness is derived as ``l_shipdate > o_orderdate + 90 days``).

Reference parity: none (the reference is an ETL script,
/root/reference/spotify-etl.py; it has no query surface). These queries
exist to exercise the relational shapes SURVEY.md §2 Part B lists that
the round-1 suite covered only via minimal examples: correlated
EXISTS/NOT EXISTS, IN/NOT IN subqueries, HAVING-gated semi joins,
scalar-subquery thresholds, disjunctive multi-table predicates,
left-join histograms, and group-wise argmax.

Scale notes (100 TB):
- Every query keeps fact⋈fact joins shuffling on their natural key
  (orderkey / partkey / suppkey) and leaves broadcast selection to AQE
  — no forced hints on relations that grow with sf (VERDICT.md round-1
  findings 1-3 applied from the start).
- Correlated subqueries are re-expressed as semi/anti joins or
  groupBy-then-join — the shapes Catalyst itself would produce for
  decorrelation, but stated explicitly so the physical plan is
  predictable: one shuffle per distinct aggregation grain.
- All money arithmetic runs in DECIMAL(12,2)/(25,4) and is cast to
  double only at the output boundary (plans/common.py rationale), so
  the driver's value-hash comparison is bit-exact vs DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spotify_app_etl_spark.plans.common import davg, dec, dsum, sql_dsum, t
from spotify_app_etl_spark.registry import query

#: Derived lateness predicate (testdata has no commit/receipt dates):
#: a line is "late" when it ships more than 90 days after the order.
_LATE_DAYS = 90

_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"


def _rev() -> F.Column:
    return dec("l_extendedprice") * (1 - dec("l_discount"))


# ---------------------------------------------------------------------------
# Q4 — order priority checking: correlated EXISTS over lineitem.
# ---------------------------------------------------------------------------


@query(
    "q04_order_priority",
    note="correlated EXISTS → left-semi join with a non-equi residual "
    "(shipdate vs orderdate+90d); one shuffle on orderkey",
    oracle=f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "subquery", "tpch"),
)
def order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # Semi join: equi component (orderkey) drives the hash join; the
    # date comparison is a residual filter on matches. The 3-month
    # orderdate filter is pushed to the orders parquet scan.
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by direction and year.
# ---------------------------------------------------------------------------

_N_A, _N_B = "NATION_3", "NATION_7"


@query(
    "q07_volume_shipping",
    note="six-table join; the two nation dims filter supplier/customer "
    "to 2/25 of rows before the fact-fact shuffle on orderkey",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       {sql_dsum(_REV, 'revenue')}
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{_N_A}' AND n2.n_name = '{_N_B}')
   OR (n1.n_name = '{_N_B}' AND n2.n_name = '{_N_A}')
GROUP BY supp_nation, cust_nation, l_year
""",
    tags=("join", "agg", "tpch"),
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(_N_A, _N_B))
        .select("n_nationkey", "n_name")
    )
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # supplier/customer are fact-scale (1 M / 15 M at sf100) so their
    # nation-filtered 8% slices are NOT force-broadcast; AQE measures
    # the post-filter size at runtime. lineitem⋈orders shuffles on
    # orderkey — the only unavoidable fact-fact exchange.
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == _N_A) & (F.col("cust_nation") == _N_B))
            | ((F.col("supp_nation") == _N_B) & (F.col("cust_nation") == _N_A))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_rev(), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation in one customer region.
# ---------------------------------------------------------------------------


@query(
    "q08_market_share",
    note="conditional aggregation: share = decimal-exact Σ(case)/Σ, "
    "single double division at the boundary",
    oracle=f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n1.n_name = '{_N_A}' THEN {_REV} ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
         / CAST(SUM({_REV}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY o_year
""",
    tags=("join", "agg", "conditional", "tpch"),
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    asia_nations = (
        t(spark, sf_dir, "nation")
        .join(
            F.broadcast(t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    supp_nation = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    promo_parts = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    vol = _rev()
    target = F.when(F.col("supp_nation") == _N_A, vol).otherwise(
        F.lit(0).cast("decimal(25,4)")
    )
    return (
        li.join(promo_parts, li.l_partkey == F.col("p_partkey"))
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(target).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product profit by supplier nation and year (retailprice stands in
# for the missing ps_supplycost).
# ---------------------------------------------------------------------------


@query(
    "q09_product_profit",
    note="profit proxy: revenue minus retailprice*qty (no partsupp "
    "table); decimal-exact difference summed per (nation, year)",
    oracle=f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       {sql_dsum(f"{_REV} - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))", 'sum_profit')}
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
""",
    tags=("join", "agg", "tpch"),
)
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = _rev() - dec("p_retailprice") * dec("l_quantity")
    # part filtered by LIKE is pruned at scan (substring pushdown is a
    # row-group filter; the projection carries only 2 columns). The
    # lineitem⋈orders shuffle on orderkey dominates; nation broadcast.
    return (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(amount, "sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q12 — shipping latency buckets × order priority (CASE aggregation).
# ---------------------------------------------------------------------------


@query(
    "q12_ship_latency",
    note="derived latency bucket (no l_shipmode column) with "
    "priority-conditional COUNT — COUNT(CASE) on both engines so the "
    "output type is BIGINT on both",
    oracle="""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'normal'
            ELSE 'slow' END AS latency_bucket,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY latency_bucket
""",
    tags=("join", "agg", "conditional", "tpch"),
)
def ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    lag = F.datediff("l_shipdate", "o_orderdate")
    bucket = (
        F.when(lag <= 30, "fast").when(lag <= 90, "normal").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("latency_bucket"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left join + double grouping).
# ---------------------------------------------------------------------------


@query(
    "q13_customer_distribution",
    note="left join with an extra non-key condition, COUNT of the "
    "nullable side, then a histogram over the counts",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
""",
    tags=("join", "left", "agg", "tpch"),
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    # The <> predicate folds into the orders scan (it is on the
    # preserved-null side's input, so filtering before the left join is
    # equivalent to the ON-clause form and prunes earlier).
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: group-wise argmax against a scalar MAX subquery.
# ---------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    note="revenue CTE reused by both the scalar MAX and the final "
    "filter; equality compared in exact DECIMAL, not double",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
""",
    tags=("join", "agg", "subquery", "tpch"),
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_rev"))
    )
    # Scalar subquery → 1-row broadcast join (Catalyst plans exactly
    # this for the SQL form); the revenue agg is computed once and the
    # exchange reused for both consumers.
    mx = rev.agg(F.max("total_rev").alias("mx"))
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == F.col("mx"))
        .join(sup, F.col("supplier_no") == sup.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q16 — distinct supplier count per part attribute, NOT IN exclusion.
# ---------------------------------------------------------------------------


@query(
    "q16_supplier_part_count",
    note="NOT IN → broadcast anti join (s_suppkey is non-null so the "
    "semantics coincide); COUNT(DISTINCT) per (brand, size)",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
    tags=("join", "anti", "agg", "subquery", "tpch"),
)
def supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad_suppliers = (
        t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    # No forced broadcast of bad_suppliers: ~9% of supplier grows with
    # sf (1e8 rows at the 100 TB point) and a hint bypasses AQE's size
    # guard. AQE broadcasts the anti build side when the MEASURED size
    # fits (same reasoning as q03/q05 in plans/relational.py).
    return (
        li.join(
            bad_suppliers,
            li.l_suppkey == bad_suppliers.s_suppkey,
            "left_anti",
        )
        .join(parts, F.col("l_partkey") == parts.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue: correlated scalar AVG per part.
# ---------------------------------------------------------------------------


@query(
    "q17_small_qty_revenue",
    note="correlated scalar subquery decorrelated to a per-partkey "
    "aggregate joined back; threshold avg is decimal-sum/count so both "
    "engines compute the identical double",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT CAST(0.2 AS DOUBLE)
           * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
""",
    tags=("join", "agg", "subquery", "tpch"),
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    brand_parts = (
        t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    )
    # Decorrelated: per-part avg over ALL lineitem (matching the SQL
    # correlation grain), semi-joined to the brand's parts first so the
    # threshold agg only shuffles the brand slice at scale.
    # brand_parts is part/25 — sf-growing, so no forced broadcast; AQE
    # picks broadcast only while the measured slice fits the budget.
    per_part = (
        li.join(brand_parts, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            (F.lit(0.2) * (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity"))).alias("qty_threshold")
        )
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        li.join(per_part, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING-gated IN subquery.
# ---------------------------------------------------------------------------


@query(
    "q18_large_volume_customers",
    note="IN (GROUP BY … HAVING Σqty > 300) → semi join against the "
    "filtered aggregate; LIMIT carries a total tie-break (orderkey)",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {sql_dsum('CAST(l_quantity AS DECIMAL(12,2))', 'total_qty')}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("join", "semi", "agg", "topk", "tpch"),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey")
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(
            big_orders, orders.o_orderkey == big_orders.l_orderkey, "left_semi"
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li.select("l_orderkey", "l_quantity"), orders.o_orderkey == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(dec("l_quantity"), "total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-table predicates (discounted revenue).
# ---------------------------------------------------------------------------


@query(
    "q19_disjunctive_revenue",
    note="three OR'd brand/size/quantity branches; the common "
    "partkey equi-join stays a hash join with the disjunction as a "
    "residual — no cartesian fallback",
    oracle=f"""
SELECT {sql_dsum(_REV, 'revenue')}
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
    tags=("join", "filter", "tpch"),
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & qty.between(20, 30))
    )
    # part is pre-filtered to the union of brand/size branches (a
    # deterministic weakening of the disjunction) so the scan prunes
    # before the join; the full condition applies post-join.
    part_pruned = part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & F.col("p_size").between(1, 15)
    )
    return (
        li.join(part_pruned, li.l_partkey == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(_rev(), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q21 — sole late supplier on multi-supplier orders.
# ---------------------------------------------------------------------------


@query(
    "q21_late_sole_supplier",
    note="EXISTS + NOT EXISTS decorrelated to one per-order aggregate "
    "(distinct suppliers, distinct LATE suppliers) joined back — two "
    "shuffles total vs the naive triple self-join",
    oracle=f"""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("join", "semi", "anti", "agg", "topk", "tpch"),
)
def late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .withColumn(
            "is_late",
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS"),
        )
    )
    # Per-order supplier profile: EXISTS(other supplier) ⇔ n_supp > 1;
    # NOT EXISTS(other late supplier) for a late line ⇔ n_late_supp = 1.
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    ).withColumnRenamed("l_orderkey", "po_orderkey")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.filter("is_late")
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        # supplier grows with sf — no forced broadcast of the full
        # projection; AQE broadcasts it only while the measured size
        # fits, and falls back to a shuffle join at the 100 TB point.
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (scalar AVG + NOT EXISTS).
# ---------------------------------------------------------------------------


@query(
    "q22_dormant_customers",
    note="scalar-subquery threshold (decimal-exact avg) + anti join "
    "for NOT EXISTS(recent order); cntrycode via SUBSTRING",
    oracle=f"""
SELECT cntrycode, COUNT(*) AS numcust,
       {sql_dsum('CAST(c_acctbal AS DECIMAL(12,2))', 'totacctbal')}
FROM (
  SELECT SUBSTRING(c_name, 16, 3) AS cntrycode, c_acctbal
  FROM customer c
  WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c2.c_acctbal)
      FROM customer c2 WHERE c2.c_acctbal > 0
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
) t
GROUP BY cntrycode
""",
    tags=("agg", "anti", "subquery", "string", "tpch"),
)
def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    threshold = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(davg(dec("c_acctbal"), "avg_bal"))
    )
    recent_orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent_orders, cust.c_custkey == recent_orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 16, 3).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal"), "totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (group-wise argmin with join-back).
# Testdata has no partsupp, so "supply cost" is derived from observed
# shipments: unit_cost(part, supp) = sum(extendedprice) / sum(quantity)
# over lineitem. The shape is intact: filtered part dim ⋈ supply rel ⋈
# region-scoped suppliers, then keep only rows matching the per-part
# minimum cost.
# ---------------------------------------------------------------------------

_Q2_REGION, _Q2_TYPE, _Q2_MAX_SIZE = "EUROPE", "STANDARD", 25

_UNIT_COST = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
    " / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)"
)


@query(
    "q02_min_cost_supplier",
    note="argmin join-back as a per-part MIN window over the region-"
    "scoped supply relation; double equality is safe because both "
    "engines derive unit_cost from the same exact decimal sums",
    oracle=f"""
WITH supply AS (
  SELECT l_partkey, l_suppkey, {_UNIT_COST} AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{_Q2_REGION}'
), ranked AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey, unit_cost,
         MIN(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM part
  JOIN supply ON p_partkey = l_partkey
  JOIN eu ON l_suppkey = s_suppkey
  WHERE p_type = '{_Q2_TYPE}' AND p_size <= {_Q2_MAX_SIZE}
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, s_suppkey, unit_cost
FROM ranked WHERE unit_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
LIMIT 100
""",
    tags=("join", "window", "argmin", "tpch"),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    supply = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.sum(dec("l_extendedprice")).cast("double")
                / F.sum(dec("l_quantity")).cast("double")
            ).alias("unit_cost")
        )
    )
    # nation/region are fixed-size dims (25/5 rows at every sf):
    # broadcast them; supplier itself grows with sf, so AQE decides.
    nations = (
        t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    eu = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t(spark, sf_dir, "part").filter(
        (F.col("p_type") == _Q2_TYPE) & (F.col("p_size") <= _Q2_MAX_SIZE)
    )
    ranked = (
        parts.join(supply, parts.p_partkey == supply.l_partkey)
        .join(eu, supply.l_suppkey == eu.s_suppkey)
        .withColumn(
            "min_cost", F.min("unit_cost").over(Window.partitionBy("p_partkey"))
        )
    )
    return (
        ranked.filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "s_suppkey", "unit_cost",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: per-part value within a region vs a global
# scalar threshold. "Stock value" is derived as the summed extended
# price shipped by the region's suppliers (no partsupp in testdata).
# ---------------------------------------------------------------------------

_Q11_REGION, _Q11_FRACTION = "AFRICA", 0.0005


@query(
    "q11_important_stock",
    note="two aggregation grains from ONE scan shape: per-part decimal "
    "sums, then the global threshold = sum over that (small) agg "
    "broadcast back — no second lineitem pass, exact decimal math "
    "until the final double compare",
    oracle=f"""
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{_Q11_REGION}'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(val_dec AS DOUBLE) >
      {_Q11_FRACTION} * (SELECT CAST(SUM(val_dec) AS DOUBLE) FROM per_part)
""",
    tags=("agg", "subquery", "scalar", "tpch"),
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = (
        t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name") == _Q11_REGION)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    per_part = (
        t(spark, sf_dir, "lineitem")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("val_dec"))
    )
    # Scalar threshold: aggregate the per-part agg (tiny relative to the
    # fact scan) and broadcast the single row. Catalyst will recompute
    # per_part's lineage for the scalar branch; at 100 TB persist
    # per_part or reuse a shuffle — row counts there are #parts, not
    # #lineitems, so even recomputation is bounded by one extra scan.
    total = per_part.agg(
        (F.lit(_Q11_FRACTION) * F.sum("val_dec").cast("double")).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val_dec").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("val_dec").cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q20 — dominant recent suppliers (nested grains + threshold semi join).
# partsupp-free restatement: a supplier qualifies when, for some
# filtered part, its recent shipments alone exceed 10% of that part's
# lifetime shipped quantity.
# ---------------------------------------------------------------------------

_Q20_NAME_PREFIX, _Q20_CUTOFF, _Q20_SHARE = "small %", "1999-01-01", 0.1


@query(
    "q20_dominant_recent_suppliers",
    note="two aggregation grains (supp×part, part) joined on partkey; "
    "qualifying suppkeys drive a left-semi join into the region-"
    "scoped supplier dim",
    oracle=f"""
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '{_Q20_CUTOFF} 00:00:00'
                  THEN CAST(l_quantity AS DECIMAL(12,2))
                  ELSE CAST(0 AS DECIMAL(12,2)) END) AS recent_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{_Q20_NAME_PREFIX}'
  GROUP BY l_suppkey, l_partkey
), tot AS (
  SELECT l_partkey AS t_partkey, SUM(qty_dec) AS tot_dec
  FROM shipped GROUP BY l_partkey
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{_Q2_REGION}'
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped JOIN tot ON l_partkey = t_partkey
    WHERE CAST(recent_dec AS DOUBLE) > {_Q20_SHARE} * CAST(tot_dec AS DOUBLE)
  )
ORDER BY s_name
""",
    tags=("join", "semi", "agg", "tpch"),
)
def dominant_recent_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like(_Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    recent = F.when(
        F.col("l_shipdate") >= F.lit(_Q20_CUTOFF).cast("timestamp"),
        dec("l_quantity"),
    ).otherwise(dec(F.lit(0)))
    shipped = (
        t(spark, sf_dir, "lineitem")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(dec("l_quantity")).alias("qty_dec"),
            F.sum(recent).alias("recent_dec"),
        )
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty_dec").alias("tot_dec")
    )
    qualifying = (
        shipped.join(tot, F.col("l_partkey") == F.col("t_partkey"))
        .filter(
            F.col("recent_dec").cast("double")
            > F.lit(_Q20_SHARE) * F.col("tot_dec").cast("double")
        )
        .select("l_suppkey")
    )
    nations = (
        t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                t(spark, sf_dir, "region").filter(F.col("r_name") == _Q2_REGION)
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )
