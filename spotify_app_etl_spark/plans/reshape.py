"""Binning + time-range window frames.

Two operator families the round-2 surface did not yet cover:

- **Histogram** (`q_agg_histogram`): fixed-bin ``width_bucket``
  binning + count — the scan-speed building block for data profiling
  at scale (one map-combinable shuffle on ≤ n_bins+2 keys). Bin edges
  are literals, so both engines compute identical bucket ids from
  identical doubles.
- **Time-range window frame** (`q_window_range_frame`): per-user
  trailing-1-hour event counts/sums via RANGE frames — the
  "how many events in the last hour before this one" shape that ROWS
  frames cannot express. Ordering key = epoch MICROS as BIGINT on both
  engines (micros, not seconds: truncation would change frame
  membership and diverge from the oracle's interval arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from spotify_app_etl_spark.plans.common import t
from spotify_app_etl_spark.registry import query

_HOUR_US = 3_600_000_000  # 1 hour in microseconds


@query(
    "q_agg_histogram",
    note="fixed-bin order-value histogram: width_bucket over literal "
    "edges [0, 600000) × 20 bins — identical bucket ids from identical "
    "doubles on both engines; one map-combinable shuffle on ≤22 keys",
    oracle="""
SELECT CASE WHEN o_totalprice < 0.0 THEN 0
            WHEN o_totalprice >= 600000.0 THEN 21
            ELSE CAST(floor(o_totalprice / 30000.0) AS BIGINT) + 1 END AS bucket,
       COUNT(*) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM orders
GROUP BY 1
""",
    tags=("reshape", "histogram", "aggregate"),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(20)).alias(
            "bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "q_window_range_frame",
    note="trailing-1h RANGE frame per user ordered by epoch-micros "
    "(not seconds: truncation changes frame membership): event count "
    "+ quantized value sum over [t-1h, t] — the time-range analytic "
    "ROWS frames cannot express; one window shuffle on user_id",
    oracle="""
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) OVER w AS DOUBLE)
         / 1000000 AS value_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    tags=("reshape", "window", "range-frame"),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_HOUR_US, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        (
            F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).over(w)
            .cast("double")
            / 1_000_000
        ).alias("value_last_hour"),
    )


@query(
    "q_agg_mode_argmax",
    note="per-group mode via max(struct(count, value)) — argmax as a "
    "plain aggregate (no second window shuffle), deterministic ties "
    "(higher value wins)",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT l_returnflag, l_quantity, cnt,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_quantity DESC) AS rn
  FROM c
)
SELECT l_returnflag,
       l_quantity AS mode_qty,
       cnt AS mode_count
FROM ranked WHERE rn = 1
""",
    tags=("reshape", "aggregate", "mode"),
)
def q_agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # argmax as ONE more aggregate (no second window shuffle): struct
    # ordering is (cnt, value) lexicographic → deterministic tie-break
    best = counts.groupBy("l_returnflag").agg(
        F.max(F.struct("cnt", "l_quantity")).alias("best")
    )
    return best.select(
        "l_returnflag",
        F.col("best.l_quantity").alias("mode_qty"),
        F.col("best.cnt").alias("mode_count"),
    )


@query(
    "q_agg_grouping_id",
    note="cube with grouping_id(): each output row labeled with its "
    "aggregation level (detail / per-flag / per-status / grand total), "
    "filtered to the subtotal levels — the level marker that makes "
    "cube output machine-consumable; null group keys rendered as "
    "'ALL' so they cannot collide with real values",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS level_id,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
HAVING GROUPING(l_returnflag) + GROUPING(l_linestatus) > 0
""",
    tags=("reshape", "aggregate", "grouping"),
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("level_id"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty"),
        )
        .filter(F.col("level_id") > 0)
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "level_id",
            "n",
            "qty",
        )
    )


@query(
    "q_agg_percentile_disc",
    note="discrete percentiles (actual data elements, no interpolation) "
    "per return flag — the companion to the continuous interpolated "
    "q_agg_percentiles; element selection is deterministic so values "
    "are bit-exact across engines. Implemented as sort+nearest-rank "
    "(group-partitioned window + ceil(q*n) row picks), NOT the "
    "percentile_disc aggregate: the builtin buffers every group's "
    "values in an in-memory ArrayBuffer per quantile (3x here), an OOM "
    "at 100 TB group sizes, while the window sort spills via "
    "UnsafeExternalSorter — and it measured 2.5x faster at sf0.1 "
    "(2.6s -> 1.0s, the builtin buffers one value list PER quantile) "
    "with bit-identical output",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.25) AS p25,
       quantile_disc(l_extendedprice, 0.50) AS p50,
       quantile_disc(l_extendedprice, 0.95) AS p95,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("reshape", "aggregate", "percentile"),
)
def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spotify_app_etl_spark.operators.percentiles import percentile_disc_by

    return percentile_disc_by(
        t(spark, sf_dir, "lineitem"),
        "l_returnflag",
        "l_extendedprice",
        {"p25": 0.25, "p50": 0.50, "p95": 0.95},
        count_col="n",
    )
