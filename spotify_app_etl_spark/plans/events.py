"""Event-time queries: tumbling / sliding / session windows + pivot.

Batch-mode analogs of the Structured Streaming jobs in
``spotify_app_etl_spark.streaming`` — same ``F.window`` /
``F.session_window`` expressions, so the oracle checks here validate
the streaming semantics too (a Spark streaming windowed agg and the
batch windowed agg share the same logical operator).

The reference's closest analog is the ``recent_tracks`` event log with
``played_at`` event time (spotify-etl.py:179-185), which it snapshots
instead of windowing (SURVEY.md §1.1) — these queries are the
first-class treatment of that shape.

Semantics pinned for oracle parity:
- Spark tumbling windows are epoch-aligned → DuckDB ``time_bucket``.
- A sliding window (size 1h, slide 30m) = union of two epoch-aligned
  tumbling grids offset by 0 and 30 minutes.
- Spark session windows merge events whose gap is STRICTLY less than
  the timeout; session end = last event ts + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spotify_app_etl_spark.plans.common import dec, dsum, t
from spotify_app_etl_spark.registry import query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_events_tumbling",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
""",
    tags=("events", "window-agg"),
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(dec("value"), "value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_sum")
    )


@query(
    "q_events_sliding",
    note="1h windows sliding every 30m = two offset tumbling grids",
    oracle="""
SELECT window_start, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 1 HOUR, ts, INTERVAL 30 MINUTE) AS window_start, value
  FROM events
)
GROUP BY window_start
""",
    tags=("events", "window-agg"),
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(dec("value"), "value_sum"))
        .select(F.col("w.start").alias("window_start"), "n", "value_sum")
    )


@query(
    "q_events_session",
    note="session windows, 10-minute gap, per user — gaps-and-islands "
    "oracle; Spark merges on gap < timeout, session end = last ts + gap",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
""",
    tags=("events", "session-window"),
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q_events_pivot",
    note="pivot event counts per user into one column per event type",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click')    AS click,
       COUNT(*) FILTER (event_type = 'error')    AS error,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup')   AS signup,
       COUNT(*) FILTER (event_type = 'view')     AS view
FROM events
GROUP BY user_id
""",
    tags=("events", "pivot"),
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)  # explicit values: no extra scan
        .count()
    )
    # pivot leaves NULL where a (user, type) pair never occurred
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in EVENT_TYPES],
    )


@query(
    "q_events_gap_stats",
    note="sessionization precursor: per-user inter-event gap statistics "
    "via lag (streaming state analog)",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_gaps,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s
FROM (
  SELECT user_id,
         date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
  FROM events
)
WHERE gap_s IS NOT NULL
GROUP BY user_id
""",
    tags=("events", "window"),
)
def events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap_s").alias("max_gap_s"),
        F.min("gap_s").alias("min_gap_s"),
    )


@query(
    "q_dedup_bounded_window",
    note="batch analog of streaming.dedup_within_watermark "
    "(dropDuplicatesWithinWatermark): keep the FIRST event per "
    "(user_id, event_type) within each 10-minute epoch-aligned bucket "
    "— the oracle-checkable shape of bounded-state streaming dedup "
    "(deterministic ts, event_id tie-break)",
    oracle="""
SELECT window_id, user_id, event_type, event_id, ts, value FROM (
  SELECT CAST(floor(epoch(ts) / 600) AS BIGINT) AS window_id,
         user_id, event_type, event_id, ts, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type, CAST(floor(epoch(ts) / 600) AS BIGINT)
           ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    tags=("events", "dedup", "streaming-analog"),
)
def dedup_bounded_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").withColumn(
        "window_id", F.floor(F.unix_timestamp("ts") / 600)
    )
    w = W.partitionBy("user_id", "event_type", "window_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("window_id", "user_id", "event_type", "event_id", "ts", "value")
    )


@query(
    "q_events_gapfill",
    note="time-series gap filling: per-user dense hourly grid "
    "(sequence+explode) left-joined to hourly aggregates, zeros for "
    "empty hours and last-observation-carried-forward for the value — "
    "the resample/interpolate primitive; grid generation is a "
    "generator projection, the only shuffles are the hour aggregate "
    "and the per-user window",
    oracle="""
WITH h AS (
  SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id,
         COUNT(*) AS n, SUM(CAST(floor(value * 1000000) AS BIGINT)) AS vq
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, MIN(hour_id) AS h0, MAX(hour_id) AS h1 FROM h GROUP BY 1
), grid AS (
  SELECT user_id, unnest(range(h0, h1 + 1)) AS hour_id FROM span
), joined AS (
  SELECT g.user_id, g.hour_id,
         COALESCE(h.n, 0) AS n_events,
         CAST(COALESCE(h.vq, 0) AS DOUBLE) / 1000000 AS value_sum,
         CASE WHEN h.n IS NOT NULL
              THEN CAST(h.vq AS DOUBLE) / 1000000 END AS obs
  FROM grid g LEFT JOIN h USING (user_id, hour_id)
)
SELECT user_id, hour_id,
       TIMESTAMP '1970-01-01 00:00:00' + hour_id * INTERVAL 1 HOUR AS hour_start,
       n_events, value_sum,
       LAST_VALUE(obs IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hour_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
FROM joined
""",
    tags=("events", "gapfill", "timeseries"),
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").withColumn(
        "hour_id", F.floor(F.unix_timestamp("ts") / 3600)
    )
    hourly = ev.groupBy("user_id", "hour_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).alias("vq"),
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour_id").alias("h0"), F.max("hour_id").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_id"),
        )
    )
    joined = grid.join(hourly, ["user_id", "hour_id"], "left").select(
        "user_id",
        "hour_id",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        (F.coalesce("vq", F.lit(0)).cast("double") / 1_000_000).alias("value_sum"),
        F.when(
            F.col("n").isNotNull(), F.col("vq").cast("double") / 1_000_000
        ).alias("obs"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hour_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_id",
        F.timestamp_seconds(F.col("hour_id") * 3600)
        .cast("timestamp_ntz")
        .alias("hour_start"),
        "n_events",
        "value_sum",
        F.last("obs", ignorenulls=True).over(w).alias("value_locf"),
    )


@query(
    "q_events_funnel",
    note="3-step funnel (view → click → purchase within 2h of the "
    "view) per user: each step is an interval join on (user, time "
    "band) + a MIN aggregate picking the first qualifying event — "
    "the joins shuffle on user_id only and AQE handles hot users; "
    "counts per completed funnel depth",
    oracle="""
WITH v AS (
  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
), first_click AS (
  SELECT v.user_id, v.v_ts, MIN(e.ts) AS c_ts
  FROM v JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'click'
   AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 2 HOUR
  GROUP BY v.user_id, v.v_ts
), first_purchase AS (
  SELECT fc.user_id, fc.v_ts, fc.c_ts, MIN(e.ts) AS p_ts
  FROM first_click fc JOIN events e
    ON e.user_id = fc.user_id AND e.event_type = 'purchase'
   AND e.ts > fc.c_ts AND e.ts <= fc.v_ts + INTERVAL 2 HOUR
  GROUP BY fc.user_id, fc.v_ts, fc.c_ts
)
SELECT
  (SELECT COUNT(*) FROM v) AS n_views,
  (SELECT COUNT(*) FROM first_click) AS n_clicked,
  (SELECT COUNT(*) FROM first_purchase) AS n_purchased
""",
    tags=("events", "funnel", "window"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", F.col("ts").alias("v_ts"))
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("e_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("e_ts")
    )
    first_click = (
        views.join(
            clicks,
            (views.user_id == clicks.user_id)
            & (F.col("e_ts") > F.col("v_ts"))
            & (F.col("e_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        )
        .groupBy(views.user_id.alias("user_id"), "v_ts")
        .agg(F.min("e_ts").alias("c_ts"))
    )
    first_purchase = (
        first_click.join(
            purchases,
            (first_click.user_id == purchases.user_id)
            & (F.col("e_ts") > F.col("c_ts"))
            & (F.col("e_ts") <= F.col("v_ts") + F.expr("INTERVAL 2 HOURS")),
        )
        .groupBy(first_click.user_id.alias("user_id"), "v_ts", "c_ts")
        .agg(F.min("e_ts").alias("p_ts"))
    )
    return (
        views.agg(F.count(F.lit(1)).alias("n_views"))
        .join(first_click.agg(F.count(F.lit(1)).alias("n_clicked")))
        .join(first_purchase.agg(F.count(F.lit(1)).alias("n_purchased")))
    )
