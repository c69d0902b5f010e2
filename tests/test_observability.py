"""Observed metrics: per-stage counters piggybacked on the one action.

The reference logs row counts by materializing each stage
(spotify-etl.py wall-clock logging, A18-A19). `df.observe` attaches
metric expressions to a plan node so ONE action yields the stage's
rows/sums as a side channel — no second pass over the data, which at
100 TB is the difference between free telemetry and doubling the job.
"""

from __future__ import annotations

from pyspark.sql import Observation, functions as F

from spotify_app_etl_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_observe_yields_stage_metrics_with_one_action(spark):
    scanned = Observation("scanned")
    kept = Observation("kept")
    orders = load_table(spark, SF, "orders").observe(
        scanned,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
    )
    filtered = orders.filter(F.col("o_totalprice") > 100000).observe(
        kept, F.count(F.lit(1)).alias("n_rows")
    )
    out = filtered.count()  # the ONE action

    assert kept.get["n_rows"] == out
    n_src = load_table(spark, SF, "orders").count()
    assert scanned.get["n_rows"] == n_src
    assert scanned.get["total"] > 0
    # the observation measured a strict superset of the filtered stage
    assert scanned.get["n_rows"] > kept.get["n_rows"] > 0
