"""Scalable global rank/ntile vs the single-partition window reference."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from spotify_app_etl_spark.operators.rank import global_ntile, global_row_number


def test_global_row_number_matches_window(spark):
    df = spark.range(0, 10_000).select(
        (F.xxhash64("id") % 997).alias("k"), F.col("id")
    )
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(df, ["k", "id"], num_ranges=16).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy("k", "id")).alias("rn")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_rows,n_tiles", [(10_000, 10), (10_007, 13), (5, 10)])
def test_global_ntile_matches_window(spark, n_rows, n_tiles):
    df = spark.range(0, n_rows).select(
        (F.xxhash64("id") % 101).alias("k"), F.col("id")
    )
    got = {
        r["id"]: r["bin"]
        for r in global_ntile(df, ["k", "id"], n_tiles, num_ranges=8).collect()
    }
    want = {
        r["id"]: r["bin"]
        for r in df.select(
            "id", F.ntile(n_tiles).over(Window.orderBy("k", "id")).alias("bin")
        ).collect()
    }
    assert got == want


def test_global_row_number_is_parallel(spark):
    """The ranked plan must NOT contain a single-partition global
    window (the scale cliff this operator exists to avoid)."""
    df = spark.range(0, 1000).select(F.col("id").alias("k"), "id")
    out = global_row_number(df, ["k", "id"], num_ranges=8)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window in the plan partitions by __pid — a bare
    # "Window [... ORDER BY ...]" with SinglePartition would show an
    # Exchange SinglePartition feeding it
    assert "SinglePartition" not in plan.split("== Initial Plan ==")[0]


def test_global_rank_edge_cases(spark):
    empty = spark.range(0).select(F.col("id").alias("k"), "id")
    assert global_row_number(empty, ["k", "id"]).count() == 0
    assert global_ntile(empty, ["k", "id"], 10).count() == 0

    all_equal = spark.range(100).select(F.lit(1).alias("k"), "id")
    rns = sorted(
        r["rn"] for r in global_row_number(all_equal, ["k", "id"]).collect()
    )
    assert rns == list(range(1, 101))
