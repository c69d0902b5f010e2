"""Salted aggregation / join: result parity with the naive plan, and
the salt actually spreads a hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_app_etl_spark.io import load_table
from spotify_app_etl_spark.operators import skew

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    li = load_table(spark, SF, "lineitem")
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.n, round(r.qty, 2))
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty"),
        )
        .collect()
    }
    salted = skew.salted_agg(
        li,
        group_cols=["l_returnflag", "l_linestatus"],
        partial_aggs=[
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("pq"),
        ],
        final_aggs=lambda p: [
            F.sum("pn").alias("n"),
            F.sum("pq").cast("double").alias("qty"),
        ],
        salt_cols=["l_orderkey", "l_linenumber"],
    )
    got = {
        (r.l_returnflag, r.l_linestatus): (r.n, round(r.qty, 2))
        for r in salted.collect()
    }
    assert got == plain


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_linenumber")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, "l_orderkey").count()
    salted = skew.salted_join(
        li, orders, key="l_orderkey", salt_cols=["l_orderkey", "l_linenumber"]
    )
    assert salted.count() == plain
    assert set(salted.columns) == set(li.columns) | {"o_orderpriority"}


def test_salted_join_rejects_build_preserving_types(spark):
    # right/full would emit each unmatched build row once per salt bucket
    import pytest

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_linenumber")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            skew.salted_join(
                li, orders, key="l_orderkey",
                salt_cols=["l_orderkey", "l_linenumber"], how=how,
            )


def test_salt_spreads_hot_key(spark):
    # one hot key: 10k identical rows → salt must split into ≥8 buckets
    hot = spark.range(10000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("row_id")
    )
    salted = hot.withColumn("__salt", skew._salt(["row_id"], 16))
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets >= 12  # ~16 with uniform hashing
    counts = [r.n for r in salted.groupBy("__salt").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert max(counts) < 10000 * 0.2  # no bucket holds >20%
