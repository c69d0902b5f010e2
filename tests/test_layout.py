"""Executed-plan assertions for the physical-layout queries.

Correctness of the layout queries is covered by the oracle-parity
suite; these tests pin the *plan shapes* that make them worth having:
partition pruning actually prunes, and the bucketed join actually
avoids its shuffles. Plan strings come from the executed (post-AQE)
plan, not the optimizer estimate.
"""

from __future__ import annotations

from spotify_app_etl_spark.plans import layout

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.collect()  # finalize AQE so the string shows the real plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_prunes_directories(spark):
    df = layout.pruned_scan(spark, SF)
    plan = _executed_plan(df)
    scan = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    assert "PartitionFilters: [" in scan
    # 3 of 30 daily partitions selected
    assert df.select("event_date").distinct().count() == 3


def test_partitioned_scan_reads_only_selected_days(spark):
    rows = layout.pruned_scan(spark, SF).select("event_date").distinct().collect()
    days = sorted(str(r.event_date) for r in rows)
    assert days == ["2024-01-03", "2024-01-04", "2024-01-05"]


def test_bucketed_join_has_no_exchange(spark):
    # At sf0.001 AQE would broadcast the tiny orders side (also
    # shuffle-free, but it hides the bucketing). Disable broadcast to
    # get the at-scale shape: fact⋈fact sort-merge join reading both
    # bucketed layouts directly — zero Exchange anywhere in the plan.
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        joined = layout.bucketed_join(spark, SF)
        plan = _executed_plan(joined)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_salted_join_spreads_hot_key(spark):
    # the salted probe side must distribute one suppkey's rows across
    # multiple (key, salt) combinations — that is the whole point
    from pyspark.sql import functions as F

    from spotify_app_etl_spark.operators import skew
    from spotify_app_etl_spark.plans.common import t

    li = t(spark, SF, "lineitem").select("l_suppkey", "l_orderkey", "l_linenumber")
    salted = li.withColumn(
        "__salt", skew._salt(li, ["l_orderkey", "l_linenumber"], 8)
    )
    top = (
        salted.groupBy("l_suppkey")
        .agg(F.countDistinct("__salt").alias("n_salts"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .first()
    )
    assert top.n_salts > 1, "hot key stayed in one salt bucket"
