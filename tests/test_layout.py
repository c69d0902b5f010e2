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
        "__salt", skew._salt(["l_orderkey", "l_linenumber"], 8)
    )
    top = (
        salted.groupBy("l_suppkey")
        .agg(F.countDistinct("__salt").alias("n_salts"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .first()
    )
    assert top.n_salts > 1, "hot key stayed in one salt bucket"


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """Z-ordered files must cover small rectangles of (user_id, hour):
    per-file value ranges on BOTH dims beat a single-column sort, so
    parquet min/max stats can prune on either predicate."""
    import pyspark.sql.functions as F

    from spotify_app_etl_spark import io as sio
    from spotify_app_etl_spark.plans.common import t

    raw = t(spark, SF, "events").select(
        "event_id",
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(F.unix_timestamp("ts") / 3600).alias("abs_hour"),
    )
    lo = raw.agg(
        F.min("abs_hour"), F.max("abs_hour"), F.min("user_id"), F.max("user_id")
    ).first()
    h0, h1, u0, u1 = lo
    # morton_key contract: both dims pre-scaled onto the FULL [0, 2^bits)
    # range — equal resolution per dimension is what makes interleaved
    # bits alternate meaningfully (a 4-bit-wide dim under a 10-bit-wide
    # dim would only ever vary within fine-grained Z segments)
    bits = 8
    top = (1 << bits) - 1
    ev = raw.select(
        "event_id",
        "user_id",
        F.floor((F.col("user_id") - u0) * top / (u1 - u0)).alias("u_s"),
        (F.col("abs_hour") - h0).alias("hour"),
        F.floor((F.col("abs_hour") - h0) * top / (h1 - h0)).alias("h_s"),
    )
    n_files = 16

    z_path = str(tmp_path / "z")
    sio.write_zordered(ev, z_path, "u_s", "h_s", n_files=n_files, bits=bits)
    s_path = str(tmp_path / "s")  # baseline: sorted by hour only
    (
        ev.repartitionByRange(n_files, "hour")
        .sortWithinPartitions("hour")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    def mean_file_span(path: str, col: str) -> float:
        spans = (
            spark.read.parquet(path)
            .withColumn("__f", F.input_file_name())
            .groupBy("__f")
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        return sum(r.span for r in spans) / len(spans)

    full_user_span = ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    # hour-sorted files know nothing about user_id: each file spans
    # nearly the whole user domain; z-ordered files must do much better
    assert mean_file_span(s_path, "user_id") > 0.8 * full_user_span
    assert mean_file_span(z_path, "user_id") < 0.6 * full_user_span
    # and z-order still clusters the time dimension far better than
    # random: each file covers a fraction of the 30-day hour range
    full_hour_span = ev.agg(F.max("hour") - F.min("hour")).first()[0]
    assert mean_file_span(z_path, "hour") < 0.6 * full_hour_span


def test_compact_partitioned_most_fragmented_first(spark, tmp_path):
    """Only the worst-fragmented partitions are rewritten (bounded job),
    data survives byte-identical, and the partition layout is intact."""
    import pyspark.sql.functions as F

    from spotify_app_etl_spark.io import compact_partitioned

    path = str(tmp_path / "events_by_day")
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("day"), F.col("id").alias("v")
    )
    # day 0: heavily fragmented; day 1: moderately; day 2: already compact
    df.filter("day = 0").repartition(20).write.partitionBy("day").mode(
        "append"
    ).parquet(path)
    df.filter("day = 1").repartition(6).write.partitionBy("day").mode(
        "append"
    ).parquet(path)
    df.filter("day = 2").repartition(1).write.partitionBy("day").mode(
        "append"
    ).parquet(path)

    before = spark.read.parquet(path)
    before_rows = sorted((r.day, r.v) for r in before.collect())

    done = compact_partitioned(
        spark, path, target_file_bytes=1 << 30, max_partitions=1
    )
    # exactly the single most-fragmented partition compacted, to 1 file
    assert done == {"day=0": 1}

    after = spark.read.parquet(path)
    assert sorted((r.day, r.v) for r in after.collect()) == before_rows

    # second pass takes the next offender; day=2 is below the
    # min-files threshold and is never rewritten
    done2 = compact_partitioned(
        spark, path, target_file_bytes=1 << 30, max_partitions=10
    )
    assert done2 == {"day=1": 1}


def test_compact_partitioned_resumes_crashed_swap(spark, tmp_path):
    """Staging present + live dir missing (a crash between delete and
    rename) must be promoted on the next invocation before rescanning."""
    import pyspark.sql.functions as F

    from spotify_app_etl_spark.io import compact_partitioned

    path = str(tmp_path / "t")
    df = spark.range(0, 200).select((F.col("id") % 2).alias("day"), F.col("id").alias("v"))
    df.write.partitionBy("day").mode("overwrite").parquet(path)
    rows_before = sorted((r.day, r.v) for r in spark.read.parquet(path).collect())

    # simulate the crash window: day=0 fully staged, live dir deleted
    import shutil

    spark.read.parquet(f"{path}/day=0").coalesce(1).write.parquet(
        f"{path}/.day=0.compact"
    )
    shutil.rmtree(f"{path}/day=0")

    compact_partitioned(spark, path, target_file_bytes=1 << 30, max_partitions=0)
    assert sorted(
        (r.day, r.v) for r in spark.read.parquet(path).collect()
    ) == rows_before


def test_compact_partitioned_recovers_every_swap_window(spark, tmp_path):
    """The rename-based swap leaves a complete copy in every crash
    window; each hidden-dir state must resolve to the full partition:
    (a) .compact + .trash present, live missing → promote staging;
    (b) .trash present, live present → stale copy dropped, live kept;
    (c) .compact present, live present → possibly-partial staging
        dropped, live kept."""
    import shutil

    import pyspark.sql.functions as F

    from spotify_app_etl_spark.io import compact_partitioned

    path = str(tmp_path / "t")
    df = spark.range(0, 300).select(
        (F.col("id") % 3).alias("day"), F.col("id").alias("v")
    )
    df.write.partitionBy("day").mode("overwrite").parquet(path)
    rows_before = sorted((r.day, r.v) for r in spark.read.parquet(path).collect())

    # (a) crash between rename(live, trash) and rename(compact, live)
    spark.read.parquet(f"{path}/day=0").coalesce(1).write.parquet(
        f"{path}/.day=0.compact"
    )
    shutil.move(f"{path}/day=0", f"{path}/.day=0.trash")
    # (b) crash after the promote, before the trash cleanup
    shutil.copytree(f"{path}/day=1", f"{path}/.day=1.trash")
    # (c) crash after staging, before the swap began (staging partial)
    import pathlib

    pathlib.Path(f"{path}/.day=2.compact").mkdir()
    pathlib.Path(f"{path}/.day=2.compact/part-00000.parquet").write_bytes(b"junk")

    compact_partitioned(spark, path, target_file_bytes=1 << 30, max_partitions=0)
    assert sorted(
        (r.day, r.v) for r in spark.read.parquet(path).collect()
    ) == rows_before
    leftovers = [p.name for p in (tmp_path / "t").iterdir() if p.name.startswith(".")]
    assert not [n for n in leftovers if n.endswith((".compact", ".trash"))], leftovers


def test_compact_partitioned_scheme_qualified_path(spark, tmp_path):
    """A scheme-qualified base path (``file://...``, standing in for
    ``s3a://`` / ``hdfs://``) must compact and crash-recover the same as
    a bare local path: Hadoop's listing returns fully-qualified URIs
    (``file:/...``) that never string-match the raw caller path, and any
    ``"//" → "/"`` cleanup would corrupt the URI authority."""
    import shutil

    import pyspark.sql.functions as F

    from spotify_app_etl_spark.io import compact_partitioned

    path = f"file://{tmp_path}/t"
    local = str(tmp_path / "t")
    df = spark.range(0, 400).select(
        (F.col("id") % 2).alias("day"), F.col("id").alias("v")
    )
    df.repartition(8).write.partitionBy("day").mode("overwrite").parquet(path)
    rows_before = sorted((r.day, r.v) for r in spark.read.parquet(path).collect())

    done = compact_partitioned(spark, path, target_file_bytes=1 << 30)
    assert set(done) == {"day=0", "day=1"} and all(n == 1 for n in done.values())
    assert sorted(
        (r.day, r.v) for r in spark.read.parquet(path).collect()
    ) == rows_before

    # crash-window recovery under the qualified path: staged copy
    # present, live dir gone → promoted to the RIGHT location
    spark.read.parquet(f"{path}/day=0").coalesce(1).write.parquet(
        f"{path}/.day=0.compact"
    )
    shutil.rmtree(f"{local}/day=0")
    compact_partitioned(spark, path, target_file_bytes=1 << 30, max_partitions=0)
    assert sorted(
        (r.day, r.v) for r in spark.read.parquet(path).collect()
    ) == rows_before


def test_morton_key_int_columns_no_sign_corruption(spark):
    """shiftleft on IntegerType wraps at bit 31: an int-typed column
    with bit 15 set used to sign-extend garbage into the long key. The
    key must be identical whether the inputs are int or long."""
    import pyspark.sql.functions as F

    from spotify_app_etl_spark.io import morton_key

    df = spark.range(0, 70_000, 4096).select(
        F.col("id").cast("int").alias("ai"),
        F.col("id").cast("int").alias("bi"),
        F.col("id").alias("al"),
        F.col("id").alias("bl"),
    )
    out = df.select(
        morton_key("ai", "bi", bits=16).alias("ki"),
        morton_key("al", "bl", bits=16).alias("kl"),
    )
    rows = out.collect()
    assert all(r.ki == r.kl for r in rows)
    assert all(r.ki >= 0 for r in rows)


def test_morton_key_rejects_unrepresentable_bits(spark):
    """bits > 31 silently corrupts the key (long shiftleft wraps its
    amount mod 64; bit 63 is the sign) — the contract must fail loudly
    instead."""
    import pytest

    from spotify_app_etl_spark.io import morton_key

    for bad in (0, 32, 33, 64):
        with pytest.raises(ValueError, match="bits"):
            morton_key("a", "b", bits=bad)


def test_zorder_skipping_query_riders(spark):
    from spotify_app_etl_spark.registry import load_all

    rows = load_all()["ns_layout_zorder_skipping"].fn(
        spark, SF
    ).collect()
    assert len(rows) == 16
    assert all(r.rows_preserved and r.u_skip_ok and r.h_skip_ok for r in rows)
    # files are emitted in curve order
    zs = [r.z_start for r in rows]
    assert zs == sorted(zs)


def test_zorder_skipping_query_degenerate_hour_domain(spark, tmp_path):
    # ADVICE r07: a constant dimension made the min-max divisor 0
    # (ANSI division error). With the max(span, 1) guard the query
    # runs, the constant dimension lands wholly on grid cell 0, and
    # its skip rider holds vacuously (per-file span 0 < 0.6).
    import pandas as pd

    n = 400
    pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": [i % 37 for i in range(n)],
            "ts": pd.Timestamp("2024-03-01 12:00:00"),  # constant hour
        }
    ).to_parquet(str(tmp_path / "events.parquet"), index=False)
    from spotify_app_etl_spark.registry import load_all

    rows = load_all()["ns_layout_zorder_skipping"].fn(spark, str(tmp_path)).collect()
    assert rows
    assert all(r.rows_preserved and r.u_skip_ok and r.h_skip_ok for r in rows)
    assert all(r.h_span == 0 for r in rows)
