"""io: stringify compat mode, parquet writer (plain + partitioned),
typed loaders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark import io, schemas
from spotify_app_etl_spark.io import load_table

SF = "/root/testdata/sf0.001"


def test_stringify_types_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.5, True, None), (2, None, False, "x")],
        "i long, d double, b boolean, s string",
    )
    out = io.stringify(df)
    assert all(t == "string" for _, t in out.dtypes)
    rows = {r.i: r for r in out.collect()}
    # SQL NULL stays NULL (the reference's astype(str) writes 'None'/'nan'
    # — documented divergence, SURVEY.md §1.4)
    assert rows["2"].d is None and rows["1"].s is None
    assert rows["1"].d == "1.5" and rows["1"].b == "true"


def test_write_parquet_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    io.write_parquet(nation, str(tmp_path / "n"))
    back = spark.read.parquet(str(tmp_path / "n"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_write_parquet_partitioned_prunes(spark, tmp_path):
    orders = load_table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    io.write_parquet(orders, str(tmp_path / "o"), partition_by=["o_year"])
    back = spark.read.parquet(str(tmp_path / "o")).filter(F.col("o_year") == 1996)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the 1996 filter must land in PartitionFilters,
    # not a post-scan Filter
    assert "PartitionFilters: [" in plan and "o_year" in plan.split("PartitionFilters:")[1][:200]
    expected = orders.filter(F.col("o_year") == 1996).count()
    assert back.count() == expected > 0


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key must join without a shuffle
    (no Exchange above either scan)."""
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    io.write_bucketed(orders, "t_orders_b", ["o_orderkey"], num_buckets=8)
    io.write_bucketed(li, "t_lineitem_b", ["o_orderkey"], num_buckets=8)
    joined = spark.table("t_orders_b").join(spark.table("t_lineitem_b"), "o_orderkey")
    # disable broadcast so the co-location actually decides the plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def _derby_url(tmp_path, name: str) -> str:
    # Embedded Derby ships with Spark (jars/derby*.jar) — a real JDBC
    # endpoint with no external service, exercising the same
    # dialect/DDL/insert path a Postgres sink would use.
    return f"jdbc:derby:{tmp_path}/{name};create=true"


DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_write_jdbc_overwrite_roundtrip(spark, tmp_path):
    """Snapshot-replace semantics of the reference load stage
    (spotify-etl.py:209-215): two overwrites → table holds exactly the
    second snapshot, with typed columns preserved through SQL types."""
    url = _derby_url(tmp_path, "db1")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    first = orders.limit(50)
    io.write_jdbc(first, url, "snap", properties=DERBY_PROPS)
    second = orders.filter(F.col("o_orderkey") % 2 == 0).limit(80)
    io.write_jdbc(second, url, "snap", properties=DERBY_PROPS)
    back = spark.read.jdbc(url, "snap", properties=DERBY_PROPS)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, second.collect()))
    assert dict(back.dtypes)["o_totalprice"] == "double"
    assert dict(back.dtypes)["o_orderdate"] == "timestamp"


def test_write_jdbc_truncate_keeps_ddl(spark, tmp_path):
    """truncate=True reuses the existing table DDL instead of
    drop+recreate — verified by the second write succeeding against the
    first write's schema and replacing its rows."""
    url = _derby_url(tmp_path, "db2")
    nation = load_table(spark, SF, "nation").select("n_nationkey", "n_name")
    io.write_jdbc(nation, url, "snap", properties=DERBY_PROPS)
    io.write_jdbc(
        nation.filter(F.col("n_nationkey") < 5), url, "snap",
        truncate=True, properties=DERBY_PROPS,
    )
    back = spark.read.jdbc(url, "snap", properties=DERBY_PROPS)
    assert back.count() == 5


def test_write_jdbc_stringify_compat(spark, tmp_path):
    """Reference-shaped all-text load (astype(str) intent, §1.4): every
    column lands as a SQL text type and reads back as string."""
    url = _derby_url(tmp_path, "db3")
    nation = load_table(spark, SF, "nation")
    io.write_jdbc(nation, url, "snap", stringify_compat=True, properties=DERBY_PROPS)
    back = spark.read.jdbc(url, "snap", properties=DERBY_PROPS)
    assert all(t == "string" for _, t in back.dtypes)
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    want = {str(r.n_nationkey): r.n_name for r in nation.collect()}
    assert got == want


def test_loaders_match_declared_schemas(spark):
    for name, schema in schemas.TESTDATA.items():
        df = load_table(spark, SF, name)
        declared = {f.name: f.dataType.simpleString() for f in schema.fields}
        actual = dict(df.dtypes)
        assert actual == declared, f"{name}: {actual} != {declared}"


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """200 tiny files -> sized file count; rows and values survive."""
    src = str(tmp_path / "small_files")
    df = load_table(spark, SF, "orders")
    n_rows = df.count()
    df.repartition(200).write.mode("overwrite").parquet(src)
    import os

    n_before = sum(
        1 for _, _, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    assert n_before > 50, f"fixture produced only {n_before} files"
    n_after = io.compact_parquet(spark, src, target_file_bytes=64 * 1024 * 1024)
    assert n_after < 10
    back = spark.read.parquet(src + ".compact")
    assert back.count() == n_rows
    assert {r.o_orderkey for r in back.select("o_orderkey").collect()} == {
        r.o_orderkey for r in df.select("o_orderkey").collect()
    }


def test_compact_refuses_streaming_sink_and_noops_on_empty(spark, tmp_path):
    """compact_* must fail loudly on a streaming file-sink table (its
    _spark_metadata commit log would dangle after a swap) and return 0
    for a dataset with no data files instead of crashing on schema
    inference."""
    import pytest

    from spotify_app_etl_spark.io import compact_parquet, compact_partitioned

    # empty dataset (no parquet files at all) -> no-op, not a crash
    empty = tmp_path / "empty"
    empty.mkdir()
    (empty / "_SUCCESS").touch()
    assert compact_parquet(spark, str(empty)) == 0

    # streaming-sink marker -> loud refusal on both entry points
    sink = tmp_path / "sink"
    (sink / "_spark_metadata").mkdir(parents=True)
    spark.range(10).write.mode("append").parquet(str(sink))
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_parquet(spark, str(sink))
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_partitioned(spark, str(sink))
