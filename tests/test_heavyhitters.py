"""Misra-Gries heavy hitters (operators/heavyhitters.py): agreement
with a local reference on one partition, the one-sided and decrement
bounds, the completeness guarantee, merge behavior across partition
layouts, and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark.operators import heavyhitters as HH


def _local_mg(stream, k):
    c: dict = {}
    for x in stream:
        if x in c:
            c[x] += 1
        elif len(c) < k:
            c[x] = 1
        else:
            for key in list(c):
                c[key] -= 1
                if c[key] == 0:
                    del c[key]
    return c


#: Zipf-ish stream: 'h0' dominates, long tail of singletons.
_STREAM = (
    ["h0"] * 400 + ["h1"] * 150 + ["h2"] * 90
    + [f"t{i}" for i in range(300)] * 2
)


def _df(spark, stream, parts=1):
    return spark.createDataFrame(
        [(x,) for x in stream], "key string"
    ).repartition(parts) if parts > 1 else spark.createDataFrame(
        [(x,) for x in stream], "key string"
    ).coalesce(1)


def test_single_partition_matches_local_reference(spark):
    got = {
        r.key: r.est for r in HH.mg_summary(_df(spark, _STREAM), "key", k=8).collect()
    }
    assert got == _local_mg(_STREAM, 8)


@pytest.mark.parametrize("parts", [1, 7])
def test_bounds_and_completeness(spark, parts):
    n = len(_STREAM)
    k = 16
    exact = {x: _STREAM.count(x) for x in set(_STREAM)}
    got = {
        r.key: r.est
        for r in HH.mg_summary(_df(spark, _STREAM, parts), "key", k=k).collect()
    }
    for key, est in got.items():
        assert est <= exact[key]  # one-sided
        assert exact[key] - est <= n / (k + 1)  # decrement bound
    # completeness: every key with true count > n/(k+1) is present
    for key, cnt in exact.items():
        if cnt > n / (k + 1):
            assert key in got, key


def test_topk_ranks_the_dominant_key_first(spark):
    top = HH.mg_topk(_df(spark, _STREAM, 4), "key", k=16, top=3).collect()
    assert top[0].key == "h0"


def test_null_keys_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "key string")
    got = {r.key: r.est for r in HH.mg_summary(df, "key", k=4).collect()}
    assert got == {"a": 2}


def test_guards(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="k must be"):
        HH.mg_summary(df, "key", k=0)
    with pytest.raises(ValueError, match="top must be"):
        HH.mg_topk(df, "key", k=4, top=0)


def test_registered_query_riders(spark):
    from spotify_app_etl_spark.registry import load_all

    rows = load_all()["ns_vocab_heavy_hitters"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and all(r.under_ok and r.err_ok for r in rows)
