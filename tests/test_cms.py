"""Count-min sketch (operators/cms.py): the one-sided error guarantee,
the merge identity, probe behavior for absent keys, and the registered
query's riders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark.operators.cms import cms_build, cms_estimate, cms_merge
from spotify_app_etl_spark.registry import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def words(spark):
    # skewed frequencies: word i appears i+1 times, plus NULLs to skip
    rows = [(f"w{i}",) for i in range(50) for _ in range(i + 1)] + [(None,)] * 5
    return spark.createDataFrame(rows, "tok string").cache()


def test_one_sided_guarantee_every_key(spark, words):
    """est >= exact for EVERY key, always — collisions only add. This
    is the CMS contract, not a statistical bound."""
    sketch = cms_build(words, "tok", depth=3, width=64)
    exact = words.filter(F.col("tok").isNotNull()).groupBy("tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    est = cms_estimate(sketch, exact, "tok", depth=3, width=64).collect()
    assert len(est) == 50
    assert all(r["est"] >= r["n"] for r in est), [
        (r["tok"], r["n"], r["est"]) for r in est if r["est"] < r["n"]
    ]


def test_wide_sketch_is_nearly_exact(spark, words):
    """With width >> distinct keys, collisions are rare — most
    estimates equal the exact count (and a broken bucket map would
    push every estimate off)."""
    sketch = cms_build(words, "tok", depth=4, width=4096)
    exact = words.filter(F.col("tok").isNotNull()).groupBy("tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    est = cms_estimate(sketch, exact, "tok", depth=4, width=4096).collect()
    exact_hits = sum(1 for r in est if r["est"] == r["n"])
    assert exact_hits >= 45, f"only {exact_hits}/50 exact at width 4096"


def test_merge_equals_whole(spark, words):
    """Sketch of the union == counter-wise merge of the parts' sketches
    (exact row equality) — the property that makes the summary
    incrementally maintainable."""
    w = words.filter(F.col("tok").isNotNull()).withColumn(
        "half", F.xxhash64("tok") % 2 == 0
    )
    s1 = cms_build(w.filter("half"), "tok", depth=3, width=128)
    s2 = cms_build(w.filter("NOT half"), "tok", depth=3, width=128)
    merged = {
        (r["d"], r["bucket"]): r["cnt"] for r in cms_merge(s1, s2).collect()
    }
    whole = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in cms_build(w, "tok", depth=3, width=128).collect()
    }
    assert merged == whole


def test_absent_key_and_weighted(spark, words):
    sketch = cms_build(words, "tok", depth=3, width=64)
    probe = spark.createDataFrame([("never-inserted-key",)], "tok string")
    [row] = cms_estimate(sketch, probe, "tok", depth=3, width=64).collect()
    assert row["est"] >= 0  # collision floor, never NULL

    weighted = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", None)], "tok string, w int"
    )
    s = cms_build(weighted, "tok", depth=2, width=32, weight_col="w")
    got = {
        r["tok"]: r["est"]
        for r in cms_estimate(
            s, weighted.select("tok").distinct(), "tok", depth=2, width=32
        ).collect()
    }
    assert got["a"] >= 15 and got["b"] >= 0

    with pytest.raises(ValueError, match="positive"):
        cms_build(words, "tok", depth=0)
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_registered_query_riders(spark):
    pdf = load_all()["ns_vocab_cms_estimate"].fn(spark, SF).toPandas()
    assert len(pdf) == 30
    assert pdf["lower_ok"].all(), pdf[~pdf["lower_ok"]]
    assert pdf["upper_ok"].all(), pdf[~pdf["upper_ok"]]
    # top-30 exact counts are sorted descending, ties by token
    assert list(pdf["n_exact"]) == sorted(pdf["n_exact"], reverse=True)


def test_persisted_ingest_retry_idempotent(spark, words, tmp_path):
    """Re-delivering a committed batch_id is a no-op (the foreachBatch
    retry case); a NEW batch merges; a geometry mismatch refuses."""
    from spotify_app_etl_spark.operators.cms import cms_ingest_batch, cms_state_read

    path = str(tmp_path / "cms")
    w = words.filter(F.col("tok").isNotNull())
    cms_ingest_batch(w, path, "tok", depth=3, width=128, batch_id=0)
    once = {(r["d"], r["bucket"]): r["cnt"] for r in cms_state_read(spark, path)[0].collect()}

    cms_ingest_batch(w, path, "tok", depth=3, width=128, batch_id=0)  # retry
    again = {(r["d"], r["bucket"]): r["cnt"] for r in cms_state_read(spark, path)[0].collect()}
    assert again == once, "re-delivered batch was double-counted"

    cms_ingest_batch(w, path, "tok", depth=3, width=128, batch_id=1)  # new batch
    merged = {(r["d"], r["bucket"]): r["cnt"] for r in cms_state_read(spark, path)[0].collect()}
    assert merged == {k: 2 * v for k, v in once.items()}

    with pytest.raises(ValueError, match="refusing to merge"):
        cms_ingest_batch(w, path, "tok", depth=2, width=128, batch_id=2)


def test_streaming_ingest_query_riders(spark):
    pdf = load_all()["ns_streaming_cms_ingest"].fn(spark, SF).toPandas()
    assert len(pdf) == 20
    assert pdf["lower_ok"].all(), pdf[~pdf["lower_ok"]]
    assert pdf["merge_exact_ok"].all(), "streamed sketch != one-shot batch sketch"
