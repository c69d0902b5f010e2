"""zlib compression-ratio signal (functions/text.compression_signal):
repetition ordering, NULL/empty contract, determinism, and the
registered query's riders."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from spotify_app_etl_spark.functions.text import compression_signal


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select("id", compression_signal()(F.col("text")).alias("z")).collect()
    return {r.id: (r.z.orig_bytes, r.z.comp_bytes) if r.z else None for r in rows}


def test_repetitive_text_compresses_better(spark):
    rep = "spam " * 200
    # varied text of the SAME byte length
    varied = " ".join(f"w{i:03d}" for i in range(200)) + " "
    assert len(rep) == len(varied)
    got = _run(spark, [rep, varied])
    (o1, c1), (o2, c2) = got[0], got[1]
    assert o1 == o2 == len(rep.encode())
    assert c1 < c2  # repetition MUST compress better


def test_matches_local_zlib_exactly(spark):
    texts = ["alpha beta gamma", "aaaaaa", "x"]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        assert got[i] == (len(raw), len(zlib.compress(raw, 6)))


def test_null_and_empty_contract(spark):
    got = _run(spark, [None, ""])
    assert got[0] == (None, None)  # field-level nulls, struct present
    assert got[1] == (0, None)


def test_registered_query_riders(spark):
    from spotify_app_etl_spark.registry import load_all

    row = (
        load_all()["ns_quality_compression"]
        .fn(spark, "/root/testdata/sf0.001")
        .limit(1)
        .collect()[0]
    )
    assert row.corr_ok and row.range_ok
