"""Bloom prefilter: distributed build correctness + beyond-broadcast build sides."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from spotify_app_etl_spark.operators import bloom


def test_distributed_build_matches_local(spark):
    """The executor-side build must produce the exact bitset the local
    numpy reference builds (same sizing → same positions → same bits),
    modulo sizing drift from approx_count_distinct."""
    keys = np.arange(0, 5000, dtype=np.int64) * 7919 % 1_000_003
    df = spark.createDataFrame([(int(k),) for k in keys], "k long").repartition(16)
    blob_d, k_d, m_d = bloom.build_bloom_distributed(df, "k", fpp=0.01)
    # rebuild locally with the SAME (k, m) the distributed path sized
    uniq = np.unique(keys)
    pos = bloom._positions(uniq, k_d, m_d).ravel()
    bits = np.zeros((m_d + 7) // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    assert blob_d == bits.tobytes()


def test_distributed_build_no_false_negatives_and_fpp(spark):
    rng = np.random.RandomState(7)
    members = rng.choice(10_000_000, size=20_000, replace=False).astype(np.int64)
    df = spark.createDataFrame([(int(k),) for k in members], "k long")
    blob, k, m = bloom.build_bloom_distributed(df, "k", fpp=0.01)

    bits = np.frombuffer(blob, dtype=np.uint8)

    def contains(arr):
        pos = bloom._positions(arr, k, m)
        return ((bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0).all(
            axis=1
        )

    assert contains(members).all()  # no false negatives, ever
    outside = np.setdiff1d(
        rng.choice(10_000_000, size=30_000, replace=False).astype(np.int64), members
    )
    fp = contains(outside).mean()
    assert fp < 0.03, fp  # target 1%, generous margin


def test_prefiltered_join_exact_beyond_broadcast_budget(spark):
    """With autoBroadcastJoinThreshold forced to -1 (no broadcast join
    possible), the Bloom-prefiltered join must still equal the plain
    join — the build never relies on driver-side key collection."""
    probe = spark.range(0, 50_000).select(
        (F.col("id") % 10_000).alias("pk"), F.col("id").alias("payload")
    )
    build = (
        spark.range(0, 3_000)
        .select((F.col("id") * 3).alias("bk"))
        .repartition(8)
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = (
            bloom.bloom_prefiltered_join(probe, build, "pk", "bk")
            .select("pk", "payload", "bk")
            .collect()
        )
        want = (
            probe.join(build, probe.pk == build.bk)
            .select("pk", "payload", "bk")
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_empty_build_side_filters_everything(spark):
    probe = spark.range(0, 100).select(F.col("id").alias("pk"))
    build = spark.range(0, 10).select(F.col("id").alias("bk")).filter("bk < 0")
    out = bloom.bloom_prefiltered_join(probe, build, "pk", "bk")
    assert out.count() == 0


def test_distributed_build_multi_chunk_merge(spark):
    """Tiny chunk_bytes forces the filter across many chunks: the
    chunked OR-merge and reassembly must be byte-identical to the
    single-chunk build, and sparse partitions must be allowed to skip
    all-zero chunks."""
    keys = (np.arange(0, 3000, dtype=np.int64) * 6367) % 899_981
    df = spark.createDataFrame([(int(k),) for k in keys], "k long").repartition(16)
    one_blob, k1, m1 = bloom.build_bloom_distributed(df, "k", fpp=0.01)
    chunked_blob, k2, m2 = bloom.build_bloom_distributed(
        df, "k", fpp=0.01, chunk_bytes=64
    )
    assert (k1, m1) == (k2, m2)
    assert one_blob == chunked_blob


def test_null_probe_keys_filtered_not_crashed(spark):
    """NULL probe keys (e.g. left-join-produced fact keys) must behave
    like the plain inner join — dropped, not a task-killing ValueError
    from the NaN-bearing Arrow batch."""
    probe = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 100).alias("pk"),
        F.col("id").alias("payload"),
    )
    build = spark.range(0, 50).select(F.col("id").alias("bk"))
    got = (
        bloom.bloom_prefiltered_join(probe, build, "pk", "bk")
        .select("pk", "payload")
        .collect()
    )
    want = probe.join(build, probe.pk == build.bk).select("pk", "payload").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_null_in_batch_does_not_corrupt_large_keys(spark):
    """A NULL sharing an Arrow batch with a key above 2^53 must not
    round-trip that key through float64 (1152921504606846977 → …976),
    which would probe the wrong bit positions — a Bloom false negative
    that silently drops a matching join row."""
    big = (1 << 60) + 1  # not representable in float64
    build = spark.createDataFrame([(big,)], "bk long")
    probe = spark.createDataFrame(
        [(big, "hit"), (None, "null"), (123, "miss")], "pk long, tag string"
    ).coalesce(1)  # one partition → one Arrow batch holding NULL + big key
    got = (
        bloom.bloom_prefiltered_join(probe, build, "pk", "bk")
        .select("pk", "tag")
        .collect()
    )
    assert [(r["pk"], r["tag"]) for r in got] == [(big, "hit")]


def test_probe_preserving_join_rejected(spark):
    """how='left' must be rejected: the prefilter drops probe rows a
    left join is required to keep."""
    import pytest

    probe = spark.range(0, 10).select(F.col("id").alias("pk"))
    build = spark.range(0, 5).select(F.col("id").alias("bk"))
    with pytest.raises(ValueError, match="probe-preserving"):
        bloom.bloom_prefiltered_join(probe, build, "pk", "bk", how="left")
