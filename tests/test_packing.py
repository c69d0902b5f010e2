"""Sequence packing without truncation (operators/packing.py): exact
BFD semantics against a local reference, the hard invariants
(conservation, capacity, fill accounting), oversize handling,
determinism, and guards."""

from __future__ import annotations

from bisect import bisect_left, insort

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark.operators import packing as PK


def _local_bfd(lengths: list[tuple[int, int]], capacity: int):
    """Reference BFD over (id, len): returns {id: local_bin}."""
    order = sorted(lengths, key=lambda t: (-t[1], t[0]))
    residuals: list[tuple[int, int]] = []
    fills: list[int] = []
    out: dict[int, int] = {}
    for i, ln in order:
        if ln > capacity:
            out[i] = len(fills)
            fills.append(ln)
            continue
        j = bisect_left(residuals, (ln, -1))
        if j < len(residuals):
            res, b = residuals.pop(j)
            insort(residuals, (res - ln, b))
            fills[b] += ln
            out[i] = b
        else:
            out[i] = len(fills)
            fills.append(ln)
            insort(residuals, (capacity - ln, len(fills) - 1))
    return out


def test_matches_local_bfd_single_group(spark):
    rows = [(i, ln) for i, ln in enumerate([9, 8, 7, 3, 2, 2, 1, 1])]
    df = spark.createDataFrame(rows, "id long, ln long")
    got = {
        r.id: r.bin_id
        for r in PK.pack_sequences(df, "id", "ln", capacity=10, n_groups=1).collect()
    }
    assert got == _local_bfd(rows, 10)  # group 0 → bin_id == local bin


def test_invariants_on_random_lengths(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 700)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, ln long")
    packed = PK.pack_sequences(df, "id", "ln", capacity=2048, n_groups=8)
    pdf = packed.toPandas()
    # conservation: every doc exactly once
    assert sorted(pdf["id"]) == [i for i, _ in rows]
    # capacity + fill accounting via the rider aggregate
    stats = PK.packing_stats(packed, capacity=2048, n_groups=8).collect()[0]
    assert stats.n_docs == 500
    assert stats.capacity_ok and stats.fill_ok
    assert stats.n_fill_mismatch == 0
    # bin_fill on each row equals its bin's total length
    by_bin = pdf.groupby("bin_id")["length"].sum()
    assert all(by_bin[b] == f for b, f in zip(pdf["bin_id"], pdf["bin_fill"]))


def test_oversize_docs_get_singleton_bins(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 100)], "id long, ln long"
    )
    pdf = PK.pack_sequences(df, "id", "ln", capacity=1024, n_groups=1).toPandas()
    over = pdf[pdf["id"] == 1]
    assert bool(over["oversize"].iloc[0])
    assert (pdf[pdf["oversize"]]["bin_id"].value_counts() == 1).all()
    stats = PK.packing_stats(
        PK.pack_sequences(df, "id", "ln", capacity=1024, n_groups=1),
        capacity=1024,
        n_groups=1,
    ).collect()[0]
    assert stats.capacity_ok  # the oversize singleton is exempt


def test_string_ids_survive_and_stay_deterministic(spark):
    rows = [(f"doc-{i:04d}", (i * 13) % 300 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "id string, ln long")
    a = PK.pack_sequences(df, "id", "ln", capacity=1024, n_groups=4).collect()
    b = PK.pack_sequences(df, "id", "ln", capacity=1024, n_groups=4).collect()
    assert sorted(r.id for r in a) == sorted(i for i, _ in rows)  # no NULLed ids
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fill_ok_holds_for_tiny_corpus_across_many_groups(spark):
    # 100 unit-length docs over 64 groups: an OPTIMAL packing uses up
    # to one bin per group — the +n_groups slack must absorb that
    df = spark.createDataFrame([(i, 1) for i in range(100)], "id long, ln long")
    packed = PK.pack_sequences(df, "id", "ln", capacity=2048, n_groups=64)
    stats = PK.packing_stats(packed, capacity=2048, n_groups=64).collect()[0]
    assert stats.fill_ok and stats.capacity_ok and stats.n_docs == 100


def test_null_length_fails_loudly(spark):
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, 10), (2, None)], "id long, ln long"
    )
    with _pt.raises(Exception, match="NULL id/length"):
        PK.pack_sequences(df, "id", "ln", capacity=100, n_groups=1).collect()


def test_negative_length_fails_loudly(spark):
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, 10), (2, -3)], "id long, ln long"
    )
    with _pt.raises(Exception, match="negative lengths"):
        PK.pack_sequences(df, "id", "ln", capacity=100, n_groups=1).collect()


def test_deterministic(spark):
    rows = [(i, (i * 37) % 400 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, ln long")
    a = PK.pack_sequences(df, "id", "ln", capacity=1000, n_groups=4).collect()
    b = PK.pack_sequences(df, "id", "ln", capacity=1000, n_groups=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_guards(spark):
    df = spark.createDataFrame([(1, 10)], "id long, ln long")
    with pytest.raises(ValueError, match="capacity"):
        PK.pack_sequences(df, "id", "ln", capacity=0)
    with pytest.raises(ValueError, match="n_groups"):
        PK.pack_sequences(df, "id", "ln", capacity=10, n_groups=0)


def test_registered_query_riders_true(spark):
    from spotify_app_etl_spark.registry import load_all

    out = load_all()["ns_pack_sequences"].fn(spark, "/root/testdata/sf0.001")
    row = out.limit(1).collect()[0]
    assert row.conservation_ok and row.capacity_ok
    assert row.fills_ok and row.fill_ok
