"""Deterministic storage release for iterative localCheckpoint loops.

The iterative operators (CC, PageRank) replace their checkpointed loop
state every round; without an explicit release the superseded
generations stay in executor storage until JVM GC happens to run —
the 128x scale probe measured the resulting eviction thrash as an 80x
wall-time bend on a 2-round CC. These tests pin (a) the release
helper's contract and (b) that the loops actually end with a bounded
number of live checkpoint RDDs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark.operators.checkpoint import release_local_checkpoint
from spotify_app_etl_spark.operators.cluster import (
    connected_components,
    connected_components_star,
)
from spotify_app_etl_spark.operators.graph import pagerank


def _live_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _drain_persisted(spark) -> None:
    """Unpersist everything so each test starts from a clean pool."""
    rdds = spark.sparkContext._jsc.getPersistentRDDs()  # dict-like via py4j
    for jrdd in list(rdds.values()):
        try:
            jrdd.unpersist(True)
        except Exception:
            pass


@pytest.fixture()
def clean_pool(spark):
    _drain_persisted(spark)
    yield spark
    _drain_persisted(spark)


def test_releases_checkpoint_root(clean_pool):
    spark = clean_pool
    ck = spark.range(100).localCheckpoint()
    ck.count()
    before = _live_persisted(spark)
    assert release_local_checkpoint(ck) is True
    assert _live_persisted(spark) == before - 1


def test_refuses_derived_plan_and_none(clean_pool):
    spark = clean_pool
    ck = spark.range(100).selectExpr("id", "id * 2 AS v").localCheckpoint()
    derived = ck.drop("v")
    before = _live_persisted(spark)
    # a derived plan must NOT release the storage its siblings share
    assert release_local_checkpoint(derived) is False
    assert release_local_checkpoint(None) is False
    assert release_local_checkpoint(spark.range(3)) is False  # never persisted
    assert _live_persisted(spark) == before
    assert ck.count() == 100  # storage untouched


def test_cc_leaves_bounded_live_state(clean_pool):
    spark = clean_pool
    # a 6-link chain forces several label-propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], ["id_a", "id_b"]
    )
    out = connected_components(pairs).collect()
    assert {(r.node, r.component) for r in out} == {(i, 0) for i in range(8)}
    # everything but the returned generation was released in-loop
    # (labels result = 1 live checkpoint; edges was released on return)
    assert _live_persisted(spark) <= 1


def test_cc_star_leaves_bounded_live_state(clean_pool):
    spark = clean_pool
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["id_a", "id_b"]
    )
    out = connected_components_star(pairs).collect()
    assert {(r.node, r.component) for r in out} == {(i, 0) for i in range(41)}
    # final edges + all_nodes stay live (the returned plan reads them
    # lazily); every superseded rewire generation was released
    assert _live_persisted(spark) <= 2


def test_pagerank_leaves_bounded_live_state(clean_pool):
    spark = clean_pool
    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (3, 7)],
        ["src", "dst"],
    )
    ranks, rounds = pagerank(edges, fixed_rounds=8)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)
    assert rounds == 8
    # 8 rounds must not leave 8 rank generations live: only the
    # returned vector survives (e/nodes/outdeg released on return)
    assert _live_persisted(spark) <= 1
