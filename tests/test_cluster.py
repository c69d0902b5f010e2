"""Connected-components unit tests on known graph shapes."""

from __future__ import annotations

import pytest

from spotify_app_etl_spark.operators import cluster as CL


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {r.node: r.component for r in CL.connected_components(df).collect()}


def test_co_partitioned_rounds_match_broadcast_rounds(spark):
    """r11: force the co-partitioned (adaptive-off, captured-layout)
    round mode via autoBroadcastJoinThreshold=-1 — test-sized graphs
    otherwise always take the AQE/broadcast path — and pin
    value-identity plus conf restoration."""
    edges = [(1, 2), (2, 3), (3, 4), (10, 7), (7, 12), (9, 9)]
    base = _cc(spark, edges)
    key = "spark.sql.autoBroadcastJoinThreshold"
    old_thr = spark.conf.get(key)
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set(key, "-1")
    try:
        forced = _cc(spark, edges)
    finally:
        spark.conf.set(key, old_thr)
    assert forced == base
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before


def test_adaptive_off_overlapping_blocks_restore_original():
    """r11 review: two overlapping adaptive_off blocks (foreachBatch
    thread + driver thread) must restore the ORIGINAL conf value when
    the LAST one exits — naive save/restore would latch 'false'."""
    from spotify_app_etl_spark.operators.checkpoint import adaptive_off

    class FakeConf:
        def __init__(self):
            self.vals = {"spark.sql.adaptive.enabled": "true"}

        def get(self, k, default=None):
            return self.vals.get(k, default)

        def set(self, k, v):
            self.vals[k] = v

    class FakeSpark:
        conf = FakeConf()

    s = FakeSpark()
    a, b = adaptive_off(s), adaptive_off(s)
    a.__enter__()
    assert s.conf.get("spark.sql.adaptive.enabled") == "false"
    b.__enter__()  # overlapping: must NOT snapshot 'false' as prev
    a.__exit__(None, None, None)
    assert s.conf.get("spark.sql.adaptive.enabled") == "false"  # b active
    b.__exit__(None, None, None)
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"


def test_chain_merges_transitively(spark):
    # A~B, B~C, C~D: greedy pairwise dedup would keep A and C; CC must
    # put all four in one component labeled by the min id.
    assert _cc(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_components_and_label_is_min(spark):
    got = _cc(spark, [(10, 7), (7, 12), (3, 5)])
    assert got == {7: 7, 10: 7, 12: 7, 3: 3, 5: 3}


def test_self_loops_and_duplicate_edges_ignored(spark):
    got = _cc(spark, [(1, 1), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_self_loop_only_node_gets_singleton_component(spark):
    """A node that appears ONLY in self-loop pairs has no surviving
    edge after the src != dst filter, but the contract promises a row
    for every node in `pairs` — it must come back as a singleton."""
    got = _cc(spark, [(42, 42), (1, 2)])
    assert got == {42: 42, 1: 1, 2: 1}
    assert _cc_star(spark, [(42, 42), (1, 2)]) == {42: 42, 1: 1, 2: 1}


def test_long_chain_converges_within_diameter_rounds(spark):
    # Diameter 12 chain: min-label propagation needs ~12 rounds.
    edges = [(i, i + 1) for i in range(12)]
    assert _cc(spark, edges) == {i: 0 for i in range(13)}


def test_max_iter_fails_loudly(spark):
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        CL.connected_components(df, max_iter=2)


def test_dedup_clusters_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (8, 9)], ["id_a", "id_b"])
    rows = {r.node: (r.component, r.cluster_size) for r in CL.dedup_clusters(df).collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 8: (8, 2), 9: (8, 2)}


def _cc_star(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {r.node: r.component for r in CL.connected_components_star(df).collect()}


def test_star_matches_minlabel_on_random_graphs(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        edges = [
            (rng.randint(0, 120), rng.randint(0, 120)) for _ in range(90)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert _cc(spark, edges) == _cc_star(spark, edges), f"trial {trial}"


def test_star_converges_log_diameter_on_long_chain(spark):
    # Diameter-400 chain: min-label would need 400 rounds; star
    # contraction halves path lengths per round → well under 20.
    edges = [(i, i + 1) for i in range(400)]
    got = _cc_star(spark, edges)
    assert got == {i: 0 for i in range(401)}


def test_star_two_components(spark):
    got = _cc_star(spark, [(10, 7), (7, 12), (3, 5), (20, 21)])
    assert got == {7: 7, 10: 7, 12: 7, 3: 3, 5: 3, 20: 20, 21: 20}
