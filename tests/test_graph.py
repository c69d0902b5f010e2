"""PageRank (operators/graph.py): analytic values on hand graphs,
agreement with a local power-iteration reference (same dangling
convention), mass conservation, convergence behavior, and guards."""

from __future__ import annotations

import pytest

from spotify_app_etl_spark.operators.graph import pagerank


def _local_pagerank(edges, d=0.85, tol=1e-10, max_iter=200):
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    outdeg = [0] * n
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = [1.0 / n] * n
    for _ in range(max_iter):
        dangling = sum(r[i] for i in range(n) if outdeg[i] == 0)
        new = [(1 - d) / n + d * dangling / n] * n
        for u, v in edges:
            new[idx[v]] += d * r[idx[u]] / outdeg[idx[u]]
        delta = max(abs(a - b) for a, b in zip(new, r))
        r = new
        if delta < tol:
            break
    return {v: r[idx[v]] for v in nodes}


def _spark_pr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks, rounds = pagerank(df, **kw)
    return {r.node: r.rank for r in ranks.collect()}, rounds


def test_two_node_cycle_is_uniform(spark):
    got, _ = _spark_pr(spark, [(1, 2), (2, 1)])
    assert got[1] == pytest.approx(0.5, abs=1e-9)
    assert got[2] == pytest.approx(0.5, abs=1e-9)


def test_co_partitioned_rounds_match_broadcast_rounds(spark):
    """r11: the round-mode gate (broadcastable_rounds_ctx) normally
    keeps test-sized graphs on the AQE/broadcast path, so the
    co-partitioned (adaptive-off, captured-layout) path would ship
    untested. Force it with autoBroadcastJoinThreshold=-1 and pin
    value-identity against the default path, plus conf restoration."""
    edges = [(1, 2), (2, 3), (4, 2), (4, 1), (1, 3), (5, 99)]
    base, _ = _spark_pr(spark, edges, fixed_rounds=12)
    key = "spark.sql.autoBroadcastJoinThreshold"
    old_thr = spark.conf.get(key)
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set(key, "-1")
    try:
        forced, rounds = _spark_pr(spark, edges, fixed_rounds=12)
    finally:
        spark.conf.set(key, old_thr)
    assert rounds == 12
    assert set(forced) == set(base)
    for v in base:
        assert forced[v] == pytest.approx(base[v], abs=1e-12)
    # adaptive_off restored the session conf on exit
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before


def test_matches_local_reference_with_dangling(spark):
    # chain + sink: 3 is dangling; 4 feeds the chain from outside
    edges = [(1, 2), (2, 3), (4, 2), (4, 1), (1, 3)]
    got, _ = _spark_pr(spark, edges, tol=1e-10)
    want = _local_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-7)


def test_mass_conserved_fixed_rounds(spark):
    edges = [(i, (i * 3) % 17) for i in range(17)] + [(5, 99)]  # 99 dangling
    got, rounds = _spark_pr(spark, edges, fixed_rounds=25)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert rounds == 25
    # fixed-rounds ranks agree with the local reference run the same way
    want = _local_pagerank(edges, tol=0.0, max_iter=25)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_checkpoint_cadence_is_value_invariant(spark):
    """The fixed-rounds barrier batching (r10) only decides WHERE
    lineage is cut — every cadence runs the identical per-round
    arithmetic, so ranks agree across windows to shuffle-order ulp."""
    edges = [(i, (i * 3) % 17) for i in range(17)] + [(5, 99)]
    base, _ = _spark_pr(spark, edges, fixed_rounds=7, checkpoint_every=1)
    for window in (2, 3, 7, 100):  # incl. window > rounds (last-round ck)
        got, rounds = _spark_pr(
            spark, edges, fixed_rounds=7, checkpoint_every=window
        )
        assert rounds == 7
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        for v in base:
            assert got[v] == pytest.approx(base[v], abs=1e-12), (window, v)


def test_guards_checkpoint_every(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(df, checkpoint_every=0)


def test_duplicate_edges_collapse(spark):
    a, _ = _spark_pr(spark, [(1, 2), (1, 2), (2, 1)])
    b, _ = _spark_pr(spark, [(1, 2), (2, 1)])
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_nonconvergence_raises(spark):
    # asymmetric graph: round-1 delta is far from 0, so max_iter=1
    # cannot reach tol (the symmetric 2-cycle would converge in one
    # round exactly — its uniform start IS the fixpoint)
    df = spark.createDataFrame([(1, 2), (2, 1), (1, 3)], "src long, dst long")
    with pytest.raises(RuntimeError, match="no convergence"):
        pagerank(df, tol=1e-12, max_iter=1)


def test_guards(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="tol"):
        pagerank(df, tol=0)


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src long, dst long")
    ranks, rounds = pagerank(df)
    assert ranks.count() == 0 and rounds == 0


def _tri(spark, edges):
    from spotify_app_etl_spark.operators.graph import triangles

    df = spark.createDataFrame(edges, "src long, dst long")
    return {(r.n1, r.n2, r.n3) for r in triangles(df).collect()}


def test_triangles_k4(spark):
    import itertools

    k4 = list(itertools.combinations(range(4), 2))
    assert _tri(spark, k4) == set(itertools.combinations(range(4), 3))


def test_triangles_square_has_none(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == set()


def test_triangles_duplicates_and_reversals_collapse(spark):
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(2, 1), (3, 2), (1, 2), (5, 5)]
    assert _tri(spark, noisy) == _tri(spark, base) == {(1, 2, 3)}


def test_triangles_match_naive_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(11)
    nodes = list(range(30))
    edges = [(u, v) for u, v in itertools.combinations(nodes, 2) if rng.random() < 0.2]
    eset = set(edges)
    naive = {
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    }
    assert _tri(spark, edges) == naive
