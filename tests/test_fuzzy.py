"""Blocked fuzzy matching (operators/fuzzy.py): deletion-neighborhood
contents, blocking completeness vs brute force (d=1 and d=2), entity
closure, and guards. The registered queries' completeness at driver
scale is proven by their brute-force DuckDB oracles; these tests pin
the same property on adversarial strings the customer table doesn't
have (repeats, length deltas, empty strings)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from spotify_app_etl_spark.operators import fuzzy as FZ


def _variants(spark, s: str, max_ops: int = 1) -> set[str]:
    row = spark.range(1).select(
        FZ.deletion_variants(F.lit(s), max_ops=max_ops).alias("v")
    ).collect()[0]
    return set(row.v)


def test_deletion_variants_d1(spark):
    assert _variants(spark, "abc") == {"abc", "bc", "ac", "ab"}
    # repeated chars collapse (array_distinct)
    assert _variants(spark, "aab") == {"aab", "ab", "aa"}
    assert _variants(spark, "a") == {"a", ""}
    assert _variants(spark, "") == {""}


def test_deletion_variants_d2(spark):
    got = _variants(spark, "abcd", max_ops=2)
    want = {"abcd"}
    for i in range(4):
        s1 = "abcd"[:i] + "abcd"[i + 1 :]
        want.add(s1)
        for j in range(3):
            want.add(s1[:j] + s1[j + 1 :])
    assert got == want


def _brute(names: list[tuple[int, str]], d: int) -> set[tuple]:
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    return {
        (ia, ib, lev(na, nb))
        for (ia, na), (ib, nb) in itertools.combinations(names, 2)
        if lev(na, nb) <= d
    }


#: Adversarial shapes: repeats, shared prefixes, length ±1/±2, empty.
_NAMES = [
    (0, "alpha"), (1, "alpho"), (2, "alpha1"), (3, "alph"), (4, "aalpha"),
    (5, "beta"), (6, "betta"), (7, "bet"), (8, "abeta"), (9, ""),
    (10, "x"), (11, "xx"), (12, "gamma"), (13, "gamm"), (14, "gama"),
    (15, "alpha"),
]


@pytest.mark.parametrize("d", [1, 2])
def test_blocking_complete_vs_brute_force(spark, d):
    df = spark.createDataFrame(_NAMES, "id long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in FZ.fuzzy_pairs(df, "id", "name", max_dist=d).collect()
    }
    assert got == _brute(_NAMES, d)


def test_entity_clusters_transitive(spark):
    # a-b and b-c match pairwise; a-c does not — closure puts all
    # three in one entity anyway (that is the point of the CC pass)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    got = {(r.node, r.component, r.cluster_size)
           for r in FZ.entity_clusters(pairs).collect()}
    assert got == {(1, 1, 3), (2, 1, 3), (3, 1, 3), (7, 7, 2), (8, 7, 2)}


def test_max_ops_guard(spark):
    with pytest.raises(ValueError, match="max_ops"):
        FZ.deletion_variants(F.lit("x"), max_ops=3)
