from __future__ import annotations

import __spark_entry__ as se


def test_entry_returns_rows(spark):
    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_queries_and_oracles_consistent():
    qs = se.queries()
    oracles = se.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


def test_priority_window_is_exactly_the_driver_budget():
    """The driver checks the FIRST 50 queries in load_all() order;
    _PRIORITY is the rotation lever. Guard the invariants a typo
    would silently break: every name registered (an unknown name is
    dropped by load_all and the window shrinks without warning), no
    duplicates (a repeat shadows the name that should have rotated
    in), and exactly the 50-row driver budget."""
    from spotify_app_etl_spark.registry import _PRIORITY, load_all

    registry = load_all()
    unknown = [n for n in _PRIORITY if n not in registry]
    assert not unknown, f"_PRIORITY names not registered: {unknown}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate _PRIORITY names"
    assert len(_PRIORITY) == 50, (
        f"_PRIORITY has {len(_PRIORITY)} names — the driver re-proves "
        "exactly 50 per round; an undersized window wastes budget and "
        "an oversized one silently defers the tail"
    )
