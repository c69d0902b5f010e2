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
