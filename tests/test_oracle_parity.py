"""Every registered query with an oracle must hash-match DuckDB.

This mirrors the driver's t2 correctness gate (sf0.01) at sf0.001 for
speed; run with SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 to use the
exact driver scale.
"""

from __future__ import annotations

import os

import pytest

from spotify_app_etl_spark.registry import load_all
from tests.oracle import compare

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

_QUERIES = sorted(load_all())


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(spark, name):
    res = compare(spark, name, SF)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows >= 0
