"""Unit tests for the as-of join operator (NULL-ts and edge semantics).

The happy paths are driver-checked against DuckDB ASOF JOIN oracles
(q_join_asof / q_join_asof_forward); these cover the cases the testdata
never exercises: NULL timestamps on either side and explicit empty
payload lists.
"""

from __future__ import annotations

from spotify_app_etl_spark.operators.joins import asof_join


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_null_right_ts_never_matches(spark):
    """A right row with NULL ts satisfies neither <= nor >= — it must
    not be carried into any left row (previously NULLS FIRST ordering
    handed its payload to every backward match)."""
    left = spark.createDataFrame([(1, 10), (1, 20)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, None, 99), (1, 15, 7)], "k int, ts int, p int"
    )
    got = _rows(asof_join(left, right, "k", "ts", direction="backward"))
    assert got == [(1, 10, None), (1, 20, 7)]
    got_f = _rows(asof_join(left, right, "k", "ts", direction="forward"))
    assert got_f == [(1, 10, 7), (1, 20, None)]


def test_null_left_ts_matches_nothing(spark):
    """A left row with NULL ts has no defined position on the time
    axis: payload must be NULL in BOTH directions (desc's default
    NULLS LAST used to hand forward-direction nulls the last carry)."""
    left = spark.createDataFrame([(1, None), (1, 20)], "k int, ts int")
    right = spark.createDataFrame([(1, 5, 7)], "k int, ts int, p int")
    for direction in ("backward", "forward"):
        got = {r.ts: r.p_asof for r in asof_join(
            left, right, "k", "ts", direction=direction
        ).collect()}
        assert got[None] is None, direction
    assert asof_join(left, right, "k", "ts").filter("ts = 20").first().p_asof == 7


def test_explicit_empty_right_cols_carries_nothing(spark):
    """right_cols=[] must mean 'no payload', not fall back to 'all'."""
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 5, 7)], "k int, ts int, p int")
    out = asof_join(left, right, "k", "ts", right_cols=[])
    assert out.columns == ["k", "ts"]


def test_equal_ts_is_a_match(spark):
    """right.ts == left.ts matches under backward <= (DuckDB ASOF)."""
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame([(1, 10, 7)], "k int, ts int, p int")
    assert asof_join(left, right, "k", "ts").first().p_asof == 7


def test_asof_join_null_payload_not_stale_and_rows_never_tear(spark):
    """The matched right row's values must be returned VERBATIM (DuckDB
    ASOF JOIN parity): a NULL payload in the matched row stays NULL —
    per-column last(ignorenulls) would reach past it to a stale earlier
    row — and all carried columns must come from the SAME right row."""
    from spotify_app_etl_spark.operators.joins import asof_join

    right = spark.createDataFrame(
        [("k", 1, 5.0, "a"), ("k", 2, None, "b")],
        "key string, ts int, p double, q string",
    )
    left = spark.createDataFrame([("k", 3)], "key string, ts int")
    row = asof_join(left, right, "key", "ts", ["p", "q"]).collect()[0]
    # matched row is ts=2: p is NULL there (not the stale 5.0 from
    # ts=1), and q must be 'b' from the SAME row — not torn across rows
    assert row["p_asof"] is None, row
    assert row["q_asof"] == "b", row
