"""Join operators Spark lacks as one-liners: as-of join.

The reference has no joins at all (its only join-like construct is the
playlist_id lineage stamp, spotify-etl.py:105 — operator A13); these
cover the SURVEY.md §2 Part B "range / as-of" row.

As-of join = for each left row, the single most recent right row with
``right.ts <= left.ts`` within the same key group. Implemented as a
union + ordered window (``last(..., ignorenulls=True)``) — ONE shuffle
on (key), no UDF, no per-row lookup:

    tag left/right → unionByName → window partitionBy(key)
    orderBy(ts, is_left) carrying the last right ROW (one struct, so a
    matched row's NULL payload stays NULL) → keep left rows.

This beats the pandas ``merge_asof`` route (applyInPandas) at scale:
the window is whole-stage-codegen'd JVM code and skew-handling is
AQE's problem, not Python's. Right rows sort before left rows at equal
ts, so a right row exactly at left.ts matches (<= semantics, same as
DuckDB ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: nearest right row per ``key`` — the latest with
    ``right.ts <= left.ts`` (``direction="backward"``, default) or the
    earliest with ``right.ts >= left.ts`` (``direction="forward"``).
    Left rows with no match keep NULLs.

    Forward is the same one-shuffle window plan with the time axis
    reversed (orderBy DESC) — not a second algorithm.

    ``right_cols`` — right payload columns to carry (``None`` = all
    non-key/ts; an explicit ``[]`` carries none). Right duplicates on
    (key, ts) must be pre-aggregated by the caller for deterministic
    results.

    NULL timestamps follow the SQL comparison rules DuckDB's ASOF JOIN
    applies: a right row with NULL ts can never satisfy <=/>= and is
    dropped from the merge; a left row with NULL ts matches nothing
    (NULL payload) — enforced by sorting such left rows BEFORE every
    right row (nulls-first on both time axes), where the carry is still
    empty.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, ts)]
    if not right_cols:
        return left

    l_tag = left.withColumn("__is_left", F.lit(1))
    # The payload is carried as ONE struct, not per-column: the struct
    # is non-null whenever a right ROW exists, so last(ignorenulls)
    # tracks "most recent right row" — a matched row whose payload
    # value is NULL stays NULL (per-column carry would reach past it to
    # a STALE earlier row, and with several right_cols could even tear
    # one output row's columns from DIFFERENT right rows; DuckDB's
    # ASOF JOIN returns the matched row's values verbatim).
    r_tag = (
        right.filter(F.col(ts).isNotNull())
        .select(
            key,
            ts,
            F.struct(
                *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
            ).alias("__r"),
        )
        .withColumn("__is_left", F.lit(0))
    )

    carried = [f"{c}{suffix}" for c in right_cols]
    # allowMissingColumns fills each side's absent columns with
    # correctly-typed nulls — left rows get a NULL __r struct, right
    # rows NULL left-payload columns.
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows first at equal ts → "<=" (resp. ">=") match semantics;
    # forward = identical plan over the reversed time axis. nulls_first
    # on BOTH axes so NULL-ts left rows precede every right row and
    # carry nothing (desc's default NULLS LAST would instead hand them
    # the final carried payload — a false match).
    ts_order = (
        F.col(ts).asc_nulls_first()
        if direction == "backward"
        else F.col(ts).desc_nulls_first()
    )
    w = (
        W.partitionBy(key)
        .orderBy(ts_order, F.col("__is_left"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__f")
    )
    return (
        filled.filter(F.col("__is_left") == 1)
        .select(
            *left.columns, *[F.col(f"__f.{c}").alias(c) for c in carried]
        )
    )
