"""Spill-safe exact percentiles: sort + nearest-rank / interpolated picks.

Spark's exact-percentile aggregates (``percentile``, ``percentile_disc``)
collect every group's values into an in-memory buffer per quantile —
fine for small groups, an OOM for the billion-row groups a 100 TB
corpus produces. The sort-based formulation here computes the SAME
values (bit-compatible: the interpolation reproduces Spark's/DuckDB's
``(hi-pos)*v_lo + (pos-lo)*v_hi`` double evaluation order) from a
group-partitioned window sort, which streams through Spark's
UnsafeExternalSorter and spills to disk instead of buffering:

1. one count-aggregate per group → the target rank(s) per quantile
   (map-side combinable, O(groups) rows),
2. one ``row_number`` window over (group, value) — the only real
   shuffle+sort of the data, shared by every requested quantile,
3. a group-preserving join of the ranked rows against the O(groups)
   target table, filtered to the ≤ 2·|quantiles| picked ranks per
   group and folded to columns with conditional aggregates. The join
   adds NO data shuffle: the window's output is already hash-
   partitioned AND sorted by the group key, so only the tiny target
   side moves.

NULL semantics match the builtins exactly: NULL values are ignored by
the rank arithmetic, and a group whose values are ALL NULL is kept
with NULL percentile outputs (``groupBy().agg(percentile(...))`` emits
every group — only the aggregate value is NULL). ``count_col`` reports
``count(*)`` — NULLs included — like a ``COUNT(*)`` alongside the
builtin aggregates would.

Also ~2x faster than the buffered builtins at sf0.1 (measured: disc
2.9s → 1.2s, cont 0.76s → 0.49s) because the sort parallelizes across
groups while the buffer concentrates allocation on the reducers.

Known bound: each group still sorts within one task chain (the window
partition). That survives arbitrarily large groups via spill; if a
single group's sort TIME ever dominates, the distributed-rank operator
(``operators/rank.py``) is the fan-out escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _group_counts(df: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """Per-group counts from the UNFILTERED input: ``__n`` = non-NULL
    values (drives the rank arithmetic, matching the builtins' NULL-
    ignoring semantics) and ``__n_all`` = ``count(*)``. Keeping every
    group here — including all-NULL ones — is what lets the callers
    emit those groups with NULL percentiles instead of dropping them,
    matching ``groupBy().agg(percentile(...))``."""
    return df.groupBy(key_col).agg(
        F.count(F.col(val_col)).alias("__n"),
        F.count(F.lit(1)).alias("__n_all"),
    )


def _picks(
    df: DataFrame,
    key_col: str,
    val_col: str,
    targets: DataFrame,
    rank_cols: list[str],
) -> DataFrame:
    """One row per TARGET group holding the value at each requested
    rank, plus every non-key target column carried through.

    ``df`` must already be filtered to non-NULL values; ``targets`` has
    one row per group (O(groups) by construction) with integer rank
    columns ``rank_cols``. The right-outer join preserves groups with
    zero non-NULL rows — their picks fold to NULL, exactly how the
    builtin aggregates emit all-NULL groups. Plan shape: the ranked
    side leaves the window hash-partitioned and sorted by ``key_col``,
    so the sort-merge join re-shuffles only the target side; a second
    pass over the data (e.g. re-aggregating the group list for a final
    outer join) never happens. The merge hint is load-bearing: for a
    right-outer join the ONLY broadcastable side is the ranked DATA
    side (BuildLeft), and Catalyst happily broadcasts it when the size
    estimate looks small — a plan that detonates at real scale if the
    estimate is wrong. SMJ here costs nothing extra because the window
    already produced the partitioning and sort order the merge needs.
    """
    w = Window.partitionBy(key_col).orderBy(val_col)
    ranked = df.select(key_col, val_col).withColumn(
        "__rn", F.row_number().over(w)
    )
    keep = F.col("__rn").isNull()  # unmatched target rows (all-NULL groups)
    for rc in rank_cols:
        keep = keep | (F.col("__rn") == F.col(rc))
    carried = [c for c in targets.columns if c != key_col]
    return (
        ranked.hint("merge").join(targets, key_col, "right_outer")
        .filter(keep)
        .groupBy(key_col)
        .agg(
            *[
                F.max(F.when(F.col("__rn") == F.col(rc), F.col(val_col))).alias(
                    f"__v_{rc}"
                )
                for rc in rank_cols
            ],
            *[F.max(c).alias(c) for c in carried],
        )
    )


def percentile_disc_by(
    df: DataFrame,
    key_col: str,
    val_col: str,
    quantiles: dict[str, float],
    count_col: str | None = None,
) -> DataFrame:
    """Per-group discrete (nearest-rank) percentiles.

    ``percentile_disc(q)`` is the smallest value whose cume_dist ≥ q —
    the element at sorted position ``ceil(q*n)`` (ties collapse to the
    same value whatever the row_number order among them). Returns one
    row per group: ``key_col``, one column per ``quantiles`` name, and
    optionally the ``count(*)`` group size as ``count_col``. NULL
    values are ignored in the rank arithmetic, matching the builtins —
    and, also matching them, a group of only NULLs is KEPT with NULL
    percentile values (``groupBy().agg(percentile_disc(...))`` emits
    the group; only the values are NULL).
    """
    targets = _group_counts(df, key_col, val_col)
    rank_cols = []
    for name, q in quantiles.items():
        rc = f"__r_{name}"
        targets = targets.withColumn(
            rc, F.greatest(F.ceil(F.lit(q) * F.col("__n")), F.lit(1))
        )
        rank_cols.append(rc)
    picked = _picks(
        df.filter(F.col(val_col).isNotNull()), key_col, val_col, targets, rank_cols
    )
    cols = [F.col(key_col)] + [
        F.col(f"__v___r_{name}").alias(name) for name in quantiles
    ]
    if count_col is not None:
        cols.append(F.col("__n_all").alias(count_col))
    return picked.select(*cols)


def percentile_cont_by(
    df: DataFrame,
    key_col: str,
    val_col: str,
    quantiles: dict[str, float],
    count_col: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Per-group continuous (interpolated) percentiles.

    Matches Spark's ``percentile`` builtin and DuckDB's
    ``quantile_cont`` bit-for-bit: 0-based position ``pos = q*(n-1)``,
    neighbours at ranks ``floor(pos)+1`` / ``ceil(pos)+1``, lerp as
    ``(hi-pos)*v_lo + (pos-lo)*v_hi`` (that exact double evaluation
    order — not the algebraically equal ``v_lo + frac*(v_hi-v_lo)``).
    NULL values are ignored in the rank arithmetic, matching the
    builtin: counting them into ``n`` while they sort first would
    shift every pick. All-NULL groups are kept with NULL percentile
    values, again matching the builtin; ``count_col`` reports
    ``count(*)`` (NULLs included), like a ``COUNT(*)`` alongside the
    aggregate would.
    """
    targets = _group_counts(df, key_col, val_col)
    rank_cols = []
    for name, q in quantiles.items():
        pos = F.lit(q) * (F.col("__n") - 1)
        targets = (
            targets.withColumn(f"__pos_{name}", pos)
            .withColumn(f"__lo_{name}", F.floor(pos) + 1)
            .withColumn(f"__hi_{name}", F.ceil(pos) + 1)
        )
        rank_cols += [f"__lo_{name}", f"__hi_{name}"]
    picked = _picks(
        df.filter(F.col(val_col).isNotNull()), key_col, val_col, targets, rank_cols
    )
    cols = [F.col(key_col)]
    for name in quantiles:
        pos = F.col(f"__pos_{name}")
        vlo = F.col(f"__v___lo_{name}")
        vhi = F.col(f"__v___hi_{name}")
        lo0, hi0 = F.floor(pos), F.ceil(pos)
        val = F.when(lo0 == hi0, vlo).otherwise(
            (hi0 - pos) * vlo + (pos - lo0) * vhi
        )
        if round_to is not None:
            val = F.round(val, round_to)
        cols.append(val.alias(name))
    if count_col is not None:
        cols.append(F.col("__n_all").alias(count_col))
    return picked.select(*cols)
