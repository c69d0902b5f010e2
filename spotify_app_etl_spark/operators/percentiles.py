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
   (map-side combinable, O(groups) rows, broadcast back),
2. one ``row_number`` window over (group, value) — the only real
   shuffle+sort, shared by every requested quantile,
3. filter to the ≤ 2·|quantiles| picked ranks per group and fold them
   to columns with conditional aggregates.

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


def _picks(
    df: DataFrame,
    key_col: str,
    val_col: str,
    targets: DataFrame,
    rank_cols: list[str],
) -> DataFrame:
    """One row per group holding the value at each requested rank.

    ``targets`` carries one row per group with integer rank columns
    ``rank_cols`` (plus anything else to max-carry through); it is
    O(groups) rows by construction, hence broadcast.
    """
    w = Window.partitionBy(key_col).orderBy(val_col)
    ranked = df.select(key_col, val_col).withColumn(
        "__rn", F.row_number().over(w)
    )
    keep = None
    for rc in rank_cols:
        m = F.col("__rn") == F.col(rc)
        keep = m if keep is None else (keep | m)
    carried = [c for c in targets.columns if c != key_col]
    return (
        ranked.join(F.broadcast(targets), key_col)
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
    optionally the group count as ``count_col``. NULL values are
    ignored, matching the builtins (a group of only NULLs drops out
    entirely, as it does for the aggregates).
    """
    df = df.filter(F.col(val_col).isNotNull())
    targets = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    rank_cols = []
    for name, q in quantiles.items():
        rc = f"__r_{name}"
        targets = targets.withColumn(
            rc, F.greatest(F.ceil(F.lit(q) * F.col("__n")), F.lit(1))
        )
        rank_cols.append(rc)
    picked = _picks(df, key_col, val_col, targets, rank_cols)
    cols = [F.col(key_col)] + [
        F.col(f"__v___r_{name}").alias(name) for name in quantiles
    ]
    if count_col is not None:
        cols.append(F.col("__n").alias(count_col))
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
    NULL values are ignored, matching the builtin: without the filter
    they would count into ``n`` and sort first, shifting every pick.
    """
    df = df.filter(F.col(val_col).isNotNull())
    targets = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n"))
    rank_cols = []
    for name, q in quantiles.items():
        pos = F.lit(q) * (F.col("__n") - 1)
        targets = (
            targets.withColumn(f"__pos_{name}", pos)
            .withColumn(f"__lo_{name}", F.floor(pos) + 1)
            .withColumn(f"__hi_{name}", F.ceil(pos) + 1)
        )
        rank_cols += [f"__lo_{name}", f"__hi_{name}"]
    picked = _picks(df, key_col, val_col, targets, rank_cols)
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
        cols.append(F.col("__n").alias(count_col))
    return picked.select(*cols)
