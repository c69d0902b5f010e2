"""Change-data-capture application: MERGE-style upsert and SCD2 history.

The reference's load stage is a blind full-replace (`to_sql(...,
if_exists='replace')`, /root/reference/spotify-etl.py:209-215). At
100 TB a full rewrite per run is untenable — production pipelines apply
a change feed incrementally. These operators re-express that load as:

- :func:`apply_changes` — SCD type 1 MERGE: latest change per key wins,
  deletes drop the row, inserts/updates take the change's values.
- :func:`scd2_history` — SCD type 2: a keyed change log becomes
  effective-dated versions (effective_from/effective_to/is_current),
  with consecutive duplicate values compacted away.

Scale notes (100 TB):
- apply_changes is one full-outer shuffle join on the key. The change
  feed is normally ≪ snapshot, so AQE broadcasts it when it fits; we
  never force a broadcast of either side.
- compacting the feed to latest-per-key is a window (or max_by) over
  the same key partitioning — Spark reuses the shuffle exchange.
- scd2_history is a single window shuffle on the entity key; state per
  key is bounded by that key's change count, never the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def compact_latest(
    changes: DataFrame, keys: Sequence[str], seq_cols: Sequence[str]
) -> DataFrame:
    """Keep only the last change per key, ordered by ``seq_cols``.

    A CDC feed replays multiple operations per key; MERGE semantics
    apply only the final one. One window shuffle on ``keys``; the
    ordering must be total per key (include a unique tiebreaker).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """SCD1 MERGE: apply a (key, op, values) change feed to a snapshot.

    ``changes`` must carry exactly the snapshot's columns plus
    ``op_col`` and be pre-compacted to one row per key (use
    :func:`compact_latest`). Semantics per key:

    - no change row              → snapshot row kept
    - op == delete_op            → row dropped (even if absent: no-op)
    - any other op (I/U/NULL/…)  → change's values win (insert-or-update)

    One shuffle: full-outer equi-join on ``keys`` (key columns are
    coalesced by the join itself). Row existence is tracked with an
    explicit marker column, NOT ``op IS NOT NULL``: a feed row whose op
    value happens to be NULL is still a present row (treated as an
    upsert, the "any other op" rule), whereas the op-null test would
    silently drop its update — or, for a key absent from the snapshot,
    emit a phantom all-NULL row.
    """
    keys = list(keys)
    data_cols = [c for c in snapshot.columns if c not in keys]
    missing = [c for c in data_cols + [op_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changes feed missing columns: {missing}")

    s = snapshot.alias("s")
    c = changes.withColumn("__present", F.lit(True)).alias("c")
    joined = s.join(c, on=keys, how="full_outer")
    op = F.col(f"c.{op_col}")
    has_change = F.col("c.__present").eqNullSafe(F.lit(True))
    is_delete = has_change & op.eqNullSafe(F.lit(delete_op))

    def pick(col: str) -> Column:
        return F.when(has_change, F.col(f"c.{col}")).otherwise(F.col(f"s.{col}"))

    return joined.filter(~is_delete).select(
        *keys, *[pick(col).alias(col) for col in data_cols]
    )


def scd2_history(
    changes: DataFrame,
    keys: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build effective-dated SCD2 history from a keyed change log.

    Rows are ordered per key by ``(ts_col, *tiebreak_cols)`` (which must
    be a total order for determinism); consecutive rows whose
    ``attr_cols`` are unchanged are compacted into one version. Output
    adds ``effective_from``, ``effective_to`` (null = open), ``version``
    (1-based per key) and ``is_current``.

    Single window shuffle on ``keys``; everything else is narrow.
    """
    keys, attr_cols = list(keys), list(attr_cols)
    order = [ts_col, *tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        # null-safe "differs from previous row" — first row lags NULL
        # and eqNullSafe(False-on-null) marks it changed via the rn==1
        # clause below, so plain inequality with null→true is enough
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))

    versions = (
        changes.withColumn("__rn", F.row_number().over(w))
        .withColumn("__chg", (F.col("__rn") == 1) | changed)
        .filter(F.col("__chg"))
        .select(*keys, *attr_cols, F.col(ts_col).alias("effective_from"), "__rn")
    )
    # Versions can share effective_from (two changes at one timestamp);
    # ordering by the original sequence number keeps the version chain
    # deterministic where (effective_from, attrs) alone would tie.
    w2 = Window.partitionBy(*keys).orderBy("effective_from", "__rn")
    return versions.select(
        *keys,
        *attr_cols,
        "effective_from",
        F.lead("effective_from").over(w2).alias("effective_to"),
        F.row_number().over(w2).cast("int").alias("version"),
        F.lead("effective_from").over(w2).isNull().alias("is_current"),
    )


def merge_partial_aggregates(
    partials: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Re-aggregate algebraic partials to a coarser grouping.

    The incremental-rollup primitive: partial aggregates computed per
    fine bucket (day, shard, micro-batch) merge exactly into coarser
    buckets — sums add, counts add, mins min, maxes max. Avg is derived
    downstream as merged_sum / merged_count. This is what lets a
    100 TB rollup recompute only the changed day and fold it into the
    monthly cube, instead of rescanning the corpus.
    """
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.sum(c).alias(c) for c in count_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    if not aggs:
        raise ValueError("no aggregate columns given")
    return partials.groupBy(*group_cols).agg(*aggs)
