"""Skew mitigation: salted aggregation and salted join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but two cases still need
explicit salting at 100 TB:

- **Skewed aggregation**: one hot group key (the classic: empty/
  boilerplate documents hashing to one dedup bucket) funnels a large
  fraction of rows into one reducer. AQE cannot split a hash-agg group.
  :func:`salted_agg` does partial aggregation over (key, salt) — the
  hot key's rows spread over ``salt_buckets`` reducers — then a final
  cheap aggregation over the per-salt partials.
- **Skewed broadcast-ineligible join**: when the probe side's hot key
  exceeds a task and the build side is too big to broadcast,
  :func:`salted_join` explodes the build side ``salt_buckets``x and
  salts the probe side randomly-but-deterministically, so the hot key's
  rows land in different tasks.

Both are pure DataFrame rewrites — no RDDs, no custom partitioner —
and compose with whatever else the plan does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


def _salt(cols: list[str], buckets: int) -> Column:
    """Deterministic pseudo-random salt in [0, buckets): hash of the
    row's stable columns — spreads a hot key's rows evenly without
    requiring a random() (keeps retries/oracle runs reproducible).
    A pure column expression: it binds to whatever frame it is
    selected from, so no DataFrame parameter."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[DataFrame], list[Column]],
    salt_cols: list[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``partial_aggs`` run per (group, salt); ``final_aggs(partials)``
    combines the per-salt partials per group (e.g. partial ``count`` →
    final ``sum``). ``salt_cols`` must be stable row attributes (ids).
    """
    salted = df.withColumn("__salt", _salt(salt_cols, salt_buckets))
    partial = salted.groupBy(*group_cols, "__salt").agg(*partial_aggs)
    # __salt cannot appear in the output: the final groupBy's schema is
    # group_cols + the final_aggs aliases (final_aggs must simply not
    # re-project it).
    return partial.groupBy(*group_cols).agg(*final_aggs(partial))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_cols: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side
    replicated ``salt_buckets``x (explode of a literal range). Build
    replication costs buckets x |build| rows — use only when build is
    small-ish but above the broadcast threshold and the probe key is
    hot.

    Only probe-preserving join types are expressible under build-side
    replication: for ``right``/``full`` (build-preserving) an unmatched
    build row would surface once per salt bucket (``salt_buckets``
    duplicate null-extended rows), so those types raise."""
    # 'cross' is NOT expressible either: the implementation joins on
    # [key, __salt], so a requested cross product would silently
    # execute as an inner equi-join (verified: 2x2 inputs -> 1 row
    # instead of 4).
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join cannot express how={how!r}: build-side replication "
            "would emit each unmatched build row once per salt bucket (and a "
            "cross product has no join key to salt); use a probe-preserving "
            "equi type (inner/left/left_semi/left_anti)"
        )
    p = probe.withColumn("__salt", _salt(salt_cols, salt_buckets))
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = p.join(b, [key, "__salt"], how)
    return out.drop("__salt")
