"""Count-min sketch: a bounded, mergeable frequency summary.

Cormode & Muthukrishnan 2005: a ``depth x width`` counter matrix where
every key increments one counter per row (bucket = hash_d(key) % width)
and a key's estimate is the MINIMUM of its ``depth`` counters. Errors
are ONE-SIDED (estimate >= true count, always — collisions only add)
and bounded (estimate <= true + eps*N with high probability, eps ~
e/width, N = total increments).

Why this shape on Spark: the sketch build is a plain ``groupBy`` whose
KEY SPACE is capped at depth*width, so map-side partial aggregation
compresses every partition to at most depth*width rows before the
shuffle — shuffle volume is O(partitions * depth * width) REGARDLESS
of corpus size or key cardinality, where an exact frequency table
shuffles O(distinct keys). The sketch itself is a tiny DataFrame:
persist it with any writer, merge sketches of corpus deltas with
:func:`cms_merge` (counter-wise sum — the standard CMS merge), probe
it later without rescanning the corpus. That build-once/probe-many,
bounded-state contract is what the exact ``groupBy`` can't offer at
100 TB; for a one-shot exact top-k on a small vocab, use the exact
aggregate (``ns_text_vocab_topk``) instead.

Hashing is ``xxhash64(key, depth_row)`` — deterministic across runs
and engines' sessions, so estimates (and the registered query's
riders) are stable, reproducible values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Sketch schema: one row per non-zero counter.
_SKETCH_COLS = ("d", "bucket", "cnt")


def _bucket(key: Column, d: Column, width: int) -> Column:
    """Row-``d`` bucket for ``key``: xxhash64 seeded by the row index.
    pmod (not %) so negative hashes land in [0, width)."""
    return F.pmod(F.xxhash64(key, d), F.lit(width)).cast("int")


def _check_params(depth: int, width: int) -> None:
    if depth <= 0 or width <= 0:
        raise ValueError(f"depth and width must be positive, got {depth}x{width}")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a CMS over ``df[key_col]`` (one increment per row, or
    ``weight_col`` per row): returns the sketch as a ``(d, bucket,
    cnt)`` DataFrame with at most depth*width rows. NULL keys are
    skipped (they are not a frequency), NULL weights count 0.

    The explode-by-depth happens BEFORE the aggregate on purpose: the
    grouped key space (d, bucket) is capped at depth*width, so Spark's
    partial hash aggregation collapses each partition to sketch size
    map-side — the per-partition sketch + tree-merge pattern expressed
    as one declarative groupBy.
    """
    _check_params(depth, width)
    w = F.lit(1).cast("long") if weight_col is None else F.coalesce(
        F.col(weight_col).cast("long"), F.lit(0)
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("__k"), w.alias("__w"))
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
            "__k",
            "__w",
        )
        .select("d", _bucket(F.col("__k"), F.col("d"), width).alias("bucket"), "__w")
        .groupBy("d", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise sum of same-shape sketches — the CMS merge. Merging
    sketches of corpus deltas equals the sketch of the union (asserted
    in tests), which is what makes the summary incrementally
    maintainable without re-scanning history."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: adds an
    ``est`` column = min over the ``depth`` counters. Keys absent from
    the sketched corpus get the collision floor (>= 0), never NULL —
    CMS has no membership test, only an upper-bounded count.

    ``depth``/``width`` must match the build (they are not stored in
    the sketch rows; at mismatch the bucket math silently probes wrong
    counters — pass them from the same config that built it). The
    sketch side is depth*width rows at most, so the join broadcasts;
    the keys side streams — probing N keys is one broadcast-join pass.
    """
    _check_params(depth, width)
    probes = keys.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__d"),
    ).select("*", _bucket(F.col(key_col), F.col("__d"), width).alias("__bucket"))
    joined = probes.join(
        F.broadcast(sketch.withColumnRenamed("cnt", "__cnt")),
        (F.col("__d") == F.col("d")) & (F.col("__bucket") == F.col("bucket")),
        "left",
    )
    return (
        joined.groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("__cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Persisted sketch: generation-committed state for build-once/probe-many
# and streaming maintenance (same meta protocol as the ANN indexes —
# operators/similarity.py signlsh_index_write: tables live under
# {path}/gen=N/ and the 1-row meta overwrite is the ONLY commit point,
# so a crashed write leaves readers at the previous consistent
# generation).
# ---------------------------------------------------------------------------


def cms_state_read(spark, path: str):
    """The committed sketch at ``path`` as ``(sketch_df, meta_row)``,
    or ``(None, None)`` if nothing is committed yet."""
    from spotify_app_etl_spark.operators.similarity import _read_index_meta

    meta = _read_index_meta(spark, path)
    if meta is None:
        return None, None
    return spark.read.parquet(f"{path}/gen={meta['gen']}"), meta


def cms_ingest_batch(
    batch_df: DataFrame,
    path: str,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
    batch_id: int | None = None,
) -> None:
    """Merge one batch into the persisted sketch (counter-wise sum into
    a NEW generation; the meta overwrite is the commit point).

    Retry-idempotent when ``batch_id`` is supplied (foreachBatch
    semantics): the committed meta records the last merged batch, and a
    re-delivered batch is skipped instead of double-counted. A crash
    between the generation write and the meta flip leaves the committed
    state untouched, so the retry recomputes the SAME merge from the
    same previous generation — convergent, never cumulative.

    depth/width are sketch identity: a mismatch against the stored meta
    raises (bucket math from a different geometry would merge garbage).
    """
    from spotify_app_etl_spark.operators.similarity import _meta_row

    _check_params(depth, width)
    spark = batch_df.sparkSession
    prev, meta = cms_state_read(spark, path)
    if meta is not None:
        if meta["depth"] != depth or meta["width"] != width:
            raise ValueError(
                f"sketch at {path} is {meta['depth']}x{meta['width']}; "
                f"refusing to merge a {depth}x{width} batch into it"
            )
        if batch_id is not None and meta.asDict().get("last_batch") == batch_id:
            return  # re-delivered batch: already committed, skip
        gen = meta["gen"] + 1
    else:
        gen = 1
    sketch = cms_build(batch_df, key_col, depth=depth, width=width, weight_col=weight_col)
    merged = sketch if prev is None else cms_merge(prev, sketch)
    merged.write.mode("overwrite").parquet(f"{path}/gen={gen}")
    _meta_row(
        spark,
        gen=gen,
        depth=depth,
        width=width,
        last_batch=-1 if batch_id is None else batch_id,
    ).write.mode("overwrite").parquet(f"{path}/meta")
