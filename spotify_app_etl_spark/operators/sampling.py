"""Deterministic sampling / splitting for training-data pipelines.

Reference parity: none — the reference (a 317-line ETL script) has no
sampling stage; this is part of the LLM-data-pipeline surface the brief
adds on top.

Design: the keep/drop decision is a pure function of ``(seed, key)`` —
``sha256(seed || '|' || key)`` — compared as a hex-prefix string against
a precomputed threshold. That gives three properties that matter at
100 TB:

* **No shuffle, no state.** The sampler is a single column expression
  inside whole-stage codegen; it composes with any scan and the filter
  is evaluated where the data already lives.
* **Reproducible & resumable.** Re-running a failed job, growing the
  cluster, or re-partitioning the input cannot change which rows are
  kept (unlike ``df.sample``, whose outcome depends on partition
  layout / RNG stream position).
* **Engine-portable.** Both Spark (``sha2``) and DuckDB (``sha256``)
  emit lowercase hex, so lexicographic prefix comparison is identical
  across engines — the DuckDB oracles mirror these plans bit-for-bit.

The first 8 hex chars partition the key space into 16^8 ≈ 4.3e9 equal
slices; a rate ``r`` keeps keys whose slice index is below
``round(r * 16^8)``, so the realized rate is within 2.4e-10 of the
request — exact enough that the same threshold literal serves both the
plan and its SQL oracle (built by :func:`threshold_hex` for both).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

#: Width of the compared hex prefix (8 hex chars = 32 bits).
_PREFIX = 8
_SPACE = 16**_PREFIX


def threshold_hex(rate: float) -> str:
    """Hex threshold such that P[prefix < threshold] == rate (±2^-32)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if int(round(rate * _SPACE)) >= _SPACE:
        # Covers rate == 1.0 AND rates that ROUND to the full space
        # (anything within 2^-33 of 1.0): the unclamped format would be
        # 9 chars ('100000000'), and an 8-char prefix compares against
        # it lexicographically — keeping only prefixes <= '10000000',
        # ~6% of rows, silently. 'g' sorts after every hex digit in
        # both engines → keep-all.
        return "g" * _PREFIX
    return format(int(round(rate * _SPACE)), f"0{_PREFIX}x")


def sample_key(key: str | Column, seed: int) -> Column:
    """The 8-hex-char decision prefix for ``(seed, key)``.

    NULL keys have no identity to sample on, so the hash is built with
    null-PROPAGATING concat (not concat_ws, which silently skips nulls
    and would collapse every null-key row onto the single hash of the
    seed — one giant all-kept-or-all-dropped block): a NULL key yields
    a NULL prefix, three-valued comparison makes the sampler filters
    DROP such rows, and :func:`split_assign` routes them to 'train'.
    For non-null keys the bytes hashed are identical to the previous
    concat_ws form.
    """
    col = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.sha2(F.concat(F.lit(str(seed)), F.lit("|"), col.cast("string")), 256),
        1,
        _PREFIX,
    )


def sql_sample_key(key_sql: str, seed: int) -> str:
    """DuckDB mirror of :func:`sample_key` (lowercase hex on both
    engines; ``||`` is DuckDB's null-propagating concat, matching
    Spark's ``concat``)."""
    return f"substr(sha256('{seed}' || '|' || CAST({key_sql} AS VARCHAR)), 1, {_PREFIX})"


def hash_sample(df: DataFrame, key: str, rate: float, *, seed: int = 42) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed on ``key``."""
    return df.filter(sample_key(key, seed) < F.lit(threshold_hex(rate)))


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates: Mapping[str, float],
    *,
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalancing languages).

    ``rates`` maps stratum value → keep rate; strata not listed fall
    back to ``default_rate``. Still a pure column expression: the
    threshold is a CASE over the stratum column, so no shuffle and no
    per-stratum pass — one scan regardless of how many strata exist.
    """
    thr: Column = F.lit(threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum) == value, F.lit(threshold_hex(rate))).otherwise(thr)
    return df.filter(sample_key(key, seed) < thr)


def split_assign(
    df: DataFrame,
    key: str,
    *,
    eval_frac: float = 0.1,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/eval assignment column (disjoint, exhaustive).

    The same ``(seed, key)`` hash drives the split, so membership is
    stable under re-runs and re-partitioning, and a row can never land
    in both splits — the property that matters when the corpus is
    rebuilt incrementally.
    """
    key_expr = sample_key(key, seed)
    return df.withColumn(
        out_col,
        F.when(key_expr < F.lit(threshold_hex(eval_frac)), F.lit("eval")).otherwise(
            F.lit("train")
        ),
    )


#: 13 hex chars = 52 bits — the largest hex prefix whose integer value
#: is exactly representable in a double on every engine.
_U_PREFIX = 13


def uniform01(key: str | Column, seed: int) -> Column:
    """Deterministic uniform in (0, 1) keyed on ``(seed, key)``.

    The first 13 hex chars (52 bits) of the same sha256 the samplers
    above use, as an exactly-representable double; +0.5 keeps the value
    strictly inside (0, 1) (u = 0 would blow up ln-based keys). Like
    :func:`sample_key`, NULL keys propagate to NULL. Bit-identical in
    DuckDB via :func:`sql_uniform01` (integer hex parse + exact double
    arithmetic — no engine-specific RNG anywhere).
    """
    col = F.col(key) if isinstance(key, str) else key
    h = F.substring(
        F.sha2(F.concat(F.lit(str(seed)), F.lit("|"), col.cast("string")), 256),
        1,
        _U_PREFIX,
    )
    return (F.conv(h, 16, 10).cast("double") + F.lit(0.5)) / F.lit(float(2**52))


def sql_uniform01(key_sql: str, seed: int) -> str:
    """DuckDB mirror of :func:`uniform01` (hex-literal cast to UBIGINT,
    then the same exact double arithmetic)."""
    return (
        f"(CAST(concat('0x', substr(sha256('{seed}' || '|' || "
        f"CAST({key_sql} AS VARCHAR)), 1, {_U_PREFIX})) AS UBIGINT) + 0.5) "
        f"/ power(2, 52)"
    )


def weighted_sample(
    df: DataFrame, key: str, weight_col: str, k: int, *, seed: int = 42
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``k`` rows where row i's
    inclusion probability scales with ``weight_col`` (Efraimidis &
    Spirakis 2006, A-ES): rank by ``ln(u_i) / w_i`` descending — the
    order statistic of ``u^(1/w)`` — and keep the top ``k``.

    Deterministic (the uniform is a pure function of ``(seed, key)``),
    so re-runs, re-partitioning, and cluster growth keep the same
    sample — same contract as :func:`hash_sample`, which remains the
    right tool for UNweighted rate-based sampling. Distributed
    TakeOrdered: ``k`` bounds driver/output size, never a full sort.

    Rows with NULL/zero/negative weights carry no sampling mass and are
    excluded (a zero weight's key would be ln(u)/0 = -inf/NaN).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__es", F.log(uniform01(key, seed)) / w)
        .orderBy(F.desc("__es"), key)
        .limit(k)
        .drop("__es")
    )


def weighted_sample_by(
    df: DataFrame,
    key: str,
    weight_col: str,
    stratum: str,
    k: int,
    *,
    seed: int = 42,
) -> DataFrame:
    """``k`` rows PER STRATUM, weighted without replacement within each
    stratum (A-ES ranking as :func:`weighted_sample`, partitioned by
    ``stratum``) — 'sample 100 docs per language, proportional to
    quality'. One shuffle on the stratum key; the per-stratum rank is a
    partitioned window, never a global sort, so strata scale
    independently (a skewed stratum costs its own partition only).
    Same determinism contract as every sampler here."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    w = F.col(weight_col)
    rank = F.row_number().over(
        Window.partitionBy(stratum).orderBy(
            F.desc(F.log(uniform01(key, seed)) / w), F.col(key)
        )
    )
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__r", rank)
        .filter(F.col("__r") <= k)
        .drop("__r")
    )
