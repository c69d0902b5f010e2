"""Shared helpers for oracle-exact query plans.

Float-sum determinism (SURVEY.md §7 risk b): a double-precision SUM is
order-dependent, and Spark's partial/final aggregation order differs
from DuckDB's — so money aggregates are computed in DECIMAL (exact,
order-independent) and cast to double at the very end. Both engines
then produce bit-identical doubles, making the driver's value-hash
comparison robust without rounding tricks.

Precision choice: money inputs are 2-decimal doubles ≤ ~1e6.
DECIMAL(12,2) holds them exactly; a product of two DECIMAL(12,2) and
one DECIMAL(25,4) stays within 38 digits on both engines (Spark:
p1+p2+1 = 38; DuckDB: p1+p2 = 37), so no engine-specific scale
reduction (= rounding) ever kicks in.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from spotify_app_etl_spark.io import load_table

MONEY = "decimal(12,2)"


def dec(col: str | Column) -> Column:
    """Exact 2-decimal fixed-point view of a money/ratio double column."""
    col = F.col(col) if isinstance(col, str) else col
    return col.cast(MONEY)


def dsum(expr: Column, alias: str) -> Column:
    """Order-independent SUM: aggregate in decimal, emit double."""
    return F.sum(expr).cast("double").alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Deterministic AVG: exact decimal sum, one double division."""
    return (F.sum(expr).cast("double") / F.count(expr)).alias(alias)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# SQL-side equivalents (DuckDB oracle): keep these snippets in sync with
# dec()/dsum()/davg() above.
SQL_DEC = "CAST({col} AS DECIMAL(12,2))"


def sql_dsum(inner: str, alias: str) -> str:
    return f"CAST(SUM({inner}) AS DOUBLE) AS {alias}"


def sql_davg(inner: str, alias: str) -> str:
    return f"CAST(SUM({inner}) AS DOUBLE) / COUNT({inner}) AS {alias}"


#: DuckDB mirror of ``functions.text.tokens`` (= dedup.normalized →
#: whitespace split → drop empty tokens). ONE definition for every
#: oracle that tokenizes `documents.text`: a change to the
#: normalization (e.g. unicode folding) must not be able to land in one
#: module's copy and silently diverge the other's oracles.
SQL_TOKS = (
    "list_filter(str_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),"
    " ' '), tk -> tk <> '')"
)

#: DuckDB mirror of functions.text.bigrams (over a column named
#: ``tk``): non-distinct consecutive bigrams; a 1-token doc yields its
#: lone token (concat_ws skips the NULL second element), an empty
#: token list yields [] (the trailing filter drops the phantom ''
#: that concat_ws(NULL, NULL) would otherwise emit). Keep in sync
#: with functions.text.bigrams.
SQL_BIGRAMS = """list_filter(list_transform(
    range(1, greatest(len(tk) - 1, 1) + 1),
    i -> concat_ws(' ', tk[i], tk[i+1])), g -> g <> '')"""


def sql_transitions(tk: str = "tk") -> str:
    """DuckDB mirror of ``functions.text.transitions`` for use in a
    FROM clause: two positionally-zipped unnests over the same shifted
    slices (DuckDB aligns equal-length unnests in one SELECT). Emits
    columns ``prev`` and ``cur``; a sub-2-token doc yields no rows.
    The ``greatest(len-1, 0)`` guard stops the empty-array slice from
    going negative (DuckDB negative indexes count from the END — a
    silent wrong-answer, not an error). Keep in sync with
    functions.text.transitions."""
    return (
        f"unnest({tk}[1:greatest(len({tk}) - 1, 0)]) AS prev, "
        f"unnest({tk}[2:len({tk})]) AS cur"
    )


#: Scratch roots already registered for exit-time removal.
_SCRATCH_CLEANUPS: set[str] = set()


def app_scratch_base(spark: SparkSession, family: str) -> str:
    """``{tmpdir}/{family}/{applicationId}`` — the per-application
    scratch root every self-managed temp path in this package hangs
    off. The applicationId segment stops concurrent sessions (driver +
    pytest, parallel benches) from deleting or overwriting each
    other's live files; the atexit hook removes THIS app's whole tree
    at interpreter exit so per-app scoping doesn't leak one copy per
    short-lived process (the failure mode that used to fill /tmp)."""
    import atexit
    import shutil
    import tempfile

    base = os.path.join(
        tempfile.gettempdir(), family, spark.sparkContext.applicationId
    )
    if base not in _SCRATCH_CLEANUPS:
        _SCRATCH_CLEANUPS.add(base)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base
