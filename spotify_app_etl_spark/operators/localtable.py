"""Tiny driver-side tables as DataFrames — the fast path.

Three ways to turn a small driver-resident list into a DataFrame, all
measured in this environment (128-row codebook table, warm session):

* ``spark.createDataFrame(list_of_tuples)``: ~0.3 s/call — the rows
  are pickled into an RDD and every ACTION re-deserializes them in a
  Python worker.
* JVM-literal rows (``range(1).select(explode(array(struct(lit(...``):
  the r11 pattern. No Python worker at action time, but construction
  pays one py4j round trip PER LITERAL — ~2.0 s for the 1k-literal
  codebook table, ~1.7 s for a 600-literal merge table. Fine for a
  handful of literals (``similarity._meta_row``), quadratic-feeling
  beyond ~100.
* ``spark.createDataFrame(pandas_df, schema)`` with Arrow enabled
  (session default here): ONE py4j call shipping one Arrow batch;
  ~0.03 s for the same tables, and the batch is held JVM-side, so
  actions never touch a Python worker either. Values move as binary
  doubles/ints — no literal formatting, no precision round trip.

This module standardizes the third path. Sites that build per-call
driver tables (PQ codebooks, BPE merge lists, range-rank offsets,
SemDeDup block counts) route through :func:`local_df`; single-row
metas keep the literal pattern (cheapest at that size).

Scale note: these tables are O(partitions) / O(vocab_cap) / O(m*ksub)
by construction — bounded by config, never by data size. Anything
data-sized must go through a distributed plan instead.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def local_df(
    spark: SparkSession, schema: str, columns: Mapping[str, Sequence]
) -> DataFrame:
    """Build a small DataFrame from driver-side columns via ONE Arrow
    batch (see module docstring for why not literals / list-of-tuples).

    ``schema`` is a DDL string (``"a int, b array<double>"``);
    ``columns`` maps each schema field name to its values, all the
    same length. Values are shipped as binary Arrow data — exact for
    doubles, no SQL-literal quoting concerns for strings. Empty
    columns produce a valid zero-row frame with the right schema.
    """
    import pandas as pd

    data = {name: pd.Series(list(vals), dtype=object) for name, vals in columns.items()}
    if not data:
        raise ValueError("local_df: at least one column required")
    pdf = pd.DataFrame(data)
    return spark.createDataFrame(pdf, schema)
