"""Misra-Gries heavy hitters: the bounded, mergeable TOP-K summary.

The sketch-family completion next to the count-min sketch
(``operators/cms.py``): CMS answers "how often is key x?" with a
one-sided OVERestimate; Misra-Gries (1982; the k=1 case is
Boyer-Moore majority) answers "which keys are frequent?" with a
one-sided UNDERestimate and a hard completeness guarantee. Agarwal et
al. 2012 ("Mergeable Summaries") proved MG summaries merge without
losing their bound — which is exactly the shape Spark needs:

* each partition streams once through an O(k) counter map (classic
  MG: count hits, admit while there is room, otherwise decrement ALL
  counters — a decrement charges one occurrence of every tracked key
  plus the arriving one, so it can happen at most n/(k+1) times);
* the per-partition summaries union by plain ``groupBy(key).sum`` —
  per-key error only ever comes from decrements, so the merged
  estimate keeps ``true - n/(k+1) ≤ est ≤ true`` with n the TOTAL
  stream length;
* completeness: any key with true count > n/(k+1) is in the merged
  summary (if it were absent from every partition's summary, its
  count in each partition p would be ≤ n_p/(k+1), summing to
  ≤ n/(k+1) — contradiction).

The merged summary has at most k × partitions rows (bounded by the
parallelism knob, not by key cardinality — same budget as any
treeAggregate sketch); callers rank it and keep what they need. The
summary is deterministic for a fixed partition layout (MG depends on
arrival order); like every sketch here, estimates are reproducible
run-over-run on the same files.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def mg_partition_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition MG(k) summaries: (key, est) with ≤ k rows per
    input partition. NULL keys are skipped (not a frequency)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    keyed = df.select(F.col(key_col).alias("key")).filter(F.col("key").isNotNull())

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for x in pdf["key"]:
                if x in counters:
                    counters[x] += 1
                elif len(counters) < k:
                    counters[x] = 1
                else:
                    # decrement-all: drop zeros; the arriving key is
                    # "cancelled" against one occurrence of each
                    # tracked key (the n/(k+1) charging argument)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"key": list(counters), "est": list(counters.values())}
            )

    return keyed.mapInPandas(mg, schema="key string, est long")


def mg_summary(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Merged MG summary over the whole DataFrame: (key, est) with
    ``true - n/(k+1) ≤ est ≤ true`` and every key of true count
    > n/(k+1) present. ≤ k × partitions rows; one shuffle, map-side
    combinable (the per-partition kernel already shrank each side to
    ≤ k rows)."""
    return (
        mg_partition_summaries(df, key_col, k)
        .groupBy("key")
        .agg(F.sum("est").alias("est"))
    )


def mg_topk(df: DataFrame, key_col: str, k: int, top: int) -> DataFrame:
    """The ``top`` highest-estimate keys from an MG(k) summary, ties
    broken on key — a distributed TakeOrdered."""
    if top <= 0:
        raise ValueError(f"top must be positive, got {top}")
    return mg_summary(df, key_col, k).orderBy(F.desc("est"), "key").limit(top)
