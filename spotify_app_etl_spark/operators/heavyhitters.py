"""Misra-Gries heavy hitters: the bounded, mergeable TOP-K summary.

The sketch-family completion next to the count-min sketch
(``operators/cms.py``): CMS answers "how often is key x?" with a
one-sided OVERestimate; Misra-Gries (1982; the k=1 case is
Boyer-Moore majority) answers "which keys are frequent?" with a
one-sided UNDERestimate and a hard completeness guarantee. Agarwal et
al. 2012 ("Mergeable Summaries") proved MG summaries merge without
losing their bound — which is exactly the shape Spark needs:

* each partition folds its Arrow batches into an O(k) counter map via
  the MERGE operation of Agarwal et al.: a batch's exact histogram
  (``value_counts`` — itself a trivially valid MG summary with zero
  error) is summed into the running summary, and when the result
  tracks more than k keys, the (k+1)-th LARGEST count is subtracted
  from every counter in one bulk step and non-positive entries drop.
  Each subtraction of t charges t occurrences of at least k+1
  distinct tracked keys, so the total subtracted from any single key
  is ≤ n_p/(k+1) over a partition of n_p rows — the same bound as
  element-at-a-time MG, with O(unique-per-batch) dict merges instead
  of an O(rows) Python loop;
* the per-partition summaries union by plain ``groupBy(key).sum`` —
  per-key error only ever comes from the bulk subtractions, so the
  merged estimate keeps ``true - n/(k+1) ≤ est ≤ true`` with n the
  TOTAL stream length;
* completeness: any key with true count > n/(k+1) is in the merged
  summary (if it were absent from every partition's summary, its
  count in each partition p would be ≤ n_p/(k+1), summing to
  ≤ n/(k+1) — contradiction).

The merged summary has at most k × partitions rows (bounded by the
parallelism knob, not by key cardinality — same budget as any
treeAggregate sketch); callers rank it and keep what they need. The
summary is deterministic for a fixed partition + Arrow-batch layout
(MG depends on arrival order); like every sketch here, estimates are
reproducible run-over-run on the same files.
"""

from __future__ import annotations

import heapq

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _merge_batch_counts(counters: dict, vc: "pd.Series", k: int) -> dict:
    """One Agarwal-et-al. MERGE step: fold a batch's exact histogram
    into an MG(k) summary and re-bound it to ≤ k tracked keys by
    subtracting the (k+1)-th largest count from every counter."""
    for key, c in vc.items():
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) > k:
        # (k+1)-th largest via a bounded heap selection — O(m log k)
        # over m tracked keys, vs O(m log m) for a full sort; only the
        # threshold is needed, never the sorted order
        t = heapq.nlargest(k + 1, counters.values())[-1]
        counters = {key: c - t for key, c in counters.items() if c > t}
    return counters


def mg_partition_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition MG(k) summaries: (key, est) with ≤ k rows per
    input partition. NULL keys are skipped (not a frequency). The key
    column keeps its input type (derived from the schema, not
    hardcoded — bigint ids summarize as bigints)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    key_type = df.schema[key_col].dataType.simpleString()
    keyed = df.select(F.col(key_col).alias("key")).filter(F.col("key").isNotNull())

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            # exact per-batch histogram: O(batch) vectorized counting +
            # O(unique) dict merges, never a per-row Python loop
            counters = _merge_batch_counts(counters, pdf["key"].value_counts(), k)
        if counters:
            yield pd.DataFrame(
                {"key": list(counters), "est": list(counters.values())}
            )

    return keyed.mapInPandas(mg, schema=f"key {key_type}, est long")


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
