"""Sequence packing without truncation: best-fit-decreasing bins for
LLM training batches.

``ns_shard_pack`` (plans/corpus.py) is concat-and-split packing: the
token stream is cut every ``capacity`` units and documents straddle
sequence boundaries. Pretraining recipes that must NOT split a
document (instruction tuning, contrastive batches, anything with
per-example loss masking) instead bin-pack whole documents into
fixed-capacity sequences — the "packing without truncation" problem
(Krell et al. 2021, "Efficient Sequence Packing without
Cross-contamination"). Optimal bin packing is NP-hard; best-fit
decreasing (BFD) is the standard 11/9·OPT + 6/9 approximation and is
what packing implementations actually run.

BFD is inherently sequential (each placement depends on every bin's
residual), so the distributed form used here — and in production
packers — is GROUPED BFD: documents are hash-assigned to bounded
packing groups, exact BFD runs per group in an Arrow-batched
``applyInPandas`` kernel, and bin ids are (group, local bin). Packing
quality degrades only by the per-group rounding (each group wastes at
most what one bin can hold beyond its own OPT); conservation and
capacity are not relaxed at all. Everything is deterministic: group =
xxhash64(id, seed) mod n_groups, BFD order = (length desc, id), so
re-runs and cluster resizes produce byte-identical assignments.

Oversized documents (length > capacity) cannot be packed whole; they
get a singleton bin and ``oversize = true`` — the caller decides
whether to truncate, chunk (plans/chunks.py), or drop. They are
EXCLUDED from the capacity invariant (their bin is over capacity by
definition) but included in conservation.

Scale notes (100 TB): one shuffle on the group key; driver state zero
(group count is a parameter, bins never leave executors); each kernel
task holds one group's (id, length) pairs — ``n_groups`` bounds the
per-task row count the same way the SemDeDup cell split does. The
output is the per-document bin assignment, written once per corpus
build.
"""

from __future__ import annotations

from bisect import bisect_left, insort

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_SEED_GROUP = 0x5E9  # packing-group hash seed


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    n_groups: int = 64,
    group_col: str | None = None,
) -> DataFrame:
    """Pack whole documents into fixed-``capacity`` sequences: one row
    per input doc with (id, length, group, bin_id, bin_fill, oversize).

    ``bin_id`` is unique across groups (``group * 2^40 + local bin``);
    ``bin_fill`` is the summed length of the doc's bin (same value on
    every member row). Deterministic — module docstring.

    ``group_col`` overrides the default xxhash64 group assignment with
    a caller-provided column (values must land in ``[0, n_groups)``) —
    useful when the grouping must be replayable outside Spark (the
    registered query uses ``id % n_groups`` so its DuckDB oracle can
    re-run the exact BFD), or when the caller already has a
    load-balanced partition key.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")

    # ids keep their own type: casting to long would silently NULL
    # string ids ('doc-0017'), corrupting the output AND the kernel's
    # deterministic (__len, __id) tie-break
    id_type = df.schema[id_col].dataType.simpleString()
    grp = (
        F.col(group_col)
        if group_col is not None
        else F.pmod(F.xxhash64(F.col(id_col), F.lit(_SEED_GROUP)), F.lit(n_groups))
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(len_col).cast("long").alias("__len"),
        grp.cast("int").alias("__grp"),
    )

    out_schema = (
        f"__id {id_type}, __len long, __grp int, __bin long, __fill long, "
        "__oversize boolean"
    )

    def bfd(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = int(pdf["__grp"].iloc[0])
        # fail fast and diagnosable: a NULL length (NULL input or a
        # non-castable len_col) would otherwise surface as an opaque
        # "cannot convert float NaN to integer" inside pandas
        if pdf["__len"].isna().any() or pdf["__id"].isna().any():
            bad = pdf[pdf["__len"].isna() | pdf["__id"].isna()]["__id"].head(5)
            raise ValueError(
                f"pack_sequences: NULL id/length rows in group {grp} "
                f"(first ids: {list(bad)}) — filter or fix them upstream"
            )
        # a negative length sorts last, always "fits" the first bin
        # probed, and inflates residuals past capacity — capacity_ok
        # could still pass while bin_fill is silently corrupt
        if (pdf["__len"] < 0).any():
            bad = pdf[pdf["__len"] < 0]["__id"].head(5)
            raise ValueError(
                f"pack_sequences: negative lengths in group {grp} "
                f"(first ids: {list(bad)}) — filter or fix them upstream"
            )
        # BFD order: length desc, id asc — total, so the packing is a
        # pure function of the group's contents
        pdf = pdf.sort_values(["__len", "__id"], ascending=[False, True])
        # bins as a sorted list of (residual, bin_idx): best fit = the
        # smallest residual that still fits = leftmost >= length
        residuals: list[tuple[int, int]] = []
        fills: list[int] = []
        assign: list[int] = []
        oversize: list[bool] = []
        for doc_len in pdf["__len"]:
            ln = int(doc_len)
            if ln > capacity:
                b = len(fills)
                fills.append(ln)
                assign.append(b)
                oversize.append(True)
                continue
            oversize.append(False)
            j = bisect_left(residuals, (ln, -1))
            if j < len(residuals):
                res, b = residuals.pop(j)
                insort(residuals, (res - ln, b))
                fills[b] += ln
                assign.append(b)
            else:
                b = len(fills)
                fills.append(ln)
                insort(residuals, (capacity - ln, b))
                assign.append(b)
        return pd.DataFrame(
            {
                "__id": pdf["__id"].to_numpy(),
                "__len": pdf["__len"].to_numpy(),
                "__grp": grp,
                "__bin": [grp * (1 << 40) + b for b in assign],
                "__fill": [fills[b] for b in assign],
                "__oversize": oversize,
            }
        )

    packed = base.groupBy("__grp").applyInPandas(bfd, schema=out_schema)
    return packed.select(
        F.col("__id").alias(id_col),
        F.col("__len").alias("length"),
        F.col("__grp").alias("group"),
        F.col("__bin").alias("bin_id"),
        F.col("__fill").alias("bin_fill"),
        F.col("__oversize").alias("oversize"),
    )


def packing_stats(
    packed: DataFrame, capacity: int, n_groups: int = 64
) -> DataFrame:
    """One-row packing invariants over a :func:`pack_sequences` result
    — the rider aggregate the registered query crossJoins on:

    * ``n_docs`` / ``n_bins`` — conservation inputs;
    * ``capacity_ok`` — every non-oversize bin's fill ≤ capacity (the
      packer's hard invariant; an oversize doc's singleton bin is
      exempt by definition);
    * ``fill_ok`` — bins used ≤ 2 × ⌈sum(len)/capacity⌉ + ``n_groups``
      over packable docs. The 2× absorbs BFD's ~11/9·OPT per-group
      factor; the ``+ n_groups`` term is the grouped-BFD rounding
      slack — each group independently rounds up to at least one bin,
      so a tiny corpus spread over many groups legitimately uses up
      to one bin per group (without this term an OPTIMAL packing of
      100 unit-length docs across 64 groups fails the check). A
      packer that stopped packing (one doc per bin) still fails at
      any realistic corpus-to-group ratio. Pass the SAME ``n_groups``
      the packing ran with.
    """
    bins = packed.groupBy("bin_id").agg(
        F.max("bin_fill").alias("fill"),
        F.max(F.col("oversize").cast("int")).alias("oversize"),
        F.sum("length").alias("member_len"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return bins.agg(
        F.sum("n_members").alias("n_docs"),
        F.count(F.lit(1)).alias("n_bins"),
        F.max(
            F.when(F.col("oversize") == 0, F.col("fill")).otherwise(F.lit(0))
        ).alias("max_fill"),
        (
            F.max(F.when(F.col("oversize") == 0, F.col("fill")).otherwise(F.lit(0)))
            <= F.lit(capacity)
        ).alias("capacity_ok"),
        # fills must equal the sum of member lengths (no phantom fill)
        F.sum(F.when(F.col("fill") != F.col("member_len"), 1).otherwise(0))
        .alias("n_fill_mismatch"),
        (
            F.sum(F.when(F.col("oversize") == 0, 1).otherwise(0))
            <= F.lit(2.0)
            * F.ceil(
                F.sum(
                    F.when(F.col("oversize") == 0, F.col("member_len")).otherwise(0)
                )
                / F.lit(float(capacity))
            )
            + F.lit(n_groups)
        ).alias("fill_ok"),
    )
