"""Bloom-filter runtime join prefilter (semi-join pushdown).

The pattern Spark's own runtime row-group filtering uses, exposed as an
operator: build a Bloom filter over the (small, filtered) build side's
join keys, broadcast it, and drop probe-side rows that cannot match
BEFORE the shuffle join. False positives are fine — the join verifies —
so the final result stays exact while the shuffle moves only ~the
matching fraction of the probe side. At 100 TB this is the difference
between shuffling the whole fact table and shuffling the few percent
that survive a selective dim filter.

The filter itself is plain numpy (k hashes via splitmix64 remixes of
the key), built driver-side from the build keys — the same smallness
assumption a broadcast join already makes — and applied in an
Arrow-batched pandas UDF that tests all k probes vectorized.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public-domain splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return x ^ (x >> np.uint64(31))


def _positions(keys: np.ndarray, n_hashes: int, m_bits: int) -> np.ndarray:
    """(len(keys), n_hashes) bit positions; double-hashing h1 + i*h2."""
    k = keys.astype(np.uint64)
    h1 = _splitmix64(k)
    h2 = _splitmix64(k ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def build_bloom(keys: np.ndarray, fpp: float = 0.01) -> tuple[bytes, int, int]:
    """Build a Bloom filter over integer keys → (bitset bytes, k, m)."""
    n = max(len(keys), 1)
    m_bits = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    n_hashes = max(1, round(m_bits / n * math.log(2)))
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if len(keys):
        pos = _positions(np.asarray(keys), n_hashes, m_bits).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bits.tobytes(), n_hashes, m_bits


def might_contain(df: DataFrame, key_col: str | Column, bloom: tuple[bytes, int, int]) -> Column:
    """Boolean column: key possibly in the filter (no false negatives)."""
    blob, n_hashes, m_bits = bloom
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.frombuffer(blob, dtype=np.uint8))

    @pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        bits = bc.value
        pos = _positions(keys.to_numpy(dtype=np.int64), n_hashes, m_bits)
        hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(hit.all(axis=1))

    key_col = F.col(key_col) if isinstance(key_col, str) else key_col
    return probe(key_col)


def bloom_prefiltered_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    fpp: float = 0.01,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a Bloom prefilter on the probe side.

    ``build`` must be broadcast-small (its keys are collected to the
    driver — the same budget a broadcast-hash join spends). The join
    itself still executes, so Bloom false positives never reach the
    output: results are exactly ``probe ⋈ build``.
    """
    keys = np.array(
        [r[0] for r in build.select(build_key).distinct().collect()], dtype=np.int64
    )
    bloom = build_bloom(keys, fpp=fpp)
    pruned = probe.filter(might_contain(probe, probe_key, bloom))
    return pruned.join(build, on=pruned[probe_key] == build[build_key], how=how)
