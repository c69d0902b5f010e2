"""Small shared conf helpers for operators."""

from __future__ import annotations

from pyspark.sql import SparkSession


def size_conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """A byte-valued SQLConf as an int ("134217728b", "128m", "4MB").

    Negative values pass through (autoBroadcastJoinThreshold uses -1
    for "disabled").
    """
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    units = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    for suffix in ("kb", "mb", "gb", "tb"):
        if raw.endswith(suffix):
            return int(float(raw[:-2]) * units[suffix[0]])
    if raw and raw[-1] in units:
        return int(float(raw[:-1]) * units[raw[-1]])
    try:
        return int(raw)
    except ValueError:
        return default
