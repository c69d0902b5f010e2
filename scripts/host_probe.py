#!/usr/bin/env python
"""Quick host-phase probe: the bench's CPU calibration and I/O probe,
nothing else. Prints one JSON line. Used to adjudicate whether the
host is in a quiet or degraded phase before/after timing runs."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    from pyspark.sql import functions as F

    from bench import io_calibration
    from spotify_app_etl_spark.session import get_spark

    spark = get_spark(app_name="host_probe")
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # warmup
    spark.range(1_000_000, numPartitions=n_cpus).agg(
        F.bit_xor(F.xxhash64("id"))
    ).collect()
    calibration = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        spark.range(8_000_000_000, numPartitions=n_cpus).agg(
            F.bit_xor(F.xxhash64("id"))
        ).collect()
        calibration = min(calibration, time.perf_counter() - start)
    io = io_calibration(spark, n_cpus)
    print(json.dumps({
        "calibration_sec": round(calibration, 3),
        "calibration_io_sec": round(io, 3),
    }))


if __name__ == "__main__":
    main()
