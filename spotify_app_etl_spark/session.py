"""SparkSession construction and runtime configuration.

Two layers:

- :func:`get_spark` builds a local session with scale-appropriate
  defaults (AQE on, shuffle partitions ~ cores, Arrow on). Used by
  tests and ``bench.py``.
- :func:`configure_session` applies the subset of confs that are
  runtime-settable to ANY session — including one handed to us by an
  external driver (``__spark_entry__.entry(spark)``). Every query
  entry point calls this so behavior does not depend on who built the
  session.

Scale note: on a real multi-executor cluster the same confs apply;
``spark.sql.shuffle.partitions`` should instead be sized to
~2-3x total executor cores (or left to AQE coalescing, which we
enable). Nothing here is local-mode-specific except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Confs that are safe to set on a running session (SQLConf, not core).
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamps for oracle comparison (duckdb is UTC-naive).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing, skew-join splitting, broadcast demotion.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
    # nanosecond timestamp type, so scan them as epoch-nanos longs and
    # convert explicitly (io.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A conf may be non-settable in some deployment; queries must
            # still run (events loading re-checks what it got).
            pass
    return spark


def get_spark(
    app_name: str = "spotify-app-etl-spark",
    cpus: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    for key, value in (extra_confs or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure_session(spark)
