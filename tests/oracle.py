"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its ANSI-SQL oracle on the same
parquet, then compares row count + canonicalized cell values
(columns sorted by name, rows sorted, full-precision float repr).
Stricter than a hash: on mismatch it reports the first differing rows.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
import numpy as np

from spotify_app_etl_spark.io import TESTDATA_TABLES

__test__ = False  # not a pytest module


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "∅" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        # normalize DATE to midnight-timestamp form: pandas promotes
        # duckdb DATE to datetime64 while Spark DateType stays date
        return v.isoformat() + "T00:00:00.000000"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def canonical_rows(df) -> list[tuple]:
    """pandas DataFrame → sorted tuples of canonical strings, cols by name."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(spark, name: str, sf_dir: str) -> CompareResult:
    from spotify_app_etl_spark.registry import load_all

    q = load_all()[name]
    sdf = q.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        return CompareResult(name, True, len(spark_pdf), -1, "rows-only (no oracle)")
    con = duckdb_con(sf_dir)
    oracle_pdf = con.sql(q.oracle).df()
    a, b = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if len(a) != len(b):
        return CompareResult(
            name, False, len(a), len(b), f"row count mismatch: spark={len(a)} oracle={len(b)}"
        )
    if sorted(c.lower() for c in spark_pdf.columns) != sorted(
        c.lower() for c in oracle_pdf.columns
    ):
        return CompareResult(
            name, False, len(a), len(b),
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
        )
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return CompareResult(
                name, False, len(a), len(b),
                f"first diff at sorted row {i} (cols {sorted(spark_pdf.columns)}):\n"
                f"  spark : {ra}\n  oracle: {rb}",
            )
    return CompareResult(name, True, len(a), len(b))
