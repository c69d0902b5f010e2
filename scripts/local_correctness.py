#!/usr/bin/env python
"""Local all-queries oracle sweep, persisted as an auditable artifact.

The external driver's CORRECTNESS_r*.json covers a 50-query window per
round; the other ~130 registered queries are re-proved only by this
local sweep — so the sweep's result is committed each round
(LOCAL_CORRECTNESS_r{N}.json) in the driver's own per-query schema:

    {"<name>": {"rows_match": bool|null, "schema_match": bool|null,
                "hash_match": bool|null, "spark_rows": N,
                "oracle_rows": N|null, "err": null|"no_oracle"|"..."},
     ...}

The session is deliberately HOSTILE, matching the driver: a vanilla
SparkSession with a non-UTC timezone and none of the package's
build-time confs, so the runtime-conf path in
``session.configure_session`` is exercised. The comparison is the local
mirror of the driver's (tests/oracle.py): row count, column names
(case-insensitive), and order-insensitive canonicalized cell values
with columns sorted by name — strictly stronger than the driver's
value hash.

Usage:
    python scripts/local_correctness.py --out LOCAL_CORRECTNESS_r08.json
    python scripts/local_correctness.py --only q01_pricing_summary,...
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF = "/root/testdata/sf0.01"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="write the JSON artifact here")
    ap.add_argument("--sf", default=SF)
    ap.add_argument("--only", default=None, help="comma-separated names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.driver.memory", "8g")
        .appName("local-correctness")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from tests.oracle import canonical_rows, duckdb_con

    n_entry = len(E.entry(spark).collect())
    assert n_entry > 0, "entry() returned 0 rows"
    print(f"entry: {n_entry} rows OK", flush=True)

    queries = E.queries()
    oracles = E.oracle_sql()
    if args.only:
        keep = {n.strip() for n in args.only.split(",")}
        queries = {n: f for n, f in queries.items() if n in keep}
    con = duckdb_con(args.sf)

    results: dict[str, dict] = {}
    failed: list[str] = []
    t_start = time.time()
    for i, (name, fn) in enumerate(queries.items(), 1):
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spark_pdf = fn(spark, args.sf).toPandas()
            row["spark_rows"] = len(spark_pdf)
            if name not in oracles:
                row["err"] = "no_oracle"
                status = "rows-only"
            else:
                oracle_pdf = con.sql(oracles[name]).df()
                row["oracle_rows"] = len(oracle_pdf)
                row["rows_match"] = len(spark_pdf) == len(oracle_pdf)
                row["schema_match"] = sorted(
                    c.lower() for c in spark_pdf.columns
                ) == sorted(c.lower() for c in oracle_pdf.columns)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and canonical_rows(spark_pdf) == canonical_rows(oracle_pdf)
                )
                status = "MATCH" if row["hash_match"] else "MISMATCH"
                if not row["hash_match"]:
                    failed.append(name)
        except Exception:
            row["err"] = traceback.format_exc(limit=3)
            status = "ERROR"
            failed.append(name)
        results[name] = row
        print(
            f"[{i}/{len(queries)} {time.time() - t_start:.0f}s] "
            f"{name}: {row['spark_rows']} rows [{status}]",
            flush=True,
        )

    print(f"FAILED: {failed or 'none'}")
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1) + "\n")
        print(f"wrote {args.out}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
