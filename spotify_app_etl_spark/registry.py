"""Named-query registry backing ``__spark_entry__``.

Each implemented operator from SURVEY.md §2 registers here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string for
DuckDB. The driver compares row-count + schema + order-insensitive
value-hash, sorting columns by name — so every computed column is
aliased identically on both sides, float aggregates are rounded on both
sides, and LIMIT queries carry total tie-breaks to make the row *set*
deterministic.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = ()
    note: str = ""


REGISTRY: dict[str, Query] = {}

#: Modules that register queries on import (populated lazily so that a
#: syntax error in one plan module doesn't take down the whole surface).
_PLAN_MODULES = (
    "spotify_app_etl_spark.plans.relational",
    "spotify_app_etl_spark.plans.scalar",
    "spotify_app_etl_spark.plans.windows",
    "spotify_app_etl_spark.plans.sets",
    "spotify_app_etl_spark.plans.events",
    "spotify_app_etl_spark.plans.northstar",
    "spotify_app_etl_spark.plans.etl_parity",
    "spotify_app_etl_spark.plans.udf",
    "spotify_app_etl_spark.plans.sql_api",
)


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), note: str = ""
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a named query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, note=note)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every plan module and return the populated registry."""
    for module in _PLAN_MODULES:
        importlib.import_module(module)
    return REGISTRY


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
