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
    "spotify_app_etl_spark.plans.corpus",
    "spotify_app_etl_spark.plans.etl_parity",
    "spotify_app_etl_spark.plans.udf",
    "spotify_app_etl_spark.plans.sql_api",
    # Registered last on purpose: queries added mid-round sort after the
    # _PRIORITY block and the round-1 surface, so they don't displace
    # not-yet-driver-checked queries from the checked window.
    "spotify_app_etl_spark.plans.tpch_more",
    "spotify_app_etl_spark.plans.prep",
    "spotify_app_etl_spark.plans.indexing",
    "spotify_app_etl_spark.plans.cdc",
    "spotify_app_etl_spark.plans.sketches",
    "spotify_app_etl_spark.plans.embed_analytics",
    "spotify_app_etl_spark.plans.layout",
    "spotify_app_etl_spark.plans.chunks",
    "spotify_app_etl_spark.plans.reshape",
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


#: Names emitted first by :func:`queries` / :func:`oracle_sql`. The
#: driver's correctness harness checks queries in iteration order with a
#: bounded budget (rounds 1 and 2 each covered exactly the first 50), so
#: queries that have never received a driver CORRECTNESS row run first;
#: everything else follows in registration order and keeps its green
#: round-1/2 row as evidence.
_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked (r01+r02 covered the first 100 of 124) ---
    # TPC-H completion suite tail
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q21_late_sole_supplier",
    "q22_dormant_customers",
    "q02_min_cost_supplier",
    "q11_important_stock",
    "q20_dominant_recent_suppliers",
    # corpus indexing / LM-quality scoring
    "ns_tfidf_topterms",
    "ns_bm25_search",
    "ns_lm_bigram_novelty",
    "ns_url_profile",
    # CDC / sketches / embedding analytics
    "q_cdc_scd1_merge",
    "q_cdc_scd2_history",
    "q_cdc_incremental_rollup",
    "q_join_bloom_prefilter",
    "q_agg_approx_percentile",
    "q_hll_sketch_merge",
    "q_scan_orc_roundtrip",
    "ns_embed_centroid",
    "ns_embed_norm_stats",
    # --- round-3 additions get driver rows in the remaining budget ---
    # physical layout / skew
    "q_scan_partition_pruning",
    "q_join_bucketed_colocated",
    "q_agg_salted_twophase",
    "q_join_salted_hotkey",
    # chunk-level dedup + quality banding
    "ns_dedup_chunk_shared",
    "ns_quality_bands",
    # similarity range search; binning / range frames
    "ns_sim_range_search",
    "q_agg_histogram",
    "q_window_range_frame",
    "ns_embed_semantic_clusters",
    "q_join_asof_forward",
    "q_events_gapfill",
    "q_udtf_sliding_windows",
    "q_agg_mode_argmax",
    "ns_doc_winnowing",
    "ns_hybrid_rrf_search",
    "ns_split_leakage_safe",
    "ns_dedup_source_matrix",
    "q_events_funnel",
    "q_join_full_outer",
    "q_scan_schema_evolution",
    "q_cdc_point_in_time",
    "q_join_lateral_topk",
    "q_sql_recursive_cte",
    "q_json_variant",
    "q_agg_grouping_id",
    "q_agg_percentile_disc",
    # rows-only (driver row records count only) — window tail
    "ns_mm_phash_pairs",
    "ns_embed_top_eigvec",
)


def load_all() -> dict[str, Query]:
    """Import every plan module and return the registry, priority first."""
    for module in _PLAN_MODULES:
        importlib.import_module(module)
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
