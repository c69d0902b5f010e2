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
    #: Rider-free variant for the benchmark harness. Self-verifying
    #: queries (persisted-ANN parity, SemDeDup recall, streaming
    #: idempotence) carry an in-query proof that can cost as much as
    #: the operator itself; the driver's correctness sweep always runs
    #: ``fn`` (proof included), while ``bench.py`` measures ``bench_fn``
    #: so BENCH_r*.json reflects the engine, not the proof.
    bench_fn: QueryFn | None = None


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
    "spotify_app_etl_spark.plans.entity",
)


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    note: str = "",
    bench_fn: QueryFn | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a named query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, note=note, bench_fn=bench_fn
        )
        return fn

    return deco


#: Names emitted first by :func:`queries` / :func:`oracle_sql`. The
#: driver's correctness harness checks queries in iteration order with a
#: bounded budget (rounds 1 and 2 each covered exactly the first 50), so
#: queries that have never received a driver CORRECTNESS row run first;
#: everything else follows in registration order and keeps its green
#: round-1/2 row as evidence.
_PRIORITY: tuple[str, ...] = (
    # --- round-11 window (exactly 50 names; 181 registered). Cumulative
    # state after r10: every registered query carries a driver row, zero
    # broken, zero mismatches; latest-row histogram r07:41 r08:46 r09:44
    # r10:50. Rotation policy unchanged: (1) queries whose CODE changed
    # this round re-prove first regardless of row age; (2) the 41
    # r07-latest rows (the oldest evidence left) fully clear, making the
    # post-r11 histogram floor r08; (3) the first 3 of the 46 r08-latest
    # rows by registration order fill the window — 6 + 41 + 3 = 50. ---
    # (1) code changed this round — six names. PageRank's static tables
    # (edges/outdeg/nodes) are now hash-partitioned + sorted + captured
    # into their checkpoints (built under adaptive_off; under AQE the
    # captured partitioning degrades to Unknown), with a broadcast-vs-
    # co-partitioned round-mode gate on the rank-vector size: per-round
    # cost now tracks the rank vector, not the edge table (one
    # rank-vector exchange per round, was 4 static re-shuffles). Values
    # unchanged (plan-shape only; local oracle re-verified hash-green
    # both modes):
    "ns_graph_pagerank",
    # ...the recursive-CTE walk's persisted successor-edge table now
    # routes through operators.persist.scoped_persist (the persist-scope
    # machinery moved out of operators.dedup — pure module move, plan
    # unchanged), and the session now raises Spark's recursive-CTE ROW
    # limit guardrail to the int32 ceiling (the 1M default aborted the
    # walk at the 128x replica; level limit still guards termination):
    "q_sql_recursive_cte",
    # ...and connected components got the same static-edge-layout +
    # round-mode gate as PageRank (operators/cluster.py) — every query
    # routing through CL.connected_components/dedup_clusters re-proves:
    "ns_dedup_clusters",
    "ns_split_leakage_safe",
    "ns_embed_semantic_clusters",
    "q_fuzzy_entity_clusters",
    # (2) the 41 r07-latest rows, in registration order
    "ns_sim_topk_lsh",
    "ns_sim_topk_pq",
    "ns_sim_topk_lsh_indexed",
    "ns_sim_topk_pq_indexed",
    "ns_streaming_dedup_ingest",
    "ns_text_stats",
    "ns_text_language_profile",
    "ns_token_count_bpe",
    "ns_mm_metadata",
    "ns_mm_features",
    "ns_mm_frame_sample",
    "ns_doc_fingerprint",
    "ns_pipeline_training_prep",
    "ns_sample_hash",
    "ns_sample_stratified",
    "ns_split_assign",
    "ns_text_vocab_topk",
    "ns_decontaminate_report",
    "ns_pack_sequences",
    "q_scan_orc_roundtrip",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "q02_min_cost_supplier",
    "q11_important_stock",
    "q20_dominant_recent_suppliers",
    "ns_pii_scrub",
    "ns_select_classifier",
    "ns_tfidf_topterms",
    "ns_bm25_search",
    "ns_url_profile",
    "q_cdc_scd1_merge",
    "q_cdc_scd2_history",
    "q_cdc_incremental_rollup",
    "q_cdc_point_in_time",
    "ns_corpus_overlap_sketch",
    "ns_embed_top_eigvec",
    "ns_embed_random_projection",
    "q_scan_partition_pruning",
    # (3) the first 3 of the 46 r08-latest rows, in registration order
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
)

#: The round-10 window, kept for the audit trail (every name below was
#: hash-green or rows-only-by-design in CORRECTNESS_r10.json).
_PRIORITY_R10: tuple[str, ...] = (
    # --- round-10 window (exactly 50 names; 181 registered). Cumulative
    # state after r09: every registered query carries a driver row, zero
    # broken, zero mismatches; latest-row histogram r05:8 r06:36 r07:41
    # r08:46 r09:50. Rotation policy unchanged: (1) queries whose CODE
    # changed this round re-prove first regardless of row age; (2) the
    # 8 r05-latest rows (the last pre-r06 evidence — the r09 verdict's
    # final freshness slice) are fully cleared; (3) the 36 r06-latest
    # rows by registration order — 6 + 8 + 36 = exactly 50, so the
    # entire r06 slice clears too and the post-r10 histogram floor is
    # r07. ---
    # (1) code changed this round: the exact n-gram Jaccard kernel's
    # AllPairs fan-out width now scales with measured corpus text bytes
    # (ALLPAIRS_TEXT_BYTES_PER_TASK) instead of core count — the r09
    # 512x probe pinned a ~0.5 GiB/task execution-memory floor in the
    # gram-explode stage at core-count width; capping per-task input
    # text makes the explode working set scale-independent. The kernel
    # also moved to a dense int gram vocabulary (distributed range-rank,
    # rarest-first): every post-vocab exchange ships ints, per-doc sets
    # are array<int>, and the xxhash64 injectivity certificate is gone
    # (dense ids are injective by construction) — the 512x disk watcher
    # traced the probe host's ENOSPC to the gram-string/array<long>
    # shuffle bytes (SCALING.md twelfth family). Values unchanged
    # (plan-shape changes only — local oracle re-verified all six
    # post-change); every query routing through ngram_jaccard_pairs
    # re-proves:
    "ns_dedup_ngram_jaccard",
    "ns_dedup_minhash_pairs",
    "ns_dedup_minhash_verified",
    "ns_dedup_clusters",
    "ns_split_leakage_safe",
    "ns_dedup_source_matrix",
    # (2) the 8 r05-latest rows, in registration order
    "q_events_pivot",
    "q_events_gap_stats",
    "ns_dedup_minhash_apply",
    "ns_dedup_simhash_pairs",
    "ns_sim_topk_bruteforce",
    "etl_playlists",
    "etl_saved_tracks",
    "q_hll_sketch_merge",
    # (3) all 36 r06-latest rows, in registration order — the cut
    # lands exactly at the window edge, nothing rolls to r11
    "q_dedup_bounded_window",
    "ns_sim_topk_ivf",
    "ns_streaming_cms_ingest",
    "ns_sample_weighted",
    "ns_sample_weighted_by_lang",
    "ns_quality_gopher_rules",
    "ns_quality_compression",
    "ns_bpe_token_count",
    "etl_recent_tracks",
    "etl_followed_artists",
    "etl_playlist_profile",
    "q_udf_pandas_scalar",
    "q_udaf_grouped_median",
    "q_agg_percentiles",
    "q_udtf_tokenize",
    "q_sql_revenue_filter",
    "q_sql_exists_subquery",
    "q_sql_scalar_subquery",
    "q_sql_in_subquery",
    "q_scan_csv_roundtrip",
    "q_scan_json_roundtrip",
    "q04_order_priority",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q12_ship_latency",
    "ns_select_importance",
    "ns_select_lm_perplexity",
    "ns_pipeline_llm_recipe",
    "q_agg_approx_percentile",
    "ns_vocab_cms_estimate",
    "ns_layout_compact_roundtrip",
    "q_agg_percentile_disc",
    "q_fuzzy_match_customers",
    "q_fuzzy_match_part_names",
    "q_graph_triangles",
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
