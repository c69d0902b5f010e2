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
    # --- round-6 window (~50 rows; 173 registered after this session's
    # additions). Cumulative state after r05: every previously
    # registered query carries a driver row, zero broken, zero
    # mismatches. The rotation policy stays: (1) queries whose CODE
    # changed this round (or are NEW this round) re-prove first,
    # regardless of row age; (2) the queries whose latest row is from
    # round 2 (the oldest evidence in the repo now); (3) the oldest
    # round-3 rows as fill. With the five session additions the window
    # cut falls inside section (2): its tail and section (3) keep
    # their green r02/r03 rows and roll into r07. ---
    # (1) code changed this round: the percentile operator rewrite
    # (all-NULL groups kept with NULL values, count(*) count_col —
    # ADVICE r05), the _cell_rank NULL backstop + large-centroid Arrow
    # path in operators/similarity.py, the applicationId-scoped
    # scratch dirs (northstar + layout), and the CC rounds-attribution
    # rework in operators/cluster.py
    "q_agg_percentiles",
    "q_agg_percentile_disc",
    "q_agg_approx_percentile",  # rider uses percentile_cont_by
    "ns_sim_topk_ivf",
    "ns_sim_topk_pq",  # NEW r06: product-quantization ANN
    "ns_dedup_semantic",  # NEW r06: SemDeDup cluster-scoped dedup
    "ns_sim_topk_pq_indexed",  # NEW r06: persisted PQ build/append/probe
    "ns_select_importance",  # NEW r06: DSIR-style data selection (oracle-exact)
    "ns_corpus_overlap_sketch",  # NEW r06: HLL cross-corpus overlap estimate
    "ns_vocab_cms_estimate",  # NEW r06: count-min sketch frequency estimates
    "ns_sample_weighted",  # NEW r06: A-ES weighted sampling (oracle-exact)
    "ns_sample_weighted_by_lang",  # NEW r06: per-stratum A-ES quota (oracle-exact)
    "ns_streaming_cms_ingest",  # NEW r06: streaming CMS maintenance
    "ns_bpe_token_count",  # NEW r06: learned-BPE tokenizer counting
    "ns_select_classifier",  # NEW r06: LR quality filter (GPT-3 style)
    "ns_select_lm_perplexity",  # NEW r06: Stupid-Backoff LM filter (oracle-exact)
    "q_fuzzy_match_customers",  # NEW r06: FastSS blocked fuzzy match (oracle-exact)
    "q_fuzzy_entity_clusters",  # NEW r06: entity closure (oracle-exact)
    "ns_pack_sequences",  # NEW r06: BFD packing without truncation (riders)
    "ns_graph_pagerank",  # NEW r06: distributed PageRank (mass rider)
    "ns_quality_gopher_rules",  # NEW r06: Gopher rule filter (oracle-exact)
    "q_fuzzy_match_part_names",  # NEW r06: d=2 dictionary matching (oracle-exact)
    "ns_embed_random_projection",  # NEW r06: JL projection (bit-exact oracle)
    "ns_quality_compression",  # NEW r06: zlib repetition signal (riders)
    "ns_vocab_heavy_hitters",  # NEW r06: Misra-Gries top-k (riders)
    "q_graph_triangles",  # NEW r06: degree-ordered triangles (oracle-exact)
    "ns_pipeline_llm_recipe",  # NEW r06: composed gate→dedup→LM (oracle-exact)
    "ns_sim_topk_lsh_indexed",
    "ns_dedup_minhash_incremental",
    "ns_streaming_dedup_ingest",
    "ns_layout_compact_roundtrip",
    "ns_dedup_clusters",
    # (2) the 33 round-2-latest rows, in registration order
    "etl_recent_tracks",
    "etl_followed_artists",
    "etl_playlist_profile",
    "q04_order_priority",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q12_ship_latency",
    "q_dedup_bounded_window",
    "q_scan_csv_roundtrip",
    "q_scan_json_roundtrip",
    "q_sql_revenue_filter",
    "q_sql_exists_subquery",
    "q_sql_in_subquery",
    "q_sql_scalar_subquery",
    "q_udf_pandas_scalar",
    "q_udaf_grouped_median",
    "q_udtf_tokenize",
    "ns_decontaminate_report",
    "ns_doc_fingerprint",
    "ns_mm_features",
    "ns_mm_frame_sample",
    "ns_mm_metadata",
    "ns_pii_scrub",
    "ns_pipeline_training_prep",
    "ns_sample_hash",
    "ns_sample_stratified",
    "ns_split_assign",
    "ns_text_language_profile",
    "ns_text_stats",
    "ns_text_vocab_topk",
    "ns_token_count_bpe",
    # (3) oldest round-3 rows as fill to ~50
    "ns_bm25_search",
    "ns_embed_centroid",
    "ns_embed_norm_stats",
    "ns_sim_range_search",
    "ns_tfidf_topterms",
    "ns_url_profile",
    "q02_min_cost_supplier",
    "q11_important_stock",
    "q13_customer_distribution",
    # (Next in line for the r07 window: whatever of sections (2)/(3)
    # above fell past the r06 cut, then the rest of the r03-latest
    # rows — q15/q18/q19/q20/q22, the q_agg_grouping_id/histogram/
    # mode_argmax/salted family, the q_cdc_* set, q_events_funnel/
    # gapfill, q_join_bucketed_colocated/full_outer/lateral_topk/
    # salted_hotkey, q_json_variant, q_scan_orc_roundtrip/
    # partition_pruning/schema_evolution, q_udtf_sliding_windows,
    # q_window_range_frame — then the r04 rows by age.)
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
