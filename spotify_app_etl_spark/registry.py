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
    # --- round-7 window (~50 rows; 181 registered). Cumulative state
    # after r06: all 180 previously registered queries carry a driver
    # row, zero broken, zero mismatches. Rotation policy unchanged:
    # (1) queries whose CODE changed this round (or are NEW) re-prove
    # first, regardless of row age — 18 this round after the second
    # rider-free batch; (2) the queries whose latest row is r02 (the
    # oldest evidence left); (3) the r03-latest rows as fill — the cut
    # falls inside (3); its tail (~16 names) keeps its green r03 rows
    # and rolls into r08, then the r04 rows by age. ---
    # (1) code changed/new this round: the Z-order layout query is NEW;
    # PageRank and BFD packing flipped from rows-only to replayed
    # DuckDB oracles (packing also switched the registered query's
    # grouping to id % 64 via the new group_col override); the
    # Misra-Gries kernel was vectorized (batched Agarwal MERGE, typed
    # key schema); the JL-projection and classifier dense-dot arms
    # gained empty-array sequence guards; the four self-verifying
    # ANN/dedup/streaming queries gained rider-free bench_fn variants
    # (driver path unchanged, but re-prove anyway)
    "ns_layout_zorder_skipping",  # NEW r07: Z-order round-trip + skipping riders
    "ns_graph_pagerank",  # r07: unrolled 15-round DuckDB oracle (hash-green)
    "ns_pack_sequences",  # r07: recursive-CTE BFD replay oracle (hash-green)
    "ns_embed_top_eigvec",  # r07: replayed power-iteration oracle (hash-green)
    "ns_mm_phash_pairs",  # r07: all-pairs dHash oracle (banding-completeness proof)
    "ns_vocab_heavy_hitters",  # r07: vectorized MG kernel
    "ns_embed_random_projection",  # r07: empty-array sequence guard
    "ns_select_classifier",  # r07: dense-dot empty-vector guard
    "ns_sim_topk_lsh_indexed",  # r07: verify knob added
    "ns_sim_topk_pq_indexed",  # r07: verify knob added
    "ns_dedup_semantic",  # r07: verify knob added
    "ns_streaming_dedup_ingest",  # r07: verify knob added
    # (1b) the second rider-free batch — same knob, same re-prove rule
    "ns_dedup_minhash_pairs",  # r07: verify knob added
    "ns_dedup_minhash_verified",  # r07: verify knob added
    "ns_sim_topk_lsh",  # r07: verify knob added
    "ns_sim_topk_pq",  # r07: verify knob added
    "ns_dedup_embedding_cosine_lsh",  # r07: verify knob added
    "ns_dedup_minhash_incremental",  # r07: verify knob added
    "ns_corpus_overlap_sketch",  # r07: verify knob (rider-free skips the distinct)
    # (2) the 14 round-2-latest rows, in registration order
    "ns_sample_hash",
    "ns_sample_stratified",
    "ns_split_assign",
    "ns_text_vocab_topk",
    "ns_decontaminate_report",
    "ns_text_stats",
    "ns_text_language_profile",
    "ns_token_count_bpe",
    "ns_doc_fingerprint",
    "ns_pipeline_training_prep",
    "ns_mm_metadata",
    "ns_mm_features",
    "ns_mm_frame_sample",
    "ns_pii_scrub",
    # (3) the 34 round-3-latest rows (the cut falls ~8 from the end;
    # the tail rolls into r08 with its green r03 rows intact)
    "q02_min_cost_supplier",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_dominant_recent_suppliers",
    "q22_dormant_customers",
    "ns_tfidf_topterms",
    "ns_bm25_search",
    "ns_url_profile",
    "q_cdc_scd1_merge",
    "q_cdc_scd2_history",
    "q_cdc_incremental_rollup",
    "q_cdc_point_in_time",
    "q_scan_orc_roundtrip",
    "q_scan_partition_pruning",
    "q_scan_schema_evolution",
    "ns_embed_centroid",
    "ns_embed_norm_stats",
    "ns_sim_range_search",
    "q_join_bucketed_colocated",
    "q_agg_salted_twophase",
    "q_join_salted_hotkey",
    "q_agg_histogram",
    "q_agg_mode_argmax",
    "q_agg_grouping_id",
    "q_window_range_frame",
    "q_events_gapfill",
    "q_events_funnel",
    "q_udtf_sliding_windows",
    "q_join_full_outer",
    "q_join_lateral_topk",
    "q_json_variant",
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
