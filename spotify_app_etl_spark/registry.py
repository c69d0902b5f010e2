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

#: The round-9 window, kept for the audit trail (every name below was
#: hash-green or rows-only-by-design in CORRECTNESS_r09.json).
_PRIORITY_R09: tuple[str, ...] = (
    # --- round-9 window (exactly 50 names; 181 registered). Cumulative
    # state after r08: every registered query carries a driver row, zero
    # broken, zero mismatches; latest-row histogram r04:16 r05:36 r06:36
    # r07:43 r08:50. Rotation policy unchanged: (1) queries whose CODE
    # changed this round re-prove first regardless of row age; (2) the
    # 16 r04-latest rows (the oldest evidence left — the r08 verdict's
    # "proof-freshness tail") are fully cleared; (3) the 36 r05-latest
    # rows by registration order — the cut falls 28 in, the remaining 8
    # (q_events_pivot, q_events_gap_stats, ns_dedup_minhash_apply,
    # ns_dedup_simhash_pairs, ns_sim_topk_bruteforce, etl_playlists,
    # etl_saved_tracks, q_hll_sketch_merge) roll to r10 and are the r10
    # window seed.
    # (1) code changed this round — six names. The sign-LSH embedding
    # dedup now merges cross-table pair sightings by key (groupBy max)
    # instead of full-row distinct, and sizes its auto knobs from the
    # null-filtered frame the kernel runs on (values unchanged at this
    # SF — local oracle re-verified; the merge change closes a one-ulp
    # duplicate window the r08 ADVICE flagged).
    "ns_dedup_embedding_cosine_lsh",
    # ...and the exact n-gram Jaccard kernel gained the prefix-filtered
    # AllPairs/PPJoin plan above PREFIX_FILTER_MIN_DOCS (the r09 128x
    # probe OOM'd the naive gram self-join's (docs-per-gram)² fan-out
    # under ns_dedup_source_matrix; now 8.94x time for 128x rows) —
    # value-identical by theorem and by test, but every query running
    # through ngram_jaccard_pairs re-proves:
    "ns_dedup_ngram_jaccard",
    "ns_dedup_minhash_pairs",
    "ns_dedup_minhash_verified",
    "ns_dedup_clusters",
    "ns_split_leakage_safe",
    # (2) the 16 r04-latest rows, in registration order
    "ns_dedup_embedding_cosine",
    "ns_dedup_source_matrix",
    "q_join_asof",
    "q_join_asof_forward",
    "q16_supplier_part_count",
    "q17_small_qty_revenue",
    "q21_late_sole_supplier",
    "ns_boilerplate_grams",
    "ns_curriculum_bins",
    "ns_corpus_shuffle",
    "ns_lm_bigram_novelty",
    "ns_hybrid_rrf_search",
    "q_join_bloom_prefilter",
    "ns_embed_semantic_clusters",
    "ns_dedup_chunk_shared",
    "ns_quality_bands",
    # (3) the first 28 of the 36 r05-latest rows, in registration order
    # (the five kernel-change re-proves in block (1) pushed the cut
    # from 33 to 28 over the 50-name window; the 8 rolled names are
    # listed in the header)
    "q_join_left_agg",
    "q_join_semi",
    "q_join_anti",
    "q_join_range_nonequi",
    "q_approx_count_distinct",
    "q_unpivot_long",
    "q_string_funcs",
    "q_regexp_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_conditional_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_json_funcs",
    "q_hash_funcs",
    "q_string_distance",
    "q_window_running",
    "q_window_rank",
    "q_topk_per_group",
    "q_window_moving_avg",
    "q_window_analytic_extras",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_drop_duplicates",
    "q_events_tumbling",
    "q_events_sliding",
    "q_events_session",
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
