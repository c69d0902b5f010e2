#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE compact JSON summary line:

    {"metric": "...", "value": N, "unit": "sec", "sf": ...,
     "n_queries": K, "queries_top": {...10 slowest...},
     "detail_file": "BENCH_DETAIL_r10.json", ...}

The FULL per-query map (plus cc_rounds, rider_free, per-query noise
ratios) is written to the ``detail_file`` sidecar next to this script.
Split rationale: the driver records only the last 2000 characters of
stdout, and r08's single all-inclusive line outgrew that buffer —
``BENCH_r08.json`` captured an unparseable mid-line string. The
summary line is size-budgeted (tests/test_bench_compare.py pins it
under 1500 bytes with worst-case names) so the driver artifact always
parses; ``scripts/bench_compare.py`` resolves the sidecar for
per-query cross-round ratios.

``value`` is the total wall-clock over the headline set (lower is
better). Each query is forced with an xxhash64-over-all-columns
aggregate: every output column is computed (a bare count() would let
Catalyst prune projection-only queries down to a row count) while only
one row ferries to the driver. A short warmup query absorbs
JVM/codegen startup so per-query numbers measure the plans, not
session bootstrap.

Usage:
    python bench.py                 # headline set at sf0.1
    python bench.py --all           # every registered query
    python bench.py --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

#: Summary-line size budget (bytes). The driver's stdout capture keeps
#: the last 2000 characters; staying ≤ 1500 leaves headroom for a
#: stray trailing warning line. Enforced by tests/test_bench_compare.py
#: against worst-case query names.
SUMMARY_BYTE_BUDGET = 1500

#: How many of the slowest queries ride along on the summary line (a
#: human-readable teaser; the sidecar is the full record).
TOP_N = 10


def infer_round_stamp(root: Path | None = None) -> str:
    """Current driver round, inferred from the COMMITTED artifacts
    (``git ls-files``, not a working-tree glob — the driver's own
    in-flight, not-yet-committed ``BENCH_r{N}.json`` must not bump the
    stamp to r{N+1}; r10 ADVICE): the driver commits
    ``BENCH_r{N}.json`` at the END of round N, so while round N is in
    flight the newest committed file is r(N-1). Returns e.g. ``"r10"``
    — matching the stamp ``bench_compare._resolve_detail`` greps out
    of the driver artifact name. The heuristic's one window: between a
    round's last code commit and the driver committing
    BENCH_r{N}.json, any bench run still stamps r{N} — which is
    correct for the driver's own round-closing run (it benches BEFORE
    writing the artifact; that is the point of max+1), and a human
    running in that window IS producing round-N evidence. Override
    with SPARK_GRAFT_BENCH_DETAIL when that's ever wrong. Outside a
    git checkout the working-tree glob is the fallback."""
    root = root or Path(_REPO_ROOT)
    names = None
    try:
        # Strictly COMMITTED files: ls-tree HEAD, not ls-files (the
        # index would count a staged-but-uncommitted BENCH_r{N}.json —
        # the exact defect class this function exists to avoid). Only
        # trust git when `root` IS the repo toplevel: inside some
        # UNRELATED enclosing repo (a pytest tmp dir under a checked-out
        # home, say) ls-tree succeeds with zero matches and would
        # wrongly report r01 where the glob sees the real files.
        toplevel = subprocess.run(
            ["git", "-C", str(root), "rev-parse", "--show-toplevel"],
            capture_output=True,
            text=True,
            timeout=10,
            check=True,
        ).stdout.strip()
        if Path(toplevel).resolve() == root.resolve():
            tracked = subprocess.run(
                ["git", "-C", str(root), "ls-tree", "--name-only", "HEAD"],
                capture_output=True,
                text=True,
                timeout=10,
                check=True,
            ).stdout.splitlines()
            names = [Path(t).name for t in tracked]
    except Exception:  # not a git checkout / git missing / no HEAD yet
        pass
    if names is None:  # glob fallback: working-tree semantics
        names = [p.name for p in root.glob("BENCH_r[0-9]*.json")]
    rounds = [
        int(m.group(1)) for n in names if (m := re.match(r"BENCH_r(\d+)\.json$", n))
    ]
    return f"r{(max(rounds) + 1) if rounds else 1:02d}"


def resolve_detail_name(only: bool, root: Path | None = None) -> str:
    """Pick the sidecar filename for this run.

    r09's driver bench overwrote the committed quiet-host
    ``BENCH_DETAIL.json`` with a noisy-phase re-run (r09 verdict,
    "What's wrong" #2) — exactly the evidence-clobbering the noise
    protocol forbids. Full runs now write a round-stamped name
    (``BENCH_DETAIL_r{N}.json``); if that exists already (e.g. the
    builder benched earlier in the same round), a timestamp suffix
    keeps both records. ``--only`` iteration runs keep their scratch
    name, which nothing commits as round evidence."""
    if only:
        return "BENCH_DETAIL_partial.json"
    root = root or Path(_REPO_ROOT)
    name = f"BENCH_DETAIL_{infer_round_stamp(root)}.json"
    if (root / name).exists():
        # counter suffix, not a time stamp: two full runs launched in
        # the same second must still land in distinct files (r10 ADVICE)
        k = 2
        while (root / name.replace(".json", f"_{k}.json")).exists():
            k += 1
        name = name.replace(".json", f"_{k}.json")
    return name


def build_payloads(
    timings: dict[str, float],
    *,
    sf,
    repeat: int,
    calibration: float,
    calibration_io: float | None,
    repeats: dict[str, int] | None,
    cc_rounds: dict[str, list[int]] | None,
    rider_free: list[str] | None,
    worst_ratio: dict[str, float],
    detail_file: str,
) -> tuple[dict, dict]:
    """Return (detail, summary) payloads.

    ``detail`` carries everything (full per-query map, cc rounds,
    rider-free list, per-query worst/best noise ratios) and is written
    to the sidecar; ``summary`` is the one stdout line and must stay
    under SUMMARY_BYTE_BUDGET when serialized (the driver's tail
    capture is 2000 chars — r08's all-in-one line overflowed it).
    """
    import statistics as _st

    total = round(sum(timings.values()), 3)
    noise = (
        round(_st.median(worst_ratio.values()), 2) if worst_ratio else None
    )
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cc_rounds": cc_rounds or None,
        "sf": sf,
        "repeat": repeat,
        "estimator": "min",
        # sub-2s queries are topped up to >=5 repeats (r09+; still min)
        "adaptive_repeat_under_sec": ADAPTIVE_REPEAT_UNDER_SEC,
        "calibration_sec": round(calibration, 3),
        # fixed parquet write+read+shuffle probe (r10+): the CPU-only
        # xxhash fold moved 1.15x while same-code totals swung 2.9x —
        # the host's slow phases are I/O-bound and invisible to it
        "calibration_io_sec": round(calibration_io, 3) if calibration_io else None,
        # actual per-query run counts from the adaptive top-up loop
        # (r09 ADVICE: adjudicators shouldn't re-infer them from timings)
        "repeats": repeats or None,
        "rider_free": rider_free or None,
        "noise_worst_over_best_median": noise,
        # per-query worst/best repeat ratio: localizes host-noise blame
        # to specific queries when a cross-round delta needs adjudicating
        # (the r08 verdict's 12 "regressions" were exactly this)
        "noise_worst_over_best": {k: round(v, 2) for k, v in worst_ratio.items()},
    }
    top = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:TOP_N]
    )
    summary = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "repeat": repeat,
        "estimator": "min",
        "calibration_sec": round(calibration, 3),
        "calibration_io_sec": round(calibration_io, 3) if calibration_io else None,
        "noise_worst_over_best_median": noise,
        "n_queries": len(timings),
        "queries_top": top,
        "detail_file": detail_file,
    }
    return detail, summary


#: Queries whose best-of-N lands under this many seconds get topped up
#: to at least 5 repeats (see the adaptive-repeat note in main).
ADAPTIVE_REPEAT_UNDER_SEC = 2.0


def io_calibration(spark, n_cpus: int, rounds: int = 3) -> float:
    """Fixed I/O + shuffle host probe, best-of-N (r09 verdict task #2).

    The CPU-only xxhash fold (``calibration_sec``) moved just 1.15-1.59x
    across host phases in which same-code query totals swung up to 2.9x:
    the slow phases are I/O-bound and a pure-CPU probe cannot see them.
    This probe times a canonical, data-independent round trip on the
    same device Spark spills to: write ~770 MB of incompressible
    parquet (an id column plus four xxhash64 columns — the hash
    columns are random 64-bit ints that defeat encodings, so ~768 MB
    of the bytes genuinely hit storage), read it back, and
    hash-aggregate through one full-width shuffle. Each repeat writes a
    FRESH directory so the write path is exercised every time; the
    read-back may be partially page-cache served, which is fine — the
    bench queries read cache-warm parquet too, so that is the I/O mix
    being calibrated. ``bench_compare`` divides by the two files'
    values to normalize cross-round ratios for I/O-phase drift."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    base = tempfile.mkdtemp(prefix="bench_io_probe_")
    best = float("inf")
    try:
        for i in range(rounds):
            target = os.path.join(base, f"pass{i}")
            start = time.perf_counter()
            spark.range(24_000_000, numPartitions=n_cpus).select(
                "id",
                *[
                    F.xxhash64("id", F.lit(k)).alias(f"h{k}")
                    for k in range(4)
                ],
            ).write.mode("overwrite").parquet(target)
            spark.read.parquet(target).repartition(2 * n_cpus, "h0").agg(
                F.bit_xor(F.xxhash64("id", "h0", "h1", "h2", "h3"))
            ).collect()
            best = min(best, time.perf_counter() - start)
            shutil.rmtree(target, ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return best


#: Headline queries: one per major operator family (scan/filter/agg,
#: join, window, set-op, scalar, event-time, dedup, similarity, text).
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q_agg_rollup",
    "q_join_range_nonequi",
    "q_topk_per_group",
    "q_window_moving_avg",
    "q_union_distinct",
    "q_string_funcs",
    "q_events_tumbling",
    "q_events_session",
    "ns_dedup_exact",
    "ns_dedup_minhash_pairs",
    "ns_dedup_minhash_verified",
    "ns_dedup_embedding_cosine_lsh",
    "ns_sim_topk_bruteforce",
    "ns_sim_topk_lsh",
    "ns_text_stats",
    "ns_doc_fingerprint",
    "ns_pipeline_training_prep",
    "q_join_asof",
    "ns_dedup_clusters",
    "ns_decontaminate_report",
    "ns_text_vocab_topk",
    "ns_quality_repetition",
    "ns_shard_pack",
    "ns_dedup_chunk_shared",
    "q_window_range_frame",
    # round-3 additions: winnowing fingerprints, hybrid retrieval,
    # SCD2 history build, multimodal perceptual-hash near-dup
    "ns_doc_winnowing",
    "ns_hybrid_rrf_search",
    "q_cdc_scd2_history",
    "ns_mm_phash_pairs",
    # round-5 additions: the persisted-index paths (build+append+probe
    # measured as one unit — the build cost is the number that matters
    # for the build-once/probe-many tradeoff)
    "ns_sim_topk_lsh_indexed",
    "ns_dedup_minhash_incremental",
    "ns_layout_compact_roundtrip",
    # round-6 additions: product-quantization ANN (ADC shortlist +
    # exact re-rank) and SemDeDup cluster-scoped semantic dedup
    "ns_sim_topk_pq",
    "ns_dedup_semantic",
    "ns_sim_topk_pq_indexed",
    "ns_select_importance",
    # round-6 additions (cont.): HLL cross-corpus overlap and the
    # count-min frequency summary
    "ns_corpus_overlap_sketch",
    "ns_vocab_cms_estimate",
    "ns_bpe_token_count",
    "ns_select_classifier",
    "ns_select_lm_perplexity",
    "q_fuzzy_match_customers",
    "ns_pack_sequences",
    "ns_pipeline_llm_recipe",
    # round-7 addition: Z-order layout round-trip (write + span audit)
    "ns_layout_zorder_skipping",
    # round-8 addition: the streaming family's headline number — the
    # availableNow bounded-state dedup ingest (rider-free arm)
    "ns_streaming_dedup_ingest",
    # round-10 additions: the two slowest registered queries (the r10
    # fleet audit found the headline set wasn't tracking them) — the
    # 15-round PageRank power iteration and the native recursive-CTE
    # successor walk. Cross-round comparisons are unaffected:
    # bench_compare works on the common subset.
    "ns_graph_pagerank",
    "q_sql_recursive_cte",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="scale-factor directory of parquet tables",
    )
    ap.add_argument("--all", action="store_true", help="run every registered query")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names to run instead of the headline "
        "set (iteration aid; unknown names fail loudly)",
    )
    ap.add_argument(
        "--repeat",
        type=int,
        default=3,
        help="runs per query; the reported time is the minimum (standard "
        "best-of-N: the min is the least noisy estimator of plan cost — "
        "GC pauses, page-cache misses and JIT tails only ever ADD time). "
        "Default 3: r04 ran best-of-2 and two queries looked 2-3x slower "
        "purely from the weaker estimator; best-of-3 is the like-for-like "
        "baseline (r03) again",
    )
    args = ap.parse_args()

    from spotify_app_etl_spark.registry import load_all
    from spotify_app_etl_spark.session import get_spark

    spark = get_spark(app_name="bench")
    registry = load_all()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = [n for n in names if n not in registry]
        if unknown:
            raise SystemExit(f"--only names not registered: {unknown}")
    elif args.all:
        names = sorted(registry)
    else:
        names = [n for n in HEADLINE if n in registry]

    from pyspark.sql import functions as F

    def force(df) -> None:
        """Evaluate the full plan: hash every column of every row
        (bit_xor can't overflow under ANSI mode, unlike sum)."""
        df.agg(F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()

    # Warmup: trigger JVM codegen AND the Python/Arrow worker pool once,
    # untimed (worker fork + Arrow init is per-executor boot cost, not
    # per-query cost; Spark reuses the workers afterwards).
    force(registry["q01_pricing_summary"].fn(spark, args.sf))
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    # The hash forces the UDF column — a bare count() lets Catalyst
    # prune the UDF away entirely and no worker ever forks.
    spark.range(10_000, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm("id").alias("x")
    ).agg(F.bit_xor(F.xxhash64("x"))).collect()

    # Host-speed calibration: a fixed, data-independent, plan-trivial
    # CPU workload (8e9-row xxhash64 fold, whole-stage codegen, no
    # shuffle, no I/O, no Python workers) timed best-of-3 AFTER warmup.
    # Cross-round BENCH ratios divide by the two files' calibration_sec
    # to separate host-speed drift from plan regressions — added r08 to
    # settle the persistent ~1.3x r06/r07-vs-r05 offset with arithmetic
    # instead of inference (scripts/bench_compare.py consumes it).
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    calibration = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        spark.range(8_000_000_000, numPartitions=n_cpus).agg(
            F.bit_xor(F.xxhash64("id"))
        ).collect()
        calibration = min(calibration, time.perf_counter() - start)
    # --only runs are iteration aids: skip the ~2.3 GB I/O probe whose
    # result would land only in the scratch sidecar nothing consumes
    calibration_io = None if args.only else io_calibration(spark, n_cpus)

    from spotify_app_etl_spark.operators import cluster
    from spotify_app_etl_spark.operators.dedup import release_cached

    timings: dict[str, float] = {}
    # Iterative-query attribution: a CC query's cost = rounds ×
    # per-round shuffle; recording the round count PER QUERY separates
    # "the graph got deeper" from "the plan got slower" across bench
    # rounds. Captured right after each query (several queries run CC —
    # ns_dedup_clusters, ns_embed_semantic_clusters, the leakage-safe
    # split — and a single end-of-run read would report whichever ran
    # last).
    cc_rounds: dict[str, list[int]] = {}
    worst_ratio: dict[str, float] = {}
    run_counts: dict[str, int] = {}
    # Self-verifying queries carry an in-query proof (in-memory ANN
    # parity, exact-kernel recall, rerun idempotence) that can cost as
    # much as the operator; the driver's correctness sweep runs the
    # proof-laden fn, the bench measures the rider-free bench_fn so
    # the JSON reflects engine cost. Which queries did is recorded.
    rider_free = sorted(n for n in names if registry[n].bench_fn is not None)
    # Adaptive repeats: sub-2 s queries are where single-digit repeat
    # counts produce 2x phantom swings between driver rounds (the r08
    # verdict adjudicated 12 such "regressions" on unchanged code — all
    # noise). Short queries get topped up to ADAPTIVE_MAX repeats; the
    # estimator stays min, so the number is comparable with (only
    # tighter than) earlier best-of-3 rounds, and the top-up costs
    # seconds exactly because the affected queries are short.
    adaptive_under, adaptive_max = ADAPTIVE_REPEAT_UNDER_SEC, max(5, args.repeat)
    for name in names:
        bench_fn = registry[name].bench_fn or registry[name].fn
        best, worst = float("inf"), 0.0
        runs = 0
        while runs < max(args.repeat, 1) or (best < adaptive_under and runs < adaptive_max):
            cluster.take_rounds()  # drop anything a previous query left
            start = time.perf_counter()
            force(bench_fn(spark, args.sf))
            took = time.perf_counter() - start
            best, worst = min(best, took), max(worst, took)
            runs += 1
            rounds = cluster.take_rounds()
            if rounds:
                # always a list (one entry per CC call): a query gaining
                # a second CC call must not flip the field's JSON type
                # between bench rounds
                cc_rounds[name] = rounds
            # dedup operators cache signature tables for their
            # multi-consumer plans; release between runs so repeats stay
            # honest and a long --all run doesn't accumulate storage
            release_cached()
        timings[name] = round(best, 3)
        worst_ratio[name] = worst / best if best > 0 else 1.0
        run_counts[name] = runs

    sf = args.sf.rstrip("/").rsplit("sf", 1)[-1]
    # Full runs write a round-stamped, never-overwriting sidecar (see
    # resolve_detail_name: the r09 driver bench clobbered the committed
    # quiet-host BENCH_DETAIL.json); --only iteration runs write a
    # scratch name that is never round evidence.
    detail_name = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL", resolve_detail_name(bool(args.only))
    )
    detail, summary = build_payloads(
        timings,
        sf=float(sf) if sf.replace(".", "").isdigit() else sf,
        repeat=max(args.repeat, 1),
        calibration=calibration,
        calibration_io=calibration_io,
        repeats=run_counts,
        cc_rounds=cc_rounds,
        rider_free=rider_free,
        worst_ratio=worst_ratio,
        detail_file=detail_name,
    )
    # Sidecar lands next to this script (the repo root), not the CWD:
    # the driver commits the repo tree, so the full per-query record is
    # versioned with the code that produced it.
    (Path(_REPO_ROOT) / detail_name).write_text(json.dumps(detail, indent=1) + "\n")
    line = json.dumps(summary)
    if len(line.encode()) > SUMMARY_BYTE_BUDGET:
        # explicit raise, NOT assert: the guard protects the driver's
        # 2000-char tail-capture contract and must survive python -O
        raise SystemExit(
            f"summary line {len(line.encode())}B exceeds budget "
            f"{SUMMARY_BYTE_BUDGET}B — trim TOP_N or keys (driver tail "
            "capture is 2000 chars)"
        )
    print(line)


if __name__ == "__main__":
    main()
