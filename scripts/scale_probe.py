#!/usr/bin/env python
"""Scale-probe: measure wall-time scaling of representative plans from
sf0.1 to a synthetic 8x replica (~4.8M lineitem rows).

The correctness gate runs at sf0.01 and the bench at sf0.1 — both small
enough that fixed overheads (job scheduling, codegen, Python worker
forks) can hide a superlinear plan. This probe builds an 8x copy of
sf0.1 ONCE in app-scoped scratch (key-shifted so FK joins stay valid;
document text per-copy character-translated so copies are NOT near-dups
and the LSH/banding workload keeps its real selectivity instead of
degenerating into 8-clone buckets) and times the same queries at both
scales. A healthy distributed plan lands at ratio <= ~8 x (linear in
rows, amortizing fixed overhead); ratios well ABOVE the data ratio are
the superlinear red flags this probe exists to catch (quadratic
candidate joins, driver-side state growing with data, single-task
bottlenecks).

Usage:
    python scripts/scale_probe.py [--sf /root/testdata/sf0.1]
        [--copies 8] [--repeat 2] [--out SCALING_probe.md]

Prints one JSON line per query and writes a markdown summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

#: representative plans: scans/aggs, multi-joins, windows, event-time,
#: exact + fuzzy dedup, ANN probe, text analytics, TF-IDF shuffles,
#: Arrow-kernel packing, LM-scored selection (rider-free variants where
#: they exist — the same arm bench.py times)
PROBE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q_topk_per_group",
    "q_events_tumbling",
    "ns_dedup_exact",
    "ns_dedup_minhash_pairs",
    "ns_sim_topk_lsh",
    "ns_text_stats",
    "ns_tfidf_topterms",
    "ns_pack_sequences",
    "ns_select_lm_perplexity",
]

#: per-table key columns to shift by copy_index * OFFSET so every copy
#: keeps internally-consistent FK joins but never collides with another
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: dimension tables shared by every copy (FKs to them are not shifted)
SHARED = ("region", "nation")
#: key shift per copy. A multiple of 11: customer names are regenerated
#: from the shifted key (see build_scaled), and any two distinct
#: multiples of 11 differ in >= 2 decimal digits (11 never divides
#: d*10^k for a single digit d, gcd(11,10)=1), so cross-copy names sit
#: at Levenshtein >= 2 — the fuzzy-match probe keeps its real
#: within-copy selectivity instead of every name pairing with its N-1
#: siblings at distance 1.
OFFSET = 110_000_000

#: per-copy character translation for document text: copies must NOT be
#: near-duplicates of each other, or the minhash/LSH probe degenerates
#: into measuring n-clone bucket blowup instead of real selectivity.
#: Translating three frequent letters per copy leaves ~(0.75)^9 ≈ 7% of
#: word-3-gram shingles shared → Jaccard ≈ 0.04, far under every
#: near-dup threshold in the registry.
_SRC = "eat"


def _dst(j: int) -> str:
    """Per-copy translation target, distinct for any two copies up to
    lcm(23,19,17) ≈ 7.4k (coprime moduli: two copies can share at most
    two of the three letters, keeping cross-copy Jaccard ≤ ~0.24 —
    still under every near-dup threshold)."""
    if j == 0:
        return _SRC  # copy 0 is the original corpus
    return "".join(
        chr(ord("a") + 1 + (j % m)) for m in (23, 19, 17)
    )


def _dim_perm(j: int, dim: int) -> list[int]:
    """Per-copy embedding-dimension permutation (identity for copy 0).

    The text columns get a per-copy character translation so replicas
    are not near-duplicates; embeddings need the same treatment or
    every vector ships with copies-1 IDENTICAL twins and the
    embedding-space probes (semantic dedup, cosine LSH, ANN top-k)
    measure a degenerate workload whose OUTPUT grows quadratically in
    copies (measured: 16.26M cosine=1.0 pairs at 128x on a corpus with
    0 pairs at 1x). A dimension permutation is the vector analog of
    the letter translation: norms and all WITHIN-copy angles are
    exactly preserved (the within-copy workload keeps its real
    selectivity), while cross-copy cosine between permuted twins
    collapses to the coordinate-distribution's mean-alignment —
    measured below every registry threshold on the testdata vectors.
    Seeded per copy, so the replica is deterministic.
    """
    import random

    perm = list(range(dim))
    if j:
        random.Random(j).shuffle(perm)
    return perm


def build_scaled(spark, sf_dir: str, copies: int, keep_dir: str | None = None) -> str:
    from spotify_app_etl_spark.plans.common import app_scratch_base

    # keep_dir: a caller-owned replica root that OUTLIVES this process
    # (no applicationId segment, no atexit cleanup). The fresh-JVM
    # measurement protocol (SCALING.md 128x method notes) runs each
    # query in its own process; without a shared dir every process
    # would rebuild the multi-GB replica. Caller deletes it when done.
    base = keep_dir or app_scratch_base(spark, "spark_graft_scale_probe")
    out = os.path.join(
        base,
        f"{sf_dir.rstrip('/').replace('/', '_')}.x{copies}",
    )
    if os.path.exists(os.path.join(out, "_BUILT")):
        return out
    # Exclusive build lock (r09 ADVICE): with a shared --keep-dir, two
    # fresh-JVM processes launched concurrently can both miss _BUILT
    # and interleave multi-GB writes into the same directory, leaving
    # duplicated/corrupt parquet that later probes silently read. One
    # process builds; the others block on the lock, then re-check the
    # marker and return. flock is advisory but every writer goes
    # through this function, and the lock file lives OUTSIDE `out` so
    # an `rm -rf` of a half-built replica can't strand it.
    import fcntl

    os.makedirs(base, exist_ok=True)
    lock_path = out.rstrip("/") + ".buildlock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if os.path.exists(os.path.join(out, "_BUILT")):
                return out
            _build_replica(spark, sf_dir, copies, out)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
    return out


def _build_replica(spark, sf_dir: str, copies: int, out: str) -> None:
    from pyspark.sql import functions as F

    from spotify_app_etl_spark.io import load_table

    for name in SHARED:
        load_table(spark, sf_dir, name).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
    for name, keys in KEY_SHIFTS.items():
        base = load_table(spark, sf_dir, name)
        parts = []
        dim = (
            len(base.select("embedding").first()[0])
            if name == "embeddings" and copies > 1
            else 0
        )
        for j in range(copies):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(j * OFFSET))
            if name == "documents" and j > 0:
                c = c.withColumn(
                    "text", F.translate(F.col("text"), _SRC, _dst(j))
                )
            if name == "embeddings" and j > 0:
                c = c.withColumn(
                    "embedding",
                    F.array(
                        *[F.col("embedding")[i] for i in _dim_perm(j, dim)]
                    ),
                )
            if name == "customer" and j > 0:
                # c_name derives from c_custkey in the testdata
                # ('Customer#' + 9-digit key); regenerate it from the
                # SHIFTED key (12 digits — shifted keys overflow 9) so
                # the fuzzy/triangle probes see real per-copy name
                # structure, not N verbatim clones of every name.
                # Cross-copy distance is >= 3 vs copy 0 (length) and
                # >= 2 between shifted copies (OFFSET note above);
                # within-copy distance structure matches the original.
                c = c.withColumn(
                    "c_name",
                    F.concat(
                        F.lit("Customer#"),
                        F.lpad(F.col("c_custkey").cast("string"), 12, "0"),
                    ),
                )
            parts.append(c)
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        # ts in the sf0.1 events parquet is TIMESTAMP(NANOS); the
        # loader normalizes to timestamp_ntz, which round-trips fine
        scaled.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    Path(out, "_BUILT").touch()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=2)
    # NOTE: SCALING.md is hand-curated across eight probe families; a
    # default full overwrite would clobber it, so the default output is
    # a sibling the operator merges from.
    ap.add_argument("--out", default=str(Path(_REPO_ROOT) / "SCALING_probe.md"))
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated query names to probe instead of the default "
        "PROBE list (unknown names fail loudly)",
    )
    ap.add_argument(
        "--keep-dir",
        default=None,
        help="persistent replica root shared across processes (skips the "
        "per-application scratch + atexit cleanup); the fresh-JVM "
        "protocol runs one query per process and the replica build is "
        "minutes at 128x — caller deletes the dir when the campaign ends",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spotify_app_etl_spark.operators.dedup import release_cached
    from spotify_app_etl_spark.registry import load_all
    from spotify_app_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    registry = load_all()

    t0 = time.time()
    scaled_dir = build_scaled(spark, args.sf, args.copies, keep_dir=args.keep_dir)
    print(f"scaled dir ready in {time.time() - t0:.1f}s: {scaled_dir}", flush=True)

    def force(df) -> None:
        df.agg(F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()

    # warmup both the JVM and the Arrow worker pool (mirrors bench.py)
    force(registry["q01_pricing_summary"].fn(spark, args.sf))

    probe = PROBE
    if args.queries:
        probe = [n.strip() for n in args.queries.split(",") if n.strip()]
        unknown = [n for n in probe if n not in registry]
        if unknown:
            raise SystemExit(f"--queries names not registered: {unknown}")

    rows = []
    for name in probe:
        q = registry[name]
        fn = q.bench_fn or q.fn
        t = {}
        for label, d in (("t1", args.sf), (f"t{args.copies}", scaled_dir)):
            best = float("inf")
            for _ in range(max(args.repeat, 1)):
                release_cached()
                start = time.perf_counter()
                force(fn(spark, d))
                best = min(best, time.perf_counter() - start)
            t[label] = round(best, 2)
        ratio = round(t[f"t{args.copies}"] / t["t1"], 2) if t["t1"] > 0 else None
        rows.append((name, t["t1"], t[f"t{args.copies}"], ratio))
        print(json.dumps({"query": name, **t, "ratio": ratio}), flush=True)

    lines = [
        "# SCALING — wall-time scaling probe (sf0.1 → synthetic "
        f"{args.copies}x, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}])",
        "",
        f"Data: every fact table unioned {args.copies}x with shifted keys "
        "(FK-consistent); document text per-copy character-translated so "
        "copies are NOT near-duplicates (Jaccard ≈ 0.04 across copies) — "
        "the LSH probes keep their real selectivity. Estimator: min of "
        f"{args.repeat} runs, rider-free bench variants. A healthy "
        f"distributed plan lands at ratio ≤ ~{args.copies} (linear in "
        "rows, amortizing per-job overhead); ratios well above the data "
        "ratio are the superlinear red flags this probe exists to catch.",
        "",
        f"| query | sf0.1 s | {args.copies}x s | ratio |",
        "| --- | --- | --- | --- |",
    ]
    for name, t1, tn, ratio in rows:
        lines.append(f"| {name} | {t1} | {tn} | {ratio} |")
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
