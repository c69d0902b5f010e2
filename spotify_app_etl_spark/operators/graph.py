"""Distributed PageRank: the iterative numeric fixpoint the corpus
toolkit needs next to the combinatorial one (connected components).

Training-data pipelines rank graph-shaped evidence constantly — host
authority for crawl prioritization (the original PageRank use), "most
central duplicate" as the kept representative of a near-dup cluster,
influence in a citation/link graph. The operator is the standard
power iteration (Page et al. 1999; damping ``d``):

    rank'(v) = (1 - d)/N + d * ( Σ_{u→v} rank(u)/outdeg(u)
                                 + dangling_mass/N )

with dangling mass (rank parked on nodes that have no out-edges)
redistributed uniformly each round — the convention that keeps total
rank mass at exactly 1, which is also the operator's self-check.

Scale shape (same contract as ``operators/cluster.py``):

* **Static edge layout, GraphX-style.** The edge list, out-degrees,
  and node set are hash-partitioned on their join key, sorted within
  partitions, and checkpointed ONCE — with the layout captured into
  the ``LogicalRDD`` (built under ``adaptive_off``; under AQE the
  captured partitioning degrades to Unknown and every round re-shuffled
  the full edge table — measured at sf0.1: 9 exchanges per round-plan,
  4 of them static-table re-exchanges, vs 3 after, only one of which
  carries data: the partially-aggregated contributions, rank-vector-
  sized). At 100 TB the edge table IS the data; per-round cost must
  track the rank vector, and now does.
* **Broadcast-vs-co-partitioned round gate.** While the rank vector
  fits under ``autoBroadcastJoinThreshold``, rounds run under AQE and
  its runtime broadcast of the rank side wins outright (nothing
  exchanges). Past the threshold (~300k nodes at the 10 MB default)
  rounds run non-adaptively as co-partitioned sort-merge joins against
  the captured layout.
* **Out-degrees ride the rank vector** (r11): the loop state is
  (node, rank, outdeg), so no round joins a separate degree table —
  the dangling-mass branch and the share projection are bare filters
  on the checkpointed vector. Each round is then one data join
  (shares ⋈ edges on the source key) plus one map-side-combinable sum
  plus the co-partitioned attach join — no driver-side graph state.
  The dangling mass rides a 1-row broadcast scalar subquery inside
  the round's single checkpoint job; the driver sees at most one
  scalar per round (the max-delta, tolerance mode only — CC's budget
  is one scalar, the changed count).
* ``localCheckpoint`` per round truncates lineage (the iterative-
  DataFrame failure mode).
* Convergence is ``max |rank' - rank| < tol`` and non-convergence
  raises loudly rather than returning a half-iterated vector.

Float note: per-node sums shuffle, so ranks are deterministic only to
last-ulp order noise; callers that need stable output round (the
registered query emits 9-digit ranks — noise is ~1e-15, six orders
below the rounding grain).
"""

from __future__ import annotations

import contextlib
import logging

from pyspark.sql import DataFrame, functions as F

from spotify_app_etl_spark.operators.checkpoint import (
    adaptive_off,
    co_partitioned_rounds,
    local_checkpoint_ser,
    release_local_checkpoint,
)

log = logging.getLogger(__name__)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    fixed_rounds: int | None = None,
    checkpoint_every: int = 2,
) -> tuple[DataFrame, int]:
    """PageRank over the directed edge list: returns
    ``(ranks, rounds)`` where ``ranks`` is (node, rank) for every node
    appearing as a source or destination, and ``rounds`` is the number
    of power iterations run.

    Two stopping modes:

    * tolerance (default): iterate until ``max |Δrank| < tol``; raises
      after ``max_iter`` rounds without convergence. Power iteration
      converges linearly at rate ≈ ``damping`` (0.85ᵏ), so tol=1e-6
      needs ~70-90 rounds from a uniform start — budget ``max_iter``
      accordingly.
    * ``fixed_rounds``: run exactly that many rounds with NO per-round
      delta action (one driver scalar per round instead of two) — the
      GraphX/Pregel convention, and the right mode for production runs
      where the iteration budget is part of the recipe. In this mode
      nothing forces per-round evaluation, so the lineage barrier can
      be BATCHED: the rank vector is checkpointed every
      ``checkpoint_every`` rounds (and on the last round). The default
      of 2 is a THROUGHPUT-vs-HEADROOM compromise, measured both ways:
      in broadcast mode window 2 wins outright (sf0.1 sweep best-of-3:
      window 1 → 10.0 s, 2 → 9.4 s, 5 → 12.1 s — runtime
      exchange-reuse dedupes the batched rounds' shuffles, so the
      second round in a batch is nearly free); in co-partitioned mode
      the batched rounds' subtrees have NO exchange above them, so
      ``ReusedExchange`` dedupes nothing and each lazily-stacked round
      recomputes the previous round's joins ~2× — the 128× interleaved
      sweep reads window 1 → 71-72 s, 2 → 95-108 s, 4 → 197 s, i.e.
      ``checkpoint_every=1`` is ~25-35% faster WHEN THE HEAP HAS
      HEADROOM. At 512× (~157M edges on an 8 GiB single-JVM heap)
      window 1 OOM'd twice (non-blocking and blocking release), and a
      window-2 re-run on the same degraded host phase later OOM'd
      too, while the committed 512× row (439.3 s, full width) ran
      window 2 on a quieter phase — so the 512× cadence adjudication
      is confounded by host state and carries to the next round; the
      default stays at the value behind the only full-width 512×
      completion. Executors with real memory headroom should pass
      ``checkpoint_every=1`` explicitly for co-partitioned runs.
      Tolerance mode always checkpoints per round: its delta action
      evaluates every round anyway, and a non-checkpointed chain
      would recompute prior rounds' shuffles once per delta action
      across jobs.

    Duplicate edges are collapsed (an edge list, not a multigraph);
    self-loops count like any other edge.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if tol <= 0:
        raise ValueError(f"tol must be positive, got {tol}")
    if fixed_rounds is not None and fixed_rounds <= 0:
        raise ValueError(f"fixed_rounds must be positive, got {fixed_rounds}")
    if checkpoint_every <= 0:
        raise ValueError(f"checkpoint_every must be positive, got {checkpoint_every}")

    spark = edges.sparkSession

    # Static tables: hash-partitioned on their join key and sorted
    # within partitions BEFORE the checkpoint. Built under adaptive_off
    # because the LogicalRDD then captures both (HashPartitioning +
    # ordering) — under AQE the final stage is a coalesced shuffle whose
    # partitioning records as Unknown, and every round re-exchanged the
    # full edge table (measured: 9 exchanges per round-plan, 4 of them
    # static-table re-shuffles). With the layout captured, a round's
    # sort-merge joins against the static side plan with NO exchange and
    # NO re-sort — the edge table is laid out once, GraphX-style, and
    # only the rank vector moves per round.
    #
    # Dedup ORDER (r11, guide §2.4): repartition("src") first, THEN
    # dropDuplicates — hash(src) already co-locates equal (src, dst)
    # pairs (HashPartitioning on a subset of the grouping keys satisfies
    # the aggregate's ClusteredDistribution), so the dedup aggregate
    # runs exchange-free on the captured layout. The previous
    # distinct-then-repartition shape shuffled every edge TWICE (once
    # on hash(src, dst), once on hash(src)); at 100 TB the edge table
    # is the data and the second full-data exchange was pure waste.
    with adaptive_off(spark):
        e = local_checkpoint_ser(
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .repartition("src")
            .dropDuplicates(["src", "dst"])
            .sortWithinPartitions("src")
        )
        nodes = local_checkpoint_ser(
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .sortWithinPartitions("node")
        )
    n = nodes.count()
    if n == 0:
        # the empty result plan only references `nodes` — release the
        # edge checkpoint rather than leaking it in a long-lived session
        release_local_checkpoint(e)
        return nodes.withColumn("rank", F.lit(0.0)), 0
    with adaptive_off(spark):
        # outdeg FUSED into the rank vector (r11, guide §2.4): the loop
        # previously joined ranks ⋈ outdeg every round — and evaluated
        # that join twice (the dangling-mass branch and the contribution
        # branch are separate subtrees with no exchange to reuse in
        # broadcast mode). Carrying outdeg as a third column of the
        # checkpointed vector makes both branches bare filters on the
        # checkpoint: one whole join (×2 evaluations) removed per round
        # at the cost of 8 bytes/row of loop state. Measured sf0.1
        # (interleaved A/B, same session): 15.1 → 11.6 s best-of-3,
        # identical output hash. `e` is hash(src)-partitioned, so the
        # groupBy adds no exchange; the nodes ⋈ outdeg init join is
        # co-partitioned SMJ (hash(node) vs hash(src), same width).
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        ranks0 = local_checkpoint_ser(
            nodes.join(outdeg, nodes.node == outdeg.src, "left")
            .select("node", F.lit(1.0 / n).alias("rank"), "outdeg")
            .sortWithinPartitions("node")
        )
    # ranks0 is eagerly materialized and self-contained; the node list
    # lives on inside it, so the nodes checkpoint is now dead weight
    release_local_checkpoint(nodes)

    # Round-job mode gate: while the rank vector fits under the
    # broadcast threshold, AQE's runtime broadcast of the rank side
    # beats everything (no exchange at all, the static layout streams)
    # — keep AQE on. Once the vector outgrows broadcast (the 100 TB
    # case: ~8M nodes at 512x is already ~20x the default 10 MB
    # threshold), run the rounds under adaptive_off so they plan
    # co-partitioned sort-merge joins against the captured static
    # layout: exactly one rank-vector-sized exchange per round (the
    # partially-aggregated contributions, keyed by dst), zero
    # edge-table movement. (The lineage-barrier cadence trade per
    # mode is in the docstring — the default stays at the value proven
    # memory-safe at 512x.)
    co_part = co_partitioned_rounds(spark, n)
    ctx = adaptive_off(spark) if co_part else contextlib.nullcontext()
    with ctx:
        return _pagerank_loop(
            e,
            ranks0,
            n,
            damping=damping,
            tol=tol,
            max_iter=max_iter,
            fixed_rounds=fixed_rounds,
            checkpoint_every=checkpoint_every,
        )


def _pagerank_loop(
    e: DataFrame,
    ranks0: DataFrame,
    n: int,
    *,
    damping: float,
    tol: float,
    max_iter: int,
    fixed_rounds: int | None,
    checkpoint_every: int,
) -> tuple[DataFrame, int]:
    # loop state: (node, rank, outdeg) — outdeg rides the vector so no
    # round ever joins a separate degree table (see pagerank: the fused
    # init). The returned frame projects back to the (node, rank)
    # contract at the end.
    ranks = ranks0
    # fixed mode: the newest MATERIALIZED vector — intermediate lazy
    # rounds' lineage hangs off it, so it is released only when the
    # next checkpoint lands, never while a lazy `ranks` depends on it
    last_ck = ranks
    base = (1.0 - damping) / n

    n_rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for rounds in range(1, n_rounds + 1):
        # rank mass parked on dangling nodes this round — a 1-row
        # broadcast scalar subquery, NOT a driver collect: folding it
        # into the round's one checkpoint job halves the jobs per
        # round (measured 2x end-to-end on the purchase graph). With
        # outdeg fused into the vector this branch is a bare filter on
        # the checkpoint — no join to re-evaluate.
        dangling_agg = ranks.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        contrib = (
            e.join(
                ranks.filter(F.col("outdeg").isNotNull()).select(
                    "node", (F.col("rank") / F.col("outdeg")).alias("share")
                ),
                e.src == F.col("node"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("in_share"))
        )
        updated_plan = (
            ranks.select("node", "outdeg")
            .join(contrib, F.col("node") == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling_agg))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("in_share", F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n))
                    )
                ).alias("rank"),
                "outdeg",
            )
        )
        if fixed_rounds is not None:
            # batched barrier (see docstring): checkpoint every
            # checkpoint_every rounds and on the last; in between the
            # round stays a lazy stage chain on top of last_ck, so the
            # whole batch runs as ONE job with each round's exchanges
            # computed exactly once
            if rounds % checkpoint_every == 0 or rounds == n_rounds:
                updated = local_checkpoint_ser(updated_plan)
                # the superseded checkpoint is only now unreachable
                # BLOCKING: with per-round checkpointing (the
                # co-partitioned default) an async release lets
                # superseded generations linger while the next round's
                # 32 SMJ tasks allocate — the 512x probe OOM'd exactly
                # there; synchronous free bounds live generations at 2
                release_local_checkpoint(last_ck, blocking=True)
                last_ck = updated
            else:
                updated = updated_plan
            ranks = updated
            continue
        updated = local_checkpoint_ser(updated_plan)
        # scalar 2: max delta — convergence check (tolerance mode only)
        delta = (
            updated.alias("new")
            .join(ranks.alias("old"), "node")
            .agg(F.max(F.abs(F.col("new.rank") - F.col("old.rank"))))
            .collect()[0][0]
        )
        release_local_checkpoint(ranks)  # delta was its last reader
        ranks = updated
        if delta < tol:
            log.info("pagerank: converged in %d rounds (delta %.2e)", rounds, delta)
            release_local_checkpoint(e)  # result only needs `ranks`
            return ranks.select("node", "rank"), rounds
    if fixed_rounds is not None:
        release_local_checkpoint(e)
        return ranks.select("node", "rank"), fixed_rounds
    raise RuntimeError(
        f"pagerank: no convergence after {max_iter} rounds (tol {tol}) — "
        "raise max_iter or loosen tol"
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Enumerate every triangle of the undirected graph once:
    (n1, n2, n3) with n1 < n2 < n3.

    Degree-ordered edge orientation (the standard O(m^1.5) bound —
    Schank & Wagner 2005's forward/compact algorithm, the shape every
    distributed triangle counter uses): orient each undirected edge
    from its lower-(degree, id) endpoint to the higher one, pair the
    out-neighbors of each node (every node's out-degree is then at
    most O(sqrt(m)), which is what kills the quadratic hub blowup a
    plain id-ordered wedge join suffers on skewed graphs), and close
    each wedge against the oriented edge set with an equi-join. Every
    triangle appears exactly once — from its lowest-(degree, id)
    corner. Duplicate/reversed input edges and self-loops are
    collapsed first.

    All equi-joins + one degree aggregation: three shuffles total,
    no NLJ, no driver state.
    """
    u, v = F.col(src), F.col(dst)
    und = (
        edges.filter(u != v)
        .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    withdeg = (
        und.join(deg.withColumnsRenamed({"node": "u", "deg": "du"}), "u")
        .join(deg.withColumnsRenamed({"node": "v", "deg": "dv"}), "v")
    )
    # orient from the lower (deg, id) endpoint to the higher
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    o = withdeg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    # wedges at each node a: out-neighbor pairs ordered by (deg, id),
    # so the closing edge is oriented b -> c and ONE equi-join closes it
    x, y = o.alias("x"), o.alias("y")
    wedges = x.join(y, "a").filter(
        F.struct(F.col("x.db"), F.col("x.b")) < F.struct(F.col("y.db"), F.col("y.b"))
    ).select(F.col("a"), F.col("x.b").alias("b"), F.col("y.b").alias("c"))
    tri = wedges.join(
        o.select(F.col("a").alias("b"), F.col("b").alias("c")), ["b", "c"]
    )
    nodes = F.array_sort(F.array("a", "b", "c"))
    return tri.select(
        nodes[0].alias("n1"), nodes[1].alias("n2"), nodes[2].alias("n3")
    )
