"""Connected components over near-duplicate pair graphs.

Reference parity: none — LLM-data-pipeline surface. Pairwise near-dup
detection (MinHash/SimHash/Jaccard) yields EDGES; turning "A~B, B~C"
into one cluster {A,B,C} with a single kept representative requires the
connected components of that graph. The greedy closure in
``dedup.minhash_dedup`` under-merges chains (A~B~C with A!~C keeps A
and C); CC is the exact fixpoint.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round a node takes the min of its own and its
neighbors' labels; fixpoint = every node carries the min id of its
component. Near-dup graphs are unions of small-diameter cliques-ish
blobs, so convergence is a handful of rounds.

Scale shape (the part that matters at 100 TB):

* Each round is ONE shuffle: labels ⋈ edges on the node key, then a
  map-side-combinable min-aggregate. No driver-side graph state — the
  only thing crossing the driver is the changed-label COUNT.
* ``localCheckpoint`` per round truncates lineage; without it the plan
  doubles each iteration and Catalyst analysis time explodes by round
  ~15 (the classic iterative-DataFrame failure mode).
* Rounds are bounded by graph diameter, not node count. For
  adversarially long chains, the large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond")
  halves diameter per round; documented here as the upgrade path —
  near-dup blobs in practice converge in ≤5 rounds, and ``max_iter``
  fails loudly rather than silently under-merging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """``(node, component)`` for every node appearing in ``pairs``.

    ``component`` is the smallest node id reachable from ``node``
    (deterministic, engine-independent — ideal for oracle checks).
    """
    # Undirected edge list, both directions, self-loops dropped.
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # min over {own label} ∪ {neighbors' labels} — one shuffle round.
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("__changed"),
            )
        ).localCheckpoint()
        changed = updated.filter("__changed").count()
        labels = updated.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds — "
        "graph diameter exceeds the bound; raise max_iter or switch to "
        "large-star/small-star"
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Clusters from near-dup pairs: ``(node, component, cluster_size)``.

    ``component`` doubles as the kept-representative id (min id of the
    cluster); rows with ``node != component`` are the drop set.
    """
    cc = connected_components(pairs, id_a, id_b)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.join(sizes, "component").select("node", "component", "cluster_size")
